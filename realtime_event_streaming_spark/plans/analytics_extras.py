"""Analytics staples beyond the reference corpus.

Every warehouse user expects these shapes to work: TF-IDF term
ranking, histogram binning, moving averages, a data-quality check
suite, and pivot tables. All oracle-gated; all single-scan or
bounded-shuffle plans."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as D
from ..io import load_table, register_views
from ..registry import register

# ---------------------------------------------------------------------------
# TF-IDF top terms per language
# ---------------------------------------------------------------------------

_TFIDF_DUCK = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT lang, tok, count(*) AS tf FROM toks GROUP BY lang, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
ndocs AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.lang, tf.tok,
         round(tf.tf * ln((SELECT n FROM ndocs) / cast(df.df AS DOUBLE)), 4)
           AS tfidf
  FROM tf JOIN df USING (tok)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY tfidf DESC, tok) AS rnk
  FROM scored
)
SELECT lang, rnk, tok, tfidf FROM ranked WHERE rnk <= 5
ORDER BY lang, rnk
"""

_TFIDF_SPARK = D.to_spark_sql(
    _TFIDF_DUCK,
    ("SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents",
     "SELECT doc_id, lang, explode(split(text, ' ')) AS tok FROM documents"),
)


@register("tfidf_top_terms", _TFIDF_DUCK, tags=("text",))
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language by TF-IDF (tf at the language grain,
    idf over documents — on the fixture this surfaces the rare 'dup'
    mutation token instead of the uniform shared vocabulary). Explode
    -> two bounded group-bys -> per-group top-k over the aggregated
    frame."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_TFIDF_SPARK)


# ---------------------------------------------------------------------------
# histogram binning of the value measure
# ---------------------------------------------------------------------------

_HIST_BODY = """
SELECT cast(least(floor(value / 10), 9) AS INT) AS bucket,
       count(*) AS cnt,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi
FROM events
WHERE value IS NOT NULL AND value >= 0
GROUP BY 1
ORDER BY bucket
"""


@register("value_histogram", _HIST_BODY, tags=("reference",))
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value measure (10-unit bins,
    top-capped): the binning shape behind every latency/size dashboard
    panel. Single scan, 10-row shuffle."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_HIST_BODY)


# ---------------------------------------------------------------------------
# 7-day moving average of daily volume
# ---------------------------------------------------------------------------

_MAVG_SPARK = """
WITH daily AS (
  SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
         count(*) AS cnt
  FROM events GROUP BY 1
)
SELECT day, cnt,
       round(avg(cnt) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM daily ORDER BY day
"""

# Spark -> DuckDB direction; presence-checked like every rewrite.
_MAVG_DUCK = D.sub_checked(
    _MAVG_SPARK,
    ("date_format(date_trunc('day', ts), 'yyyy-MM-dd')",
     "strftime(date_trunc('day', ts), '%Y-%m-%d')"),
)


@register("daily_moving_avg", _MAVG_DUCK, tags=("reference",))
def daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average over daily volume (ROWS frame window
    aggregate on the pre-aggregated daily series)."""
    return _run_spark(spark, sf_dir, _MAVG_SPARK)


def _run_spark(spark, sf_dir, sql):
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# data-quality check suite
# ---------------------------------------------------------------------------

_DQ_BODY = """
SELECT 'events_null_ts' AS check_name,
       cast(count(*) - count(ts) AS BIGINT) AS violations FROM events
UNION ALL
SELECT 'events_dup_event_id',
       cast(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
UNION ALL
SELECT 'events_negative_value',
       cast(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL
SELECT 'orders_orphan_custkey',
       cast(count(*) AS BIGINT)
FROM orders WHERE NOT EXISTS
  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       cast(count(*) AS BIGINT)
FROM lineitem WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""


@register("data_quality_checks", _DQ_BODY, tags=("quality",))
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline data-quality suite: null keys, duplicate ids, domain
    violations, referential integrity (anti-join counts) — one labeled
    UNION ALL summary, the shape of a dbt-style test run."""
    register_views(
        spark, sf_dir, tables=("events", "orders", "customer", "lineitem")
    )
    return spark.sql(_DQ_BODY)


# ---------------------------------------------------------------------------
# pivot: events by country x event_type
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_DUCK = f"""
SELECT {D.COUNTRY_SQL} AS country,
       {', '.join(
           f"cast(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY 1
ORDER BY country
"""


@register("events_by_country_pivot", _PIVOT_DUCK, tags=("reference",))
def events_by_country_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot table: country rows x event-type columns. Spark's
    ``pivot`` with an explicit value list (no extra distinct pass);
    the oracle states it as conditional aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.expr(D.COUNTRY_SQL).alias("country"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("country")
    )


# ---------------------------------------------------------------------------
# seasonal anomaly: hour-of-day baseline z-scores
# ---------------------------------------------------------------------------


def _seasonal_sql(day_expr: str) -> str:
    # stddev computed by explicit formula (not stddev_samp) so the
    # single-day and zero-variance edges are exact 0.0 on both engines
    # (Spark's stddev_samp yields NaN where DuckDB yields NULL).
    return f"""
WITH hourly AS (
  SELECT {day_expr} AS day, hour(ts) AS hr, cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT hr, count(*) AS n_days,
         avg(n) AS mu,
         sum(n * n) AS sum_sq, cast(sum(n) AS BIGINT) AS sum_n
  FROM hourly GROUP BY hr
),
sd AS (
  SELECT hr, n_days, mu,
         CASE WHEN n_days >= 2 THEN
           sqrt(greatest(
             (sum_sq - n_days * mu * mu) / (n_days - 1),
             cast(0 AS DOUBLE)))
         ELSE cast(0 AS DOUBLE) END AS sd
  FROM stats
)
SELECT h.day, cast(h.hr AS BIGINT) AS hr, h.n,
       CASE WHEN sd.sd > 0 THEN round((h.n - sd.mu) / sd.sd, 4)
            ELSE cast(0 AS DOUBLE) END AS z,
       CASE WHEN sd.sd > 0 AND abs(h.n - sd.mu) >= 2 * sd.sd
            THEN 1 ELSE 0 END AS is_spike
FROM hourly h JOIN sd ON h.hr = sd.hr
ORDER BY day, hr
"""


_SEASONAL_DUCK = _seasonal_sql("strftime(ts, '%Y-%m-%d')")
_SEASONAL_SPARK = _seasonal_sql("date_format(ts, 'yyyy-MM-dd')")


@register("seasonal_anomaly_hourly", _SEASONAL_DUCK, tags=("anomaly",))
def seasonal_anomaly_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly scores: each (day, hour) traffic count
    is z-scored against the distribution of the SAME hour-of-day across
    all days — the baseline that flat z-scoring (anomaly_zscore_batch)
    lacks, so a quiet 3am hour is judged against other 3am hours, not
    the daily mean. Variance is computed by the explicit two-moment
    formula with integer-exact sums, making both engines bit-agree at
    the rounding; spike = |n - mu| >= 2*sd stated multiplicatively (no
    division) so the zero-variance edge is exact.

    Scale notes: two bounded group-bys (day x hour, then hour) and a
    broadcast-sized (24-row) stats join — a single scan of events at
    any SF. Absent (day, hour) cells are absent on both engines
    (sparse baseline), documented behavior."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_SEASONAL_SPARK)


# ---------------------------------------------------------------------------
# props JSON extraction stats (F8 surface on the events table)
# ---------------------------------------------------------------------------

_PROPS_DUCK = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_events,
       cast(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
       round(avg(cast(json_extract_string(props, '$.k') AS DOUBLE)), 4)
         AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""

_PROPS_SPARK = """
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_events,
       cast(sum(CASE WHEN get_json_object(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
       round(avg(cast(get_json_object(props, '$.k') AS DOUBLE)), 4) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("props_field_stats", _PROPS_DUCK, tags=("reference", "json"))
def props_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured field extraction over the events `props` JSON
    column (the F8 surface on the fact table itself): per event type,
    how many rows carry the `k` property and its mean. JSON parse
    stays inside codegen (`get_json_object`); no UDF."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_PROPS_SPARK)


# ---------------------------------------------------------------------------
# Benford first-digit census (forensic screening)
# ---------------------------------------------------------------------------

#: first significant digit via a RANGE LADDER (value spans ~(0, 1000)
#: in the fixture) — deliberately no log10(): libm log10 can return
#: 2.9999999999999996 for 1000.0, flipping the digit on exact powers;
#: range comparisons on doubles are bit-deterministic.
_BENFORD_DIGIT = """
CASE
  WHEN value >= 1000 THEN cast(floor(value / 1000) AS INT)
  WHEN value >= 100 THEN cast(floor(value / 100) AS INT)
  WHEN value >= 10 THEN cast(floor(value / 10) AS INT)
  WHEN value >= 1 THEN cast(floor(value) AS INT)
  WHEN value >= 0.1 THEN cast(floor(value * 10) AS INT)
  WHEN value >= 0.01 THEN cast(floor(value * 100) AS INT)
  ELSE NULL
END
"""

#: Benford expected frequencies log10(1 + 1/d), fixed 4dp literals so
#: neither engine computes a log at query time. The literals are CAST
#: TO DOUBLE in the output: left as raw decimals, Spark types the CASE
#: ladder DECIMAL(4,4) while DuckDB types it DECIMAL(5,4), and the
#: driver's value-hash is decimal-precision-sensitive — the one red
#: driver row of rounds 3-7 (CORRECTNESS_r07, values bit-identical,
#: hash_match false). Registry convention: outputs are double/bigint
#: only, never raw decimal (enforced by tests/test_oracle_parity.py).
_BENFORD_EXP = {
    1: 0.3010, 2: 0.1761, 3: 0.1249, 4: 0.0969, 5: 0.0792,
    6: 0.0669, 7: 0.0580, 8: 0.0512, 9: 0.0458,
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_EXP.items()
) + " END"

_BENFORD_BODY = f"""
WITH digits AS (
  SELECT {_BENFORD_DIGIT} AS digit
  FROM events WHERE value IS NOT NULL AND value > 0
),
counts AS (
  SELECT digit, count(*) AS n FROM digits
  WHERE digit IS NOT NULL GROUP BY digit
),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT digit,
       cast(n AS BIGINT) AS n,
       round(cast(n AS DOUBLE) / tot.t, 4) AS observed_frac,
       cast({_BENFORD_CASE} AS DOUBLE) AS benford_frac,
       round(abs(cast(n AS DOUBLE) / tot.t
                 - cast({_BENFORD_CASE} AS DOUBLE)), 4)
         AS abs_dev
FROM counts CROSS JOIN tot
ORDER BY digit
"""


@register("benford_digit_census", _BENFORD_BODY, tags=("anomaly",))
def benford_digit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over the value measure — the
    forensic-accounting test for fabricated or truncated numeric
    data: organic multiplicative processes follow P(d) = log10(1+1/d);
    uniform synthetic data (this fixture) deviates maximally, which
    the census shows honestly in abs_dev. Digit extraction is a
    RANGE LADDER, not log10 — see _BENFORD_DIGIT for the libm
    boundary hazard; Benford expectations are fixed 4dp literals.

    Scale notes (100 TB): one scan, a 9-row group-by, a 1-row total
    broadcast. The cheapest fraud screen a warehouse can run."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_BENFORD_BODY)


# ---------------------------------------------------------------------------
# corpus datacard: one long-format summary across the family stats
# ---------------------------------------------------------------------------

_DATACARD_BODY = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
doc_stats AS (
  SELECT cast(count(*) AS DOUBLE) AS n_docs,
         cast(sum(len(tk)) AS DOUBLE) AS n_tokens,
         round(avg(cast(len(tk) AS DOUBLE)), 4) AS mean_tokens
  FROM toks
),
langs AS (SELECT cast(count(DISTINCT lang) AS DOUBLE) AS v FROM documents),
sources AS (
  SELECT cast(count(DISTINCT source) AS DOUBLE) AS v FROM documents
),
vocab AS (
  SELECT cast(count(DISTINCT tok) AS DOUBLE) AS v
  FROM (SELECT unnest(tk) AS tok FROM toks)
),
dup AS (
  SELECT cast(count(*) - count(DISTINCT md5(text)) AS DOUBLE) AS v
  FROM documents
),
emb AS (SELECT cast(count(*) AS DOUBLE) AS v FROM embeddings),
ev AS (SELECT cast(count(*) AS DOUBLE) AS v FROM events)
SELECT stat, round(value, 4) AS value FROM (
  SELECT 'n_docs' AS stat, n_docs AS value FROM doc_stats
  UNION ALL SELECT 'n_tokens', n_tokens FROM doc_stats
  UNION ALL SELECT 'mean_tokens_per_doc', mean_tokens FROM doc_stats
  UNION ALL SELECT 'n_languages', v FROM langs
  UNION ALL SELECT 'n_sources', v FROM sources
  UNION ALL SELECT 'vocab_size', v FROM vocab
  UNION ALL SELECT 'exact_dup_docs', v FROM dup
  UNION ALL SELECT 'n_embeddings', v FROM emb
  UNION ALL SELECT 'n_events', v FROM ev
)
ORDER BY stat
"""

_DATACARD_SPARK = D.to_spark_sql(
    _DATACARD_BODY,
    ("string_split(text, ' ')", "split(text, ' ')"),
    ("SELECT unnest(tk) AS tok FROM toks",
     "SELECT explode(tk) AS tok FROM toks"),
    ("len(tk)", "size(tk)"),
)


@register("corpus_datacard", _DATACARD_BODY, tags=("curation",))
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query dataset card: the long-format (stat, value) summary a
    dataset release ships — document/token/vocabulary masses, language
    and source spread, exact-duplicate mass, table sizes. Each stat is
    a single bounded aggregate; the card is their UNION (9 rows),
    computed in one plan so a release pipeline gets its datacard with
    one job. The per-family DEEP stats stay in their own queries
    (dedup censuses, quality distributions, drift) — this is the
    cover page.

    Scale notes (100 TB): one pass per base table; the token explode
    feeds both token mass and vocabulary in a shared scan (Spark
    reuses the exchange); output is O(stats)."""
    register_views(
        spark, sf_dir, tables=("documents", "embeddings", "events")
    )
    return spark.sql(_DATACARD_SPARK)


# ---------------------------------------------------------------------------
# segmented Benford screen (per-country forensic ranking)
# ---------------------------------------------------------------------------

#: Benford expectations as INTEGER 1e-4 fractions, so every deviation
#: is an exact rational |n*10^4 - b4*t| / t — the corpus-level query's
#: double literals never enter an ordering or a rounded difference.
_BENFORD_B4 = "CASE digit " + " ".join(
    f"WHEN {d} THEN {round(p * 10000)}" for d, p in _BENFORD_EXP.items()
) + " END"


def _benford_seg_sql(idiv: str) -> str:
    # the CASE constant references bare `digit`; in dev both grid and
    # counts carry a digit column, so qualify the grid's
    b4_g = D.sub_checked(_BENFORD_B4, ("CASE digit", "CASE g.digit"))
    domain = " UNION ALL ".join(f"SELECT {d} AS digit" for d in range(1, 10))
    return f"""
WITH digits AS (
  SELECT {D.COUNTRY_SQL} AS country, {_BENFORD_DIGIT} AS digit
  FROM events WHERE value IS NOT NULL AND value > 0
),
counts AS (
  SELECT country, digit, cast(count(*) AS BIGINT) AS n FROM digits
  WHERE digit IS NOT NULL GROUP BY country, digit
),
tot AS (SELECT country, cast(sum(n) AS BIGINT) AS t FROM counts
        GROUP BY country),
grid AS (
  -- full country x 1..9 domain: a digit ABSENT from a segment still
  -- contributes its full |0 - expected| deviation (the strongest
  -- fabrication signal for sparse segments), and worst_digit can
  -- name a completely missing digit
  SELECT tt.country, dd.digit, tt.t
  FROM tot tt CROSS JOIN ({domain}) dd
),
dev AS (
  SELECT g.country, g.digit,
         (2 * abs(coalesce(c.n, 0) * 10000 - ({b4_g}) * g.t) + g.t)
           {idiv} (2 * g.t) AS dev4,
         g.t
  FROM grid g LEFT JOIN counts c
    ON c.country = g.country AND c.digit = g.digit
),
ranked AS (
  SELECT country, digit, dev4,
         row_number() OVER (PARTITION BY country
                            ORDER BY dev4 DESC, digit) AS rn
  FROM dev
),
agg AS (
  SELECT country, max(t) AS n_values,
         cast(sum(dev4) AS BIGINT) AS total_dev4
  FROM dev GROUP BY country
)
SELECT a.country,
       a.n_values,
       cast(a.total_dev4 AS DOUBLE) / 10000 AS total_abs_dev,
       cast(r.digit AS BIGINT) AS worst_digit,
       cast(r.dev4 AS DOUBLE) / 10000 AS worst_digit_dev
FROM agg a JOIN ranked r ON r.country = a.country AND r.rn = 1
ORDER BY a.total_dev4 DESC, a.country
"""


@register("benford_by_source", _benford_seg_sql("//"), tags=("anomaly",))
def benford_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEGMENTED Benford screen — forensic practice runs the
    first-digit test per reporting unit, because a single fabricated
    segment disappears into the corpus-level average
    (`benford_digit_census` is the aggregate view): per country, the
    total absolute deviation from Benford across ALL nine digits —
    the country x 1..9 domain is completed by cross join, so a digit
    entirely absent from a segment contributes its full expected-
    fraction deviation and can be named worst_digit (sparse fabricated
    segments are exactly where digits go missing) — ranked worst-
    first, the triage order an auditor works down.

    Determinism: expectations are INTEGER 1e-4 fractions, so each
    digit's deviation is the exact rational |n*10^4 - b4*t| / t
    (half-up 4-dp), the ranking key is an exact integer SUM of those,
    and the worst-digit pick is a deterministic (dev, digit) window —
    no double ever enters a comparison. Same range-ladder digit
    extraction (no log10) as the corpus screen.

    Scale notes (100 TB): one scan, a (segments x 9)-row census,
    per-segment 9-row windows. The cheapest per-unit fraud screen a
    warehouse can run — and the segment key generalizes to supplier/
    account/region unchanged."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_benford_seg_sql("div"))
