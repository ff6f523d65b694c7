"""Text-analysis operators over the ``documents`` table.

Training-data pipeline surface: token counting (whitespace + regex
"BPE-ish" word pieces), quality scoring (length / lexical diversity /
stopword ratios), language-ID (marker-token heuristic), document
fingerprinting (content hash + rolling-window min-hash), and a full
64-bit SimHash with banded near-pair search.

Everything is built-in JVM expressions (no Python in the hot path).
SimHash needs per-bit arithmetic on md5 nibbles; the 64 bit-sum
aggregates are *generated* per SQL dialect (Spark ``div`` vs DuckDB
``//``) from one template so the oracle is the same algorithm by
construction.

Scale notes (100 TB): all per-doc operators are embarrassingly
parallel single-scan projections; the only shuffles are the bounded
group-bys (per doc / per lang) and the banded simhash self-join, which
is keyed by 16-bit bands (same LSH-bucket-join shape as MinHash).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import dialect as _D
from ..io import load_table, register_views
from ..registry import register

STOPWORDS = ("a", "the")
_HEX = "0123456789abcdef"
_POPCNT = "0112122312232334"  # popcount of 0..15, as a lookup string

# ---------------------------------------------------------------------------
# token stats per language
# ---------------------------------------------------------------------------

_TOKEN_STATS_BODY = """
SELECT lang,
       count(*) AS n_docs,
       cast(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       cast(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)
         AS total_words,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens_per_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("token_stats", _TOKEN_STATS_BODY, headline=True, tags=("text",))
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token census per language: whitespace tokens, regex word
    pieces, characters. Single scan, 5-group shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    words = F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws).cast("bigint").alias("total_tokens"),
            F.sum(words).cast("bigint").alias("total_words"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg(ws), 4).alias("avg_tokens_per_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# per-document quality score
# ---------------------------------------------------------------------------

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

_QUALITY_DUCK = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
)
SELECT doc_id, lang,
       len(tk) AS n_tokens,
       len(list_distinct(tk)) AS n_distinct_tokens,
       round(len(list_distinct(tk)) / cast(len(tk) AS DOUBLE), 4) AS ttr,
       round(len(list_filter(tk, x -> x IN ({_SW_LIST})))
             / cast(len(tk) AS DOUBLE), 4) AS stopword_ratio,
       round(least(1.0, ln(1 + len(tk)) / 5)
             * (len(list_distinct(tk)) / cast(len(tk) AS DOUBLE))
             * (1 - len(list_filter(tk, x -> x IN ({_SW_LIST})))
                    / cast(len(tk) AS DOUBLE)), 4) AS quality_score
FROM t
ORDER BY doc_id
"""


@register("doc_quality", _QUALITY_DUCK, tags=("text",))
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, type-token ratio
    (lexical diversity), stopword ratio, and a composite score
    (log-length x diversity x content-density). Pure projection — no
    shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n = F.size(tk).cast("double")
    nd = F.size(F.array_distinct(tk))
    sw = F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({_SW_LIST}))"))
    ttr = nd / n
    swr = sw / n
    score = F.least(F.lit(1.0), F.log(1 + F.size(tk)) / 5) * ttr * (1 - swr)
    return docs.select(
        "doc_id",
        "lang",
        F.size(tk).alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        F.round(ttr, 4).alias("ttr"),
        F.round(swr, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# language-ID (marker-token heuristic)
# ---------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "los", "de"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "une"),
}


def _hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(tk, x -> x IN ({lst})))"


def _hits_spark(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"size(filter(split(text, ' '), x -> x IN ({lst})))"


_LANG_ID_DUCK = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
s AS (
  SELECT doc_id, lang,
         {_hits_sql('en')} AS en_hits, {_hits_sql('es')} AS es_hits,
         {_hits_sql('de')} AS de_hits, {_hits_sql('fr')} AS fr_hits
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0 THEN 'und'
            WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en'
            WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es'
            WHEN de_hits >= fr_hits THEN 'de'
            ELSE 'fr' END AS predicted_lang,
       en_hits, es_hits, de_hits, fr_hits
FROM s ORDER BY doc_id
"""


@register("lang_id_markers", _LANG_ID_DUCK, tags=("text",))
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language identification (stopword-profile n-gram
    heuristic, deterministic argmax with fixed tie order). The fixture
    corpus shares one vocabulary across langs, so predictions skew
    'en'/'und' — the operator contract (per-doc scores + argmax) is
    what's under test."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        F.expr(_hits_spark("en")).alias("en_hits"),
        F.expr(_hits_spark("es")).alias("es_hits"),
        F.expr(_hits_spark("de")).alias("de_hits"),
        F.expr(_hits_spark("fr")).alias("fr_hits"),
    )
    pred = F.expr(
        "CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0 THEN 'und' "
        "WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en' "
        "WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es' "
        "WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END"
    )
    return s.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        "en_hits",
        "es_hits",
        "de_hits",
        "fr_hits",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# document fingerprinting (content hash + rolling 5-gram min-hash)
# ---------------------------------------------------------------------------

_FINGERPRINT_DUCK = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk, text FROM documents
  WHERE len(string_split(text, ' ')) >= 5
)
SELECT doc_id,
       substr(md5(text), 1, 16) AS content_fp,
       (SELECT min(substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                          || ' ' || tk[i+3] || ' ' || tk[i+4]), 1, 16))
        FROM UNNEST(generate_series(1, len(tk) - 4)) AS g(i)) AS rolling_fp
FROM t ORDER BY doc_id
"""


@register("doc_fingerprint", _FINGERPRINT_DUCK, tags=("text",))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two fingerprints per doc: whole-content hash (exact-dup key) and
    the min over rolling word-5-gram hashes (a 1-hash MinHash — stable
    under small edits, the winnowing idea reduced to one band)."""
    docs = load_table(spark, sf_dir, "documents")
    rolling = F.expr(
        "array_min(transform(sequence(1, size(tk) - 4), i -> "
        "substr(md5(concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), "
        "element_at(tk, i + 2), element_at(tk, i + 3), element_at(tk, i + 4))), "
        "1, 16)))"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("tk"), "text")
        .where(F.size("tk") >= 5)
        .select(
            "doc_id",
            F.substring(F.md5("text"), 1, 16).alias("content_fp"),
            rolling.alias("rolling_fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# 64-bit SimHash (generated per-dialect bit arithmetic)
# ---------------------------------------------------------------------------


_TOKS_DUCK = (
    "SELECT doc_id, tok, count(*) AS w FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "GROUP BY doc_id, tok"
)
_TOKS_SPARK = (
    "SELECT doc_id, tok, count(*) AS w FROM "
    "(SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents) "
    "GROUP BY doc_id, tok"
)


def _simhash_sql(intdiv: str, toks_subquery: str) -> str:
    """Full simhash query; ``intdiv`` is 'div' (Spark) or '//' (DuckDB).

    Bit j of nibble n (MSB-first) of md5(token): parse the nibble via an
    instr lookup, shift with integer division, mask with %2. A bit of
    the final simhash is 1 iff the occurrence-weighted bit-sum is
    > half the token count.

    The md5/bit arithmetic runs once per DISTINCT (doc, token) with an
    occurrence weight ``w`` — on natural corpora tokens repeat heavily,
    so this is a large constant-factor win over hashing every
    occurrence (and the natural shape for a global vocabulary table at
    100 TB: hash the vocab once, broadcast-join the weights).
    """
    sums = []
    for n in range(16):
        for j in range(4):
            mask = 8 >> j
            sums.append(
                f"sum(w * (((instr('{_HEX}', substr(h, {n + 1}, 1)) - 1) "
                f"{intdiv} {mask}) % 2)) AS s_{n}_{j}"
            )
    nibble_chars = []
    for n in range(16):
        bits = " + ".join(
            f"(CASE WHEN 2 * s_{n}_{j} > cnt THEN {8 >> j} ELSE 0 END)"
            for j in range(4)
        )
        nibble_chars.append(f"substr('{_HEX}', ({bits}) + 1, 1)")
    concat = " || ".join(nibble_chars)
    return f"""
WITH toks AS ({toks_subquery}),
hashed AS (SELECT doc_id, w, md5(tok) AS h FROM toks),
bitsums AS (
  SELECT doc_id, sum(w) AS cnt, {', '.join(sums)}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, {concat} AS simhash
FROM bitsums
"""


_SIMHASH_DUCK = _simhash_sql("//", _TOKS_DUCK) + " ORDER BY doc_id"
_SIMHASH_SPARK = _simhash_sql("div", _TOKS_SPARK) + " ORDER BY doc_id"


@register("simhash_docs", _SIMHASH_DUCK, headline=True, tags=("text", "dedup"))
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (hex string): per-token md5 bits,
    occurrence-weighted majority vote per bit. One explode + one
    group-by-doc with 64 sum aggregates — all codegen'd integer math,
    no UDF."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_SIMHASH_SPARK)


def _near_sql(xor_fmt: str, explode4: str, simhash_cte: str) -> str:
    terms = []
    for p in range(1, 17):
        a_nib = f"(instr('{_HEX}', substr(a.simhash, {p}, 1)) - 1)"
        b_nib = f"(instr('{_HEX}', substr(b.simhash, {p}, 1)) - 1)"
        x = xor_fmt.format(a=a_nib, b=b_nib)
        terms.append(f"cast(substr('{_POPCNT}', ({x}) + 1, 1) AS INT)")
    hamming = " + ".join(terms)
    return f"""
WITH sh AS ({simhash_cte}),
bands AS (
  SELECT doc_id, b.band_idx AS band_idx,
         substr(simhash, b.band_idx * 4 + 1, 4) AS band
  FROM sh CROSS JOIN {explode4}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band = y.band AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, ({hamming}) AS hamming
FROM cand
JOIN sh a ON a.doc_id = doc_a
JOIN sh b ON b.doc_id = doc_b
WHERE ({hamming}) <= 6
ORDER BY doc_a, doc_b
"""


_SIMHASH_NEAR_DUCK = _near_sql(
    "xor({a}, {b})",
    "(SELECT unnest(generate_series(0, 3)) AS band_idx) AS b",
    _simhash_sql("//", _TOKS_DUCK),
)

_SIMHASH_NEAR_SPARK = _near_sql(
    "({a} ^ {b})",
    "(SELECT explode(sequence(0, 3)) AS band_idx) AS b",
    _simhash_sql("div", _TOKS_SPARK),
)


@register("simhash_near_pairs", _SIMHASH_NEAR_DUCK, tags=("text", "dedup"))
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: 4 x 16-bit bands for candidate
    blocking (a pair within Hamming distance <= 3 of 64 must agree on
    >= 1 band; we keep pairs at distance <= 6, accepting band-miss
    recall loss — the standard Charikar trade)."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_SIMHASH_NEAR_SPARK)


# ---------------------------------------------------------------------------
# Gopher/MassiveText rule-pack filter census
# ---------------------------------------------------------------------------

#: Adapted Gopher rules (Rae et al. 2021, MassiveText filtering,
#: Table A1). Bounds calibrated so every rule is LIVE on the synthetic
#: fixture (a rule that can never fire is the empty-vs-empty oracle
#: trap): the fixture's mean word lengths sit in [3.7, 5.3] where web
#: text spans [3, 10], so the upper bound tightens to 4.75; the
#: word-count floor drops 50 -> 20 (fixture docs cap at ~100 words);
#: symbol/ellipsis/bullet rules are dropped entirely (the synthetic
#: corpus is alphanumeric-pure — they CANNOT fire, and are documented
#: out rather than shipped dead). The stopword and top-word rules are
#: the paper's own thresholds.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 4.75
GOPHER_MIN_STOPWORDS = 2
GOPHER_TOPWORD_FRAC = 0.2
_GOPHER_SW = "'the','be','to','of','and','that','have','with'"

_GOPHER_DUCK = f"""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
),
m AS (
  SELECT doc_id, source, len(tk) AS n,
         round(list_sum(list_transform(tk, x -> cast(length(x) AS BIGINT)))
               / cast(len(tk) AS DOUBLE), 4) AS mwl,
         len(list_filter(tk, x -> x IN ({_GOPHER_SW}))) AS sw
  FROM t
),
w AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM t, UNNEST(tk) AS u(x) GROUP BY doc_id, x
  ) GROUP BY doc_id
),
f AS (
  SELECT m.source,
         (n < {GOPHER_MIN_WORDS} OR n > {GOPHER_MAX_WORDS}) AS f_wc,
         (mwl < {GOPHER_MWL_LO} OR mwl > {GOPHER_MWL_HI}) AS f_mwl,
         (sw < {GOPHER_MIN_STOPWORDS}) AS f_sw,
         (round(mc / cast(n AS DOUBLE), 4) > {GOPHER_TOPWORD_FRAC}) AS f_tw
  FROM m JOIN w USING (doc_id)
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_word_count,
       cast(sum(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_mean_word_len,
       cast(sum(CASE WHEN f_sw THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_stopwords,
       cast(sum(CASE WHEN f_tw THEN 1 ELSE 0 END) AS BIGINT)
         AS fail_top_word,
       cast(sum(CASE WHEN NOT (f_wc OR f_mwl OR f_sw OR f_tw)
                THEN 1 ELSE 0 END) AS BIGINT) AS survivors
FROM f
GROUP BY source
ORDER BY source
"""


@register("gopher_quality_flags", _GOPHER_DUCK, tags=("text", "curation"))
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n = F.size(tk)
    mwl = F.round(
        F.expr(
            "aggregate(transform(split(text, ' '), x -> length(x)), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        )
        / n.cast("double"),
        4,
    )
    sw = F.size(
        F.expr(f"filter(split(text, ' '), x -> x IN ({_GOPHER_SW}))")
    )
    m = docs.select(
        "doc_id",
        "source",
        n.alias("n"),
        mwl.alias("mwl"),
        sw.alias("sw"),
    )
    tok = docs.select("doc_id", F.explode(tk).alias("x"))
    topw = (
        tok.groupBy("doc_id", "x")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mc"))
    )
    f = m.join(topw, "doc_id").select(
        "source",
        (
            (F.col("n") < GOPHER_MIN_WORDS)
            | (F.col("n") > GOPHER_MAX_WORDS)
        ).alias("f_wc"),
        (
            (F.col("mwl") < GOPHER_MWL_LO) | (F.col("mwl") > GOPHER_MWL_HI)
        ).alias("f_mwl"),
        (F.col("sw") < GOPHER_MIN_STOPWORDS).alias("f_sw"),
        (
            F.round(F.col("mc") / F.col("n").cast("double"), 4)
            > GOPHER_TOPWORD_FRAC
        ).alias("f_tw"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")
    return (
        f.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            cnt("f_wc").alias("fail_word_count"),
            cnt("f_mwl").alias("fail_mean_word_len"),
            cnt("f_sw").alias("fail_stopwords"),
            cnt("f_tw").alias("fail_top_word"),
            F.sum(
                F.when(
                    ~(
                        F.col("f_wc")
                        | F.col("f_mwl")
                        | F.col("f_sw")
                        | F.col("f_tw")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("survivors"),
        )
        .orderBy("source")
    )
gopher_quality_flags.__doc__ = """The Gopher/MassiveText rule-pack filter (Rae et al. 2021) as a
    per-source census: each doc is tested against the adapted rule set
    (word count, mean word length, >= {GOPHER_MIN_STOPWORDS} of the
    paper's 8 stopwords, most-frequent-word occupancy <=
    {GOPHER_TOPWORD_FRAC}) and the census reports how many docs each
    rule kills plus the survivors that pass ALL rules — the
    rule-attribution view a curation team tunes thresholds with
    (`doc_quality` scores; this FILTERS, with per-rule blame).

    Determinism: word counts / stopword hits / top-word counts are
    integers; mean word length and top-word fraction are rounded to
    4 dp on both engines BEFORE threshold comparison, so summation
    order cannot flip a rule.

    Scale notes (100 TB): word-count, mean-length and stopword rules
    are pure map-side projections (array folds inside codegen — no
    explode, no shuffle); only the top-word rule needs the (doc_id,
    token) census, one shuffle keyed by doc_id x token with map-side
    partial counts, then a bounded per-doc max. The final rollup is
    |sources| rows. This is the cheapest possible shape: one shuffle
    for the whole rule pack.""".format(GOPHER_MIN_STOPWORDS=GOPHER_MIN_STOPWORDS, GOPHER_TOPWORD_FRAC=GOPHER_TOPWORD_FRAC)


# ---------------------------------------------------------------------------
# filter-funnel census: sequential-gate attrition through the pipeline
# ---------------------------------------------------------------------------

#: planted exact copies so the dedup stage provably drops rows at any
#: SF (the fixture corpus has no verbatim duplicates); offset keeps
#: planted ids disjoint from real ones and below the CC planted base.
FUNNEL_PLANT_MOD = 23
FUNNEL_ID_OFFSET = 50_000_000

_FUNNEL_STAGES = (
    (1, "lang_en"),
    (2, "word_count"),
    (3, "mean_word_len"),
    (4, "stopwords"),
    (5, "top_word"),
    (6, "exact_dedup"),
)

_FUNNEL_DUCK = f"""
WITH corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + {FUNNEL_ID_OFFSET}, text, lang FROM documents
  WHERE doc_id % {FUNNEL_PLANT_MOD} = 0
),
t AS (SELECT doc_id, text, lang, string_split(text, ' ') AS tk FROM corpus),
m AS (
  SELECT doc_id, text, lang, len(tk) AS n,
         round(list_sum(list_transform(tk, x -> cast(length(x) AS BIGINT)))
               / cast(len(tk) AS DOUBLE), 4) AS mwl,
         len(list_filter(tk, x -> x IN ({_GOPHER_SW}))) AS sw
  FROM t
),
w AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM t, UNNEST(tk) AS u(x) GROUP BY doc_id, x
  ) GROUP BY doc_id
),
p AS (
  SELECT m.doc_id, m.text, m.n,
         (lang = 'en') AS p1,
         (lang = 'en') AND
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AS p2,
         (lang = 'en') AND
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AND
           (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AS p3,
         (lang = 'en') AND
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AND
           (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AND
           (sw >= {GOPHER_MIN_STOPWORDS}) AS p4,
         (lang = 'en') AND
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AND
           (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AND
           (sw >= {GOPHER_MIN_STOPWORDS}) AND
           (round(mc / cast(n AS DOUBLE), 4) <= {GOPHER_TOPWORD_FRAC}) AS p5
  FROM m JOIN w USING (doc_id)
),
k AS (
  SELECT doc_id, n,
         (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS keep
  FROM p WHERE p5
),
c AS (
  SELECT (SELECT count(*) FROM p) AS c0,
         (SELECT count(*) FROM p WHERE p1) AS c1,
         (SELECT count(*) FROM p WHERE p2) AS c2,
         (SELECT count(*) FROM p WHERE p3) AS c3,
         (SELECT count(*) FROM p WHERE p4) AS c4,
         (SELECT count(*) FROM p WHERE p5) AS c5,
         (SELECT count(*) FROM k WHERE keep) AS c6,
         (SELECT coalesce(sum(n), 0) FROM p) AS t0,
         (SELECT coalesce(sum(n), 0) FROM p WHERE p1) AS t1,
         (SELECT coalesce(sum(n), 0) FROM p WHERE p2) AS t2,
         (SELECT coalesce(sum(n), 0) FROM p WHERE p3) AS t3,
         (SELECT coalesce(sum(n), 0) FROM p WHERE p4) AS t4,
         (SELECT coalesce(sum(n), 0) FROM p WHERE p5) AS t5,
         (SELECT coalesce(sum(n), 0) FROM k WHERE keep) AS t6
),
s AS (
  SELECT 1 AS stage, 'lang_en' AS stage_name, c0 AS n_in, c1 AS n_out,
         c0 AS n_total, t1 AS t_out, t0 AS t_total FROM c
  UNION ALL SELECT 2, 'word_count', c1, c2, c0, t2, t0 FROM c
  UNION ALL SELECT 3, 'mean_word_len', c2, c3, c0, t3, t0 FROM c
  UNION ALL SELECT 4, 'stopwords', c3, c4, c0, t4, t0 FROM c
  UNION ALL SELECT 5, 'top_word', c4, c5, c0, t5, t0 FROM c
  UNION ALL SELECT 6, 'exact_dedup', c5, c6, c0, t6, t0 FROM c
)
SELECT cast(stage AS BIGINT) AS stage, stage_name,
       cast(n_in AS BIGINT) AS n_in,
       cast(n_out AS BIGINT) AS n_out,
       cast(n_in - n_out AS BIGINT) AS dropped,
       CASE WHEN n_in = 0 THEN 0.0
            ELSE round(cast((n_in - n_out) * 100 AS DOUBLE) / n_in, 4)
       END AS drop_pct,
       round(cast(n_out * 100 AS DOUBLE) / n_total, 4)
         AS cum_survival_pct,
       cast(t_out AS BIGINT) AS n_tokens_out,
       round(cast(t_out * 100 AS DOUBLE) / t_total, 4)
         AS cum_token_survival_pct
FROM s
ORDER BY stage
"""


@register("filter_funnel_census", _FUNNEL_DUCK, tags=("text", "curation"))
def filter_funnel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    planted = docs.where(F.col("doc_id") % FUNNEL_PLANT_MOD == 0).select(
        (F.col("doc_id") + FUNNEL_ID_OFFSET).alias("doc_id"), "text", "lang"
    )
    corpus = docs.unionByName(planted)
    tk = F.split("text", " ")
    n = F.size(tk)
    mwl = F.round(
        F.expr(
            "aggregate(transform(split(text, ' '), x -> length(x)), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        )
        / n.cast("double"),
        4,
    )
    sw = F.size(
        F.expr(f"filter(split(text, ' '), x -> x IN ({_GOPHER_SW}))")
    )
    m = corpus.select(
        "doc_id", "text", "lang", n.alias("n"), mwl.alias("mwl"),
        sw.alias("sw"),
    )
    topw = (
        corpus.select("doc_id", F.explode(tk).alias("x"))
        .groupBy("doc_id", "x")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mc"))
    )
    g1 = F.col("lang") == "en"
    g2 = (F.col("n") >= GOPHER_MIN_WORDS) & (F.col("n") <= GOPHER_MAX_WORDS)
    g3 = (F.col("mwl") >= GOPHER_MWL_LO) & (F.col("mwl") <= GOPHER_MWL_HI)
    g4 = F.col("sw") >= GOPHER_MIN_STOPWORDS
    g5 = (
        F.round(F.col("mc") / F.col("n").cast("double"), 4)
        <= GOPHER_TOPWORD_FRAC
    )
    p = m.join(topw, "doc_id").select(
        "doc_id",
        "text",
        "n",
        g1.alias("p1"),
        (g1 & g2).alias("p2"),
        (g1 & g2 & g3).alias("p3"),
        (g1 & g2 & g3 & g4).alias("p4"),
        (g1 & g2 & g3 & g4 & g5).alias("p5"),
    ).localCheckpoint(eager=False)  # feeds the counts AND the dedup gate
    keep = (
        p.where("p5")
        .select(
            "doc_id",
            "n",
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    Window.partitionBy(F.md5(F.col("text")))
                )
            ).alias("keep"),
        )
        .where("keep")
        .agg(
            F.count("*").cast("bigint").alias("c6"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("t6"),
        )
    )
    pcount = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")
    ptoks = lambda c: (
        F.sum(F.when(F.col(c), F.col("n")).otherwise(0)).cast("bigint")
    )
    counts = p.agg(
        F.count("*").cast("bigint").alias("c0"),
        pcount("p1").alias("c1"),
        pcount("p2").alias("c2"),
        pcount("p3").alias("c3"),
        pcount("p4").alias("c4"),
        pcount("p5").alias("c5"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("t0"),
        ptoks("p1").alias("t1"),
        ptoks("p2").alias("t2"),
        ptoks("p3").alias("t3"),
        ptoks("p4").alias("t4"),
        ptoks("p5").alias("t5"),
    ).crossJoin(keep)
    stage_structs = [
        F.struct(
            F.lit(st).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col(f"c{st - 1}").alias("n_in"),
            F.col(f"c{st}").alias("n_out"),
            F.col(f"t{st}").alias("t_out"),
        )
        for st, name in _FUNNEL_STAGES
    ]
    rows = counts.select(
        "c0", "t0", F.explode(F.array(*stage_structs)).alias("s")
    ).select("c0", "t0", "s.*")
    return rows.select(
        "stage",
        "stage_name",
        "n_in",
        "n_out",
        (F.col("n_in") - F.col("n_out")).cast("bigint").alias("dropped"),
        F.when(F.col("n_in") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                ((F.col("n_in") - F.col("n_out")) * 100).cast("double")
                / F.col("n_in"),
                4,
            )
        )
        .alias("drop_pct"),
        F.round(
            (F.col("n_out") * 100).cast("double") / F.col("c0"), 4
        ).alias("cum_survival_pct"),
        F.col("t_out").alias("n_tokens_out"),
        F.round(
            (F.col("t_out") * 100).cast("double") / F.col("t0"), 4
        ).alias("cum_token_survival_pct"),
    ).orderBy("stage")
filter_funnel_census.__doc__ = """FineWeb/RefinedWeb-style filter FUNNEL: the per-stage attrition
    table a dataset builder watches while tuning a curation pipeline.
    Stages run SEQUENTIALLY (a doc reaches stage k only if it passed
    1..k-1): language gate (keep 'en'), then the four Gopher rules
    (word count, mean word length, stopword floor, top-word
    occupancy — identical thresholds and 4-dp quantization as
    `gopher_quality_flags`, so the two views reconcile), then exact
    dedup (keep-lowest-id per md5(text)) among the quality survivors.
    Each row reports n_in, n_out, dropped, drop_pct and cumulative
    survival vs the raw corpus at BOTH doc and token grain
    (n_tokens_out / cum_token_survival_pct — the number dataset
    papers actually publish) — the "where did my tokens go" table
    (FineWeb keeps ~10% end-to-end; this fixture's funnel shape is
    pinned by the planted copies). Exact copies are planted
    (doc_id % {mod} == 0 re-inserted at +{off}) so the dedup stage
    provably fires at every SF.

    Scale notes (100 TB): the gate predicates are map-side array
    folds (one doc_id x token shuffle for the top-word rule, shared
    with the gopher census shape); the prefix-pass table is
    materialized ONCE and feeds both the count aggregation (6 sums in
    one pass) and the dedup window (keyed by md5(text) — the exact
    `dedup_exact_groups` shuffle). Output is 6 rows regardless of
    corpus size.""".format(mod=FUNNEL_PLANT_MOD, off=FUNNEL_ID_OFFSET)


_FUNNEL_BY_SRC_DUCK = f"""
WITH corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + {FUNNEL_ID_OFFSET}, text, lang, source FROM documents
  WHERE doc_id % {FUNNEL_PLANT_MOD} = 0
),
t AS (SELECT doc_id, text, lang, source, string_split(text, ' ') AS tk
      FROM corpus),
m AS (
  SELECT doc_id, text, lang, source, len(tk) AS n,
         round(list_sum(list_transform(tk, x -> cast(length(x) AS BIGINT)))
               / cast(len(tk) AS DOUBLE), 4) AS mwl,
         len(list_filter(tk, x -> x IN ({_GOPHER_SW}))) AS sw
  FROM t
),
w AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, x, count(*) AS c
    FROM t, UNNEST(tk) AS u(x) GROUP BY doc_id, x
  ) GROUP BY doc_id
),
p AS (
  SELECT m.doc_id, m.text, m.source, m.n,
         (lang = 'en') AND
           (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AND
           (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AND
           (sw >= {GOPHER_MIN_STOPWORDS}) AND
           (round(mc / cast(n AS DOUBLE), 4) <= {GOPHER_TOPWORD_FRAC}) AS p5
  FROM m JOIN w USING (doc_id)
),
k AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS keep
  FROM p WHERE p5
),
fin AS (SELECT p.source, p.n, coalesce(k.keep, FALSE) AS keep
        FROM p LEFT JOIN k USING (doc_id))
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       round(cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 100 AS DOUBLE)
             / count(*), 4) AS survival_pct,
       cast(sum(n) AS BIGINT) AS n_tokens,
       cast(sum(CASE WHEN keep THEN n ELSE 0 END) AS BIGINT)
         AS n_tokens_surviving,
       round(cast(sum(CASE WHEN keep THEN n ELSE 0 END) * 100 AS DOUBLE)
             / sum(n), 4) AS token_survival_pct
FROM fin
GROUP BY source
ORDER BY survival_pct DESC, source
"""


@register(
    "funnel_survival_by_source", _FUNNEL_BY_SRC_DUCK, tags=("text", "curation")
)
def funnel_survival_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    planted = docs.where(F.col("doc_id") % FUNNEL_PLANT_MOD == 0).select(
        (F.col("doc_id") + FUNNEL_ID_OFFSET).alias("doc_id"),
        "text",
        "lang",
        "source",
    )
    corpus = docs.unionByName(planted)
    tk = F.split("text", " ")
    n = F.size(tk)
    mwl = F.round(
        F.expr(
            "aggregate(transform(split(text, ' '), x -> length(x)), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        )
        / n.cast("double"),
        4,
    )
    sw = F.size(
        F.expr(f"filter(split(text, ' '), x -> x IN ({_GOPHER_SW}))")
    )
    m = corpus.select(
        "doc_id", "text", "lang", "source", n.alias("n"),
        mwl.alias("mwl"), sw.alias("sw"),
    )
    topw = (
        corpus.select("doc_id", F.explode(tk).alias("x"))
        .groupBy("doc_id", "x")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mc"))
    )
    p5 = (
        (F.col("lang") == "en")
        & (F.col("n") >= GOPHER_MIN_WORDS)
        & (F.col("n") <= GOPHER_MAX_WORDS)
        & (F.col("mwl") >= GOPHER_MWL_LO)
        & (F.col("mwl") <= GOPHER_MWL_HI)
        & (F.col("sw") >= GOPHER_MIN_STOPWORDS)
        & (
            F.round(F.col("mc") / F.col("n").cast("double"), 4)
            <= GOPHER_TOPWORD_FRAC
        )
    )
    p = m.join(topw, "doc_id").select(
        "doc_id", "text", "source", "n", p5.alias("p5")
    ).localCheckpoint(eager=False)  # feeds the dedup gate AND the rollup
    k = (
        p.where("p5")
        .select(
            "doc_id",
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    Window.partitionBy(F.md5(F.col("text")))
                )
            ).alias("keep"),
        )
    )
    fin = p.join(k, "doc_id", "left").select(
        "source", "n", F.coalesce("keep", F.lit(False)).alias("keep")
    )
    kept = lambda e: F.sum(F.when(F.col("keep"), e).otherwise(0)).cast(
        "bigint"
    )
    return (
        fin.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            kept(F.lit(1)).alias("n_survivors"),
            F.round(
                (kept(F.lit(1)) * 100).cast("double") / F.count("*"), 4
            ).alias("survival_pct"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            kept(F.col("n")).alias("n_tokens_surviving"),
            F.round(
                (kept(F.col("n")) * 100).cast("double") / F.sum("n"), 4
            ).alias("token_survival_pct"),
        )
        .orderBy(F.desc("survival_pct"), "source")
    )
funnel_survival_by_source.__doc__ = """The SOURCE league table behind `filter_funnel_census`: the same
    sequential gate stack (lang -> four Gopher rules -> exact dedup
    among quality survivors) collapsed to end-to-end survival per
    source, at doc and token grain — the ranking a dataset builder
    uses to decide which crawls/feeds to renegotiate or drop. Same
    planted copies ({mod}/{off}) so dedup attrition shows up; same
    thresholds and 4-dp quantization, so the census and this table
    reconcile exactly.

    Scale notes (100 TB): identical shape to the census (map-side
    gate folds + one doc_id x token shuffle + one md5 window), plus a
    |sources|-row rollup. The keep flag joins back on doc_id — a
    checkpointed equi-join, never a second text scan.""".format(
    mod=FUNNEL_PLANT_MOD, off=FUNNEL_ID_OFFSET
)


# ---------------------------------------------------------------------------
# language-ID confusion matrix (classifier eval census)
# ---------------------------------------------------------------------------

_LANG_CONF_DUCK = f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
s AS (
  SELECT doc_id, lang,
         {_hits_sql('en')} AS en_hits, {_hits_sql('es')} AS es_hits,
         {_hits_sql('de')} AS de_hits, {_hits_sql('fr')} AS fr_hits
  FROM t
),
pred AS (
  SELECT lang,
         CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0 THEN 'und'
              WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en'
              WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es'
              WHEN de_hits >= fr_hits THEN 'de'
              ELSE 'fr' END AS predicted_lang
  FROM s
),
conf AS (
  SELECT lang, predicted_lang, count(*) AS n FROM pred
  GROUP BY lang, predicted_lang
),
tot AS (SELECT lang, sum(n) AS tn FROM conf GROUP BY lang)
SELECT conf.lang, conf.predicted_lang,
       cast(conf.n AS BIGINT) AS n_docs,
       round(cast(conf.n AS DOUBLE) / tot.tn, 4) AS frac
FROM conf JOIN tot ON conf.lang = tot.lang
ORDER BY conf.lang, conf.predicted_lang
"""


@register("langid_confusion_matrix", _LANG_CONF_DUCK, tags=("text",))
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-normalized confusion matrix of the marker-token language
    classifier against the labeled `lang` column — the
    classifier-evaluation census (`ann_recall_eval`'s pattern applied
    to lang-ID): per (true, predicted) cell count and the
    within-true-language fraction. On the shared-vocabulary fixture
    this honestly documents the heuristic's en/und skew; on real
    crawl text the same census is the regression gate run after every
    marker-list change.

    Scale notes (100 TB): one scan with four constant-list filters
    (codegen'd), a |langs|x|langs|-bounded rollup, and a broadcast of
    the |langs|-row totals. Nothing corpus-sized past the scan."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "lang",
        F.expr(_hits_spark("en")).alias("en_hits"),
        F.expr(_hits_spark("es")).alias("es_hits"),
        F.expr(_hits_spark("de")).alias("de_hits"),
        F.expr(_hits_spark("fr")).alias("fr_hits"),
    )
    pred = F.expr(
        "CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0 THEN 'und' "
        "WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en' "
        "WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es' "
        "WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END"
    )
    conf = (
        s.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    tot = conf.groupBy("lang").agg(F.sum("n").alias("tn"))
    return (
        conf.join(tot, "lang")
        .select(
            "lang",
            "predicted_lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(F.col("n").cast("double") / F.col("tn"), 4).alias("frac"),
        )
        .orderBy("lang", "predicted_lang")
    )


# ---------------------------------------------------------------------------
# distribution drift: per-source unigram KL divergence vs the corpus
# ---------------------------------------------------------------------------

#: add-one smoothing keeps KL finite when a source lacks a corpus token.
_KL_SMOOTH = 1

_KL_DUCK = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT DISTINCT tok FROM toks),
corpus AS (
  SELECT tok, count(*) AS cn FROM toks GROUP BY tok
),
ctot AS (SELECT sum(cn) AS t, count(*) AS v FROM corpus),
per_src AS (
  SELECT s.source, v.tok, coalesce(x.sn, 0) AS sn
  FROM (SELECT DISTINCT source FROM toks) s
  CROSS JOIN vocab v
  LEFT JOIN (
    SELECT source, tok, count(*) AS sn FROM toks GROUP BY source, tok
  ) x ON x.source = s.source AND x.tok = v.tok
),
stot AS (SELECT source, sum(sn) AS st FROM per_src GROUP BY source),
kl AS (
  SELECT p.source,
         sum(
           (cast(p.sn + {_KL_SMOOTH} AS DOUBLE) / (stot.st + ctot.v))
           * ln(
               (cast(p.sn + {_KL_SMOOTH} AS DOUBLE) / (stot.st + ctot.v))
               / (cast(c.cn + {_KL_SMOOTH} AS DOUBLE) / (ctot.t + ctot.v))
             )
         ) AS kl_bits
  FROM per_src p
  JOIN corpus c ON p.tok = c.tok
  JOIN stot ON p.source = stot.source
  CROSS JOIN ctot
  GROUP BY p.source
)
SELECT source, round(kl_bits, 4) + 0 AS kl_nats
FROM kl ORDER BY source
"""

_KL_SPARK = _D.to_spark_sql(
    _KL_DUCK,
    ("unnest(string_split(text, ' '))", "explode(split(text, ' '))"),
)


@register("unigram_kl_drift", _KL_DUCK, tags=("text", "curation"))
def unigram_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift census: KL(source || corpus) over smoothed
    unigram distributions, per source — the drift detector a corpus
    pipeline runs on every new crawl slice before mixing it in (a
    source whose token distribution diverges is contaminated, template
    spam, or mislabeled-language; on the uniform fixture all KLs are
    near zero, which IS the calibration baseline). Add-one smoothing
    over the shared vocabulary keeps the divergence finite.

    Determinism: terms are ratios of exact integers passed through
    ln() and summed per source — the same ln-then-round-4dp contract
    as `bigram_lm_perplexity`/`bm25_topk` (summation-order ulp noise
    is orders below the rounding grain on this vocabulary size).

    Scale notes (100 TB): two vocabulary-bounded group-bys plus a
    (sources x vocab) dense grid — bounded by |V|, NOT corpus size
    (the grid exists so absent tokens contribute their smoothed mass;
    production keeps |V| to the top-k vocabulary, same plan). The
    token explosion is the one corpus-sized pass."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_KL_SPARK)


# ---------------------------------------------------------------------------
# cross-source quality-score calibration (rank normalization)
# ---------------------------------------------------------------------------

_CALIB_BODY = f"""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
),
scored AS (
  SELECT doc_id, source,
         round(least(1.0, ln(1 + len(tk)) / 5)
               * (len(list_distinct(tk)) / cast(len(tk) AS DOUBLE))
               * (1 - len(list_filter(tk, x -> x IN ({{sw}})))
                      / cast(len(tk) AS DOUBLE)), 4) AS score
  FROM t
),
pct AS (
  SELECT source, score,
         percent_rank() OVER (ORDER BY score, doc_id) AS pct_global
  FROM scored
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       round(avg(score), 4) AS mean_score,
       round(avg(pct_global), 4) AS mean_pct,
       round(abs(avg(pct_global) - 0.5), 4) AS calib_gap
FROM pct
GROUP BY source
ORDER BY source
"""


def _calib_duck() -> str:
    return _CALIB_BODY.format(sw=_SW_LIST)


def _calib_spark() -> str:
    # Presence-checked (functions/dialect.py:to_spark_sql): body drift
    # raises instead of silently shipping DuckDB syntax to Spark.
    return _D.to_spark_sql(
        _CALIB_BODY.format(sw=_SW_LIST),
        ("string_split(text, ' ')", "split(text, ' ')"),
        ("list_distinct", "array_distinct"),
        ("list_filter", "filter"),
        ("len(", "size("),
    )


@register("quality_rank_calibration", _calib_duck(), tags=("text", "curation"))
def quality_rank_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: each document's composite
    quality score (the `doc_quality` formula) mapped to its GLOBAL
    percentile (percent_rank with a deterministic (score, doc_id)
    tie order), rolled up per source — a calibrated source has mean
    percentile ~0.5; `calib_gap` quantifies how far a per-source
    threshold would drift from a global one. This is the check run
    BEFORE `quality_quartile_mix`-style stratified policies: rank
    normalization is exactly how incomparable per-source score scales
    are made mixable.

    Scale notes (100 TB): the global percent_rank is one total-order
    window — the single intentionally-global sort in the engine's
    corpus-prep family (a sample-based quantile map replaces it at
    extreme scale, same downstream algebra); everything else is
    source-bounded."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_calib_spark())


# ---------------------------------------------------------------------------
# skip-gram PMI co-occurrence (word-association mining)
# ---------------------------------------------------------------------------

#: skip-gram window (offsets 1..2) and minimum pair support — PMI is
#: unstable on singleton pairs (Church & Hanks 1990), so rank only
#: pairs seen at least MINC times.
_PMI_WINDOW = 2
_PMI_MINC = 5
_PMI_TOPK = 30

_PMI_DUCK = f"""
WITH docs0 AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
toks AS (
  SELECT doc_id, i AS pos, tk[i] AS w
  FROM docs0, UNNEST(generate_series(1, len(tk))) AS g(i)
),
pairs AS (
  SELECT w AS w1,
         lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  UNION ALL
  SELECT w,
         lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
  FROM toks
),
pc AS (
  SELECT w1, w2, cast(count(*) AS BIGINT) AS c_ab
  FROM pairs WHERE w2 IS NOT NULL GROUP BY w1, w2
),
uni AS (
  SELECT w, cast(count(*) AS BIGINT) AS c FROM toks GROUP BY w
),
nt AS (SELECT cast(sum(c) AS BIGINT) AS n FROM uni),
tt AS (SELECT cast(sum(c_ab) AS BIGINT) AS t FROM pc),
scored AS (
  SELECT p.w1, p.w2, p.c_ab,
         cast(p.c_ab AS DOUBLE)
           / (cast(u1.c AS DOUBLE) * cast(u2.c AS DOUBLE)) AS assoc,
         cast(round(ln((p.c_ab * 1.0 / tt.t)
                       * (nt.n * 1.0 / u1.c)
                       * (nt.n * 1.0 / u2.c)) * 1000000)
              AS BIGINT) AS pmi_micro
  FROM pc p
  JOIN uni u1 ON u1.w = p.w1
  JOIN uni u2 ON u2.w = p.w2
  CROSS JOIN nt CROSS JOIN tt
  WHERE p.c_ab >= {_PMI_MINC}
)
SELECT w1, w2, c_ab, pmi_micro
FROM scored
ORDER BY assoc DESC, w1, w2
LIMIT {_PMI_TOPK}
"""


@register("token_pmi_topk", _PMI_DUCK, headline=True, tags=("text",))
def token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    # EAGER: the pair stream and the vocabulary aggregate consume this
    # concurrently; lazy re-runs the corpus posexplode per concurrent
    # first-user (the posting-list lesson)
    toks = docs.select(
        "doc_id", F.posexplode("tk").alias("pos", "w")
    ).localCheckpoint(eager=True)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = None
    for off in range(1, _PMI_WINDOW + 1):
        p = toks.select(
            F.col("w").alias("w1"),
            F.lead("w", off).over(wd).alias("w2"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    # distinct-pair table feeds BOTH the total (tt) and the scored
    # join — checkpoint so the corpus-sized pair stream is generated
    # once, not once per reference (memory+disk, bigram-bounded).
    pc = (
        pairs.where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    # vocabulary table is referenced three times (total + both join
    # sides) — checkpoint so the corpus token stream aggregates once.
    uni = (
        toks.groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    nt = uni.agg(F.sum("c").alias("n"))
    tt = pc.agg(F.sum("c_ab").alias("t"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    return (
        pc.where(F.col("c_ab") >= _PMI_MINC)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "c_ab",
            (
                F.col("c_ab").cast("double")
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("assoc"),
            F.round(
                F.log(
                    (F.col("c_ab") * 1.0 / F.col("t"))
                    * (F.col("n") * 1.0 / F.col("ca"))
                    * (F.col("n") * 1.0 / F.col("cb"))
                )
                * 1000000
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("assoc"), "w1", "w2")
        .limit(_PMI_TOPK)
        .select("w1", "w2", "c_ab", "pmi_micro")
    )
token_pmi_topk.__doc__ = """Top-{k} token pairs by pointwise mutual information over a
    +/-{w}-offset skip-gram window (Church & Hanks 1990) — the
    word-association statistic behind collocation mining, phrase
    detection and word2vec's implicit factorization (Levy & Goldberg
    2014: SGNS factorizes the shifted PMI matrix). Pairs need >=
    {mc} occurrences (PMI is degenerate on singletons).

    PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ), reported as INTEGER
    micro-nats for display. The RANKING KEY is NOT the ln: n and t
    are per-query constants, so PMI order equals the order of the
    rational c_ab / (c_a * c_b), computed here as a double from exact
    integer counts using only IEEE correctly-rounded ops (int->double
    convert, one multiply, one divide) — bit-identical on both
    engines, unlike ln (JVM Math.log vs libm can differ in the last
    ulp, which near a 1e-6 rounding midpoint would flip pmi_micro by
    1 and change the top-k cut). Ties on the key break by (w1, w2);
    the ln survives only as the reported pmi_micro value.

    Plan: pair generation is two `lead()` offsets per token (NO
    self-join of positions — the window is fixed, so lateral offsets
    beat an O(window) range join), one group-by collapses the
    corpus-sized pair stream to distinct pairs, and the unigram table
    joins in twice. Scale notes (100 TB): the pair group-by is the
    map-side-combining shuffle (distinct-bigram-bounded, same key its
    census uses); the unigram join is vocabulary-sized (broadcast
    here; at web-corpus vocab it degrades to a shuffle join on the
    SAME w1/w2 keys); the final top-k is TakeOrderedAndProject —
    nothing corpus-sized is ever sorted.""".format(
        k=_PMI_TOPK, w=_PMI_WINDOW, mc=_PMI_MINC
    )


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov length-drift census (source vs rest)
# ---------------------------------------------------------------------------

#: alpha = 0.05 two-sample critical coefficient c(alpha) = 1.358;
#: the flag compares D^2 against c^2 * (n1+n2)/(n1*n2) with c^2
#: embedded as the exact rational 461041/250000 — no runtime sqrt.
_KS_C2_NUM = 461041
_KS_C2_DEN = 250000


def _ks_sql(len_fn: str, split_fn: str, idiv: str) -> str:
    return f"""
WITH lens AS (
  SELECT source, {len_fn}({split_fn}(text, ' ')) AS v FROM documents
),
tot AS (SELECT source, cast(count(*) AS BIGINT) AS n FROM lens
        GROUP BY source),
alln AS (SELECT cast(count(*) AS BIGINT) AS nn FROM lens),
grid AS (SELECT DISTINCT v FROM lens),
cnt AS (SELECT source, v, cast(count(*) AS BIGINT) AS c FROM lens
        GROUP BY source, v),
acnt AS (SELECT v, cast(count(*) AS BIGINT) AS ca FROM lens GROUP BY v),
acum AS (
  SELECT v, cast(sum(ca) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS call
  FROM acnt
),
sg AS (SELECT t.source, t.n, g.v FROM tot t CROSS JOIN grid g),
cum AS (
  SELECT sg.source, sg.n, sg.v,
         cast(sum(coalesce(c.c, 0)) OVER (PARTITION BY sg.source
              ORDER BY sg.v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cs
  FROM sg LEFT JOIN cnt c ON c.source = sg.source AND c.v = sg.v
),
d AS (
  SELECT cum.source, cum.n, alln.nn - cum.n AS nr,
         max(abs(cum.cs * (alln.nn - cum.n)
                 - (ac.call - cum.cs) * cum.n)) AS dnum
  FROM cum JOIN acum ac ON ac.v = cum.v CROSS JOIN alln
  GROUP BY cum.source, cum.n, alln.nn
)
SELECT source,
       n AS n_docs,
       cast((2 * dnum * 10000 + n * nr) {idiv} (2 * n * nr) AS DOUBLE)
         / 10000 AS ks_d,
       (cast({_KS_C2_DEN} AS DOUBLE) * cast(dnum AS DOUBLE)
          * cast(dnum AS DOUBLE)
        > cast({_KS_C2_NUM} AS DOUBLE) * cast(n + nr AS DOUBLE)
          * cast(n AS DOUBLE) * cast(nr AS DOUBLE)) AS drift_flag
FROM d ORDER BY source
"""


@register(
    "ks_length_drift",
    _ks_sql("len", "string_split", "//"),
    tags=("text", "anomaly"),
)
def ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of each source's token-length
    distribution against the REST of the corpus — the SHAPE-drift
    detector beside `unigram_kl_drift`'s content drift (KL sees WHAT
    words shifted; KS sees whether a source's length profile stopped
    looking like everyone else's, the signature of a scraper change
    or truncation bug). D = max_v |F_s(v) - F_rest(v)| with the
    alpha=0.05 significance flag.

    Determinism: the statistic never touches floats until display —
    D's numerator is the exact integer max |c_s*n_r - c_r*n_s| over
    the pooled value grid, the reported D is a half-up 4-dp integer
    ratio, and the significance compare squares the classical
    c(alpha)*sqrt((n1+n2)/(n1*n2)) criterion into the exact rational
    D^2 > c^2(n1+n2)/(n1*n2) with c^2 = 461041/250000 — evaluated in
    doubles built from identical integers by correctly-rounded ops,
    so both engines decide identically and NO runtime sqrt exists.

    Scale notes (100 TB): one scan makes the (source, length) counts;
    the CDF grid is |sources| x |distinct lengths| rows (length is a
    bounded domain in any curated corpus) with per-source window
    cumsums. Integer-range bound: the half-up display division needs
    2 * dnum * 10^4 < 2^63, i.e. n_s * n_rest < ~4.6e14 — past that
    (trillion-doc corpora), report D from the double form directly."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_ks_sql("size", "split", "div"))
