"""Shuffle-health diagnostics: join-key skew census.

At 100 TB the thing that kills a shuffle join is not size but SKEW —
one hot key serializing a single reducer while 999 executors idle.
The standard mitigations (AQE skew-join splitting, salting — this
repo's ``functions/skew.salted_join``) need a NUMBER: how hot is the
hottest key relative to the typical one, and how many salt shards
flatten it. This query computes that number from the data, the way a
pipeline operator would before choosing a join strategy.

Output: the top heavy keys with their share of all rows, plus the
global skew profile — p99 per-key count, max/avg skew factor, and the
recommended salt fan-out ``ceil(max_cnt / p99_cnt)`` (shards needed so
the hottest key's shard is no larger than a p99 key). Single scan +
per-key agg; the stats row is a broadcast 1-row cross join (the same
pattern as source_mix_weights). Exact interpolated percentile on both
engines (Spark ``percentile`` == DuckDB ``quantile_cont``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

_TOPK = 10

_SKEW_DUCK = f"""
WITH per_key AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
stats AS (
  SELECT count(*) AS n_keys,
         sum(cnt) AS n_rows,
         max(cnt) AS max_cnt,
         quantile_cont(cnt, 0.99) AS p99_cnt,
         avg(cnt) AS avg_cnt
  FROM per_key
)
SELECT k.user_id, k.cnt,
       round(cast(k.cnt AS DOUBLE) / s.n_rows, 4) AS share,
       s.n_keys,
       round(s.p99_cnt, 4) AS p99_cnt,
       round(s.max_cnt / s.avg_cnt, 4) AS skew_factor,
       cast(ceil(s.max_cnt / s.p99_cnt) AS BIGINT) AS recommended_salt
FROM per_key k, stats s
ORDER BY k.cnt DESC, k.user_id LIMIT {_TOPK}
"""


@register("join_skew_diagnostics", _SKEW_DUCK, tags=("diagnostics",))
def join_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    stats = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("_p99"),
        F.avg("cnt").alias("_avg"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_rows"), 4).alias(
                "share"
            ),
            "n_keys",
            F.round(F.col("_p99"), 4).alias("p99_cnt"),
            F.round(F.col("max_cnt") / F.col("_avg"), 4).alias("skew_factor"),
            F.ceil(F.col("max_cnt") / F.col("_p99"))
            .cast("bigint")
            .alias("recommended_salt"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_TOPK)
    )
join_skew_diagnostics.__doc__ = """Top-{_TOPK} heaviest join keys + global skew profile for the
    events->user enrichment join key. recommended_salt is the fan-out
    ``functions/skew.salted_join`` should use so the hottest key's
    largest shard shrinks to a p99-typical reducer input.""".format(_TOPK=_TOPK)


# ---------------------------------------------------------------------------
# salted join, proven end-to-end against the plain-join oracle
# ---------------------------------------------------------------------------

_SALT = 8

_SALTED_DUCK = """
WITH dim AS (
  SELECT DISTINCT user_id, user_id % 5 AS tier FROM events
)
SELECT d.tier,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 4) AS total_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.tier ORDER BY d.tier
"""


@register("salted_user_enrich", _SALTED_DUCK, tags=("diagnostics",))
def salted_user_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.col("user_id") % 5)
    )
    joined = salted_join(ev, dim, "user_id", salt=_SALT)
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("tier")
    )
salted_user_enrich.__doc__ = """Fact->dimension enrichment executed through ``skew.salted_join``
    (left side salted {_SALT} ways, dimension replicated), aggregated
    per tier. The DuckDB oracle runs the PLAIN join — so the driver's
    value-hash compare proves salting is result-invariant, end-to-end,
    on real data (complementing the plan-level equivalence test in
    test_plan_properties.py). This is the mitigation
    ``join_skew_diagnostics`` sizes: when AQE can't split a hot key
    (broadcast-ineligible dim), scatter it across {_SALT} reducers.""".format(_SALT=_SALT)


# ---------------------------------------------------------------------------
# manual runtime bloom filter: broadcast-bitset semi-join pruning
# ---------------------------------------------------------------------------

#: bloom geometry: BF_WORDS words each holding 32 usable bits in a
#: BIGINT (mask = 1 << (pos % 32) — shifts stay <= 31 because DuckDB
#: overflow-checks `1::BIGINT << 63`, and 32-bit masks are portable),
#: BF_K derived hash functions via the same Kirsch-Mitzenmacher mix the
#: MinHash family uses (one md5 per key).
BF_WORDS = 512
BF_BITS = BF_WORDS * 32
BF_K = 2
#: dim predicate: "high-value customers" — the selective build side a
#: runtime filter exists for.
BF_ACCTBAL = 9000

_BLOOM_DUCK = f"""
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {BF_ACCTBAL}
),
dk AS (
  SELECT c_custkey,
         ('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::BIGINT AS ha,
         ('0x' || substr(md5(c_custkey::VARCHAR), 8, 7))::BIGINT AS hb
  FROM dim
),
bloom AS (
  SELECT ((ha + j * hb) % {BF_BITS}) // 32 AS word,
         bit_or(1::BIGINT << (((ha + j * hb) % {BF_BITS}) % 32)) AS bits
  FROM dk, UNNEST(generate_series(0, {BF_K - 1})) AS s(j)
  GROUP BY 1
),
ok_orders AS (
  SELECT o_orderkey FROM (
    SELECT o.o_orderkey, count(*) AS hits
    FROM (
      SELECT o_orderkey,
             ('0x' || substr(md5(o_custkey::VARCHAR), 1, 7))::BIGINT AS ha,
             ('0x' || substr(md5(o_custkey::VARCHAR), 8, 7))::BIGINT AS hb
      FROM orders
    ) o, UNNEST(generate_series(0, {BF_K - 1})) AS s(j)
    JOIN bloom b ON b.word = ((o.ha + j * o.hb) % {BF_BITS}) // 32
    WHERE (b.bits & (1::BIGINT << (((o.ha + j * o.hb) % {BF_BITS}) % 32))) != 0
    GROUP BY o.o_orderkey
  ) WHERE hits = {BF_K}
),
exact_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM dim)
)
SELECT o.o_orderpriority,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(count(k.o_orderkey) AS BIGINT) AS bloom_candidates,
       cast(count(e.o_orderkey) AS BIGINT) AS exact_matches,
       cast(count(k.o_orderkey) - count(e.o_orderkey) AS BIGINT)
         AS false_positives
FROM orders o
LEFT JOIN ok_orders k ON o.o_orderkey = k.o_orderkey
LEFT JOIN exact_orders e ON o.o_orderkey = e.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("bloom_prefilter_join", _BLOOM_DUCK, tags=("diagnostics",))
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > BF_ACCTBAL
    )
    dim = cust.select("c_custkey")

    def km(col):
        ha = F.expr(
            f"cast(conv(substr(md5(cast({col} as string)), 1, 7), 16, 10) "
            "as bigint)"
        )
        hb = F.expr(
            f"cast(conv(substr(md5(cast({col} as string)), 8, 7), 16, 10) "
            "as bigint)"
        )
        return ha.alias("ha"), hb.alias("hb")

    # F.shiftleft takes a literal bit count; the data-dependent shift
    # needs the SQL form (same expression the oracle states)
    word = F.expr(f"((ha + j * hb) % {BF_BITS}) div 32")
    mask = F.expr(
        f"shiftleft(cast(1 as bigint), "
        f"cast(((ha + j * hb) % {BF_BITS}) % 32 as int))"
    )

    bloom = (
        dim.select(*km("c_custkey"))
        .select("ha", "hb", F.explode(F.expr(f"sequence(0, {BF_K - 1})")).alias("j"))
        .select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    probes = (
        orders.select("o_orderkey", *km("o_custkey"))
        .select(
            "o_orderkey",
            "ha",
            "hb",
            F.explode(F.expr(f"sequence(0, {BF_K - 1})")).alias("j"),
        )
        .select("o_orderkey", word.alias("word"), mask.alias("mask"))
    )
    ok = (
        probes.join(F.broadcast(bloom), "word")
        .where(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("hits"))
        .where(F.col("hits") == BF_K)
        .select(F.col("o_orderkey").alias("k_orderkey"))
    )
    exact = (
        orders.join(
            F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .select(F.col("o_orderkey").alias("e_orderkey"))
    )
    return (
        orders.join(ok, F.col("o_orderkey") == F.col("k_orderkey"), "left")
        .join(exact, F.col("o_orderkey") == F.col("e_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.count("k_orderkey").cast("bigint").alias("bloom_candidates"),
            F.count("e_orderkey").cast("bigint").alias("exact_matches"),
            (F.count("k_orderkey") - F.count("e_orderkey"))
            .cast("bigint")
            .alias("false_positives"),
        )
        .orderBy("o_orderpriority")
    )
bloom_prefilter_join.__doc__ = """Manual runtime bloom filter — the broadcast-bitset pruning a
    1000-executor join wants when the build side is selective but the
    probe side is the 100 TB fact: instead of shuffling every fact row
    to discover most match nothing, a {BF_BITS}-bit bloom of the dim
    keys ({BF_WORDS} BIGINT words, {BF_K} derived hashes from one md5
    per key) broadcasts in ~4 KB and prunes map-side. The census
    reports, per order priority, how many fact rows the bloom admits
    vs the exact semi-join, and the false-positive overhead — the
    number you check before trusting a runtime filter (Spark's own
    `spark.sql.optimizer.runtime.bloomFilter` injects the same shape
    automatically; this makes the mechanics visible and oracle-pinned,
    FP count included, since both engines build bit-identical words).

    Plan shape: dim scan -> <= {BF_WORDS}-row bitset agg (broadcast);
    fact rows explode {BF_K} probe positions, hash-join the broadcast
    words, pass when all {BF_K} bits hit. No shuffle of the fact
    beyond its own group-by; the exact side is a broadcast semi-join
    on the same scan for the comparison column.""".format(BF_BITS=BF_BITS, BF_WORDS=BF_WORDS, BF_K=BF_K)
