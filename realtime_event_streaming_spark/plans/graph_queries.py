"""Graph analytics over the click-stream: bounded-iteration PageRank.

The reference's click-stream carries an implicit PAGE GRAPH — each
user's consecutive events are a page transition (the producer simulates
exactly this: referrer chains and per-session page hops,
producer/produce.py:64-125; `event_transition_matrix` already exposes
the event-TYPE Markov matrix). PageRank over that transition graph is
the canonical "which pages matter" signal a content pipeline feeds back
into crawl scheduling and training-data source weighting (the original
use: Page et al. 1999, "The PageRank Citation Ranking").

Spark-first shape — PageRank WITHOUT GraphX/RDDs, as a relational
plan with a fixed number of unrolled iterations:

- the corpus-sized work happens ONCE: a per-user `lag()` window turns
  the event log into hop pairs, and one group-by collapses them to a
  WEIGHTED EDGE LIST bounded by |pages|^2 (the page domain is bounded —
  100 ids here; a real site's URL space still collapses by orders of
  magnitude when aggregated to weighted edges);
- each iteration is then one join + group-by ON THE BOUNDED EDGE LIST
  (rank table keyed by page joins edges on src, contributions group by
  dst) — at 1000-executor scale the rank and node tables BROADCAST and
  no iteration ever reshuffles the raw events;
- iterations are UNROLLED (3 rounds), the same bounded-rounds
  discipline as the k-means / BPE / perceptron families: Catalyst sees
  one static DAG, no driver-side loop over collected state.

Determinism contract (cross-engine value hash): ranks are INTEGERS in
units of 1e-12 of total rank mass. rank_0 = SCALE // N; each round
moves `(r * 85) // (100 * wout) * w` along every edge (integer floor
per SOURCE, then an exact integer multiply by the edge weight and an
order-independent integer sum) plus the teleport term
`(SCALE * 15) // (100 * N)`. Spark `div` and DuckDB `//` agree on the
non-negative dividends used throughout, so both engines iterate
bit-identical rank vectors — no float summation order, no midpoint
rounding, ever. Dangling-node mass (pages with no outgoing hop) is
dropped rather than redistributed — the standard simplification; the
teleport term keeps every node's rank positive. Self-loops (reload of
the same page) are kept: they are real transitions in a click model.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import dialect as D
from ..io import load_table
from ..registry import register

#: total rank mass in fixed-point units; 1e12 keeps integer-floor
#: granularity negligible (~1e-12 of mass per edge) while every
#: intermediate stays far below 2^63: r <= SCALE, so
#: r * 85 <= 8.5e13 and a node's incoming sum <= 0.85 * SCALE.
_PR_SCALE = 10**12
_PR_DAMP_NUM = 85  # damping d = 0.85 as an integer ratio
_PR_DAMP_DEN = 100
_PR_ITERS = 3
_PR_TOPK = 20


def _pagerank_sql(idiv: str) -> str:
    """Full PageRank query; ``idiv`` is 'div' (Spark) or '//' (DuckDB).

    Identical text otherwise, so the two engines run the same plan on
    the same integers — the simhash/classifier-train dialect pattern.
    """
    head = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, {D.PAGE_K_SQL} AS page
  FROM events
),
hops AS (
  SELECT lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src,
         page AS dst
  FROM ev WHERE page IS NOT NULL
),
edges AS (
  SELECT src, dst, cast(count(*) AS BIGINT) AS w
  FROM hops WHERE src IS NOT NULL
  GROUP BY src, dst
),
outdeg AS (
  SELECT src, cast(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
),
eo AS (
  SELECT e.src, e.dst, e.w, o.wout
  FROM edges e JOIN outdeg o ON e.src = o.src
),
nodes AS (
  SELECT DISTINCT page FROM (
    SELECT src AS page FROM edges
    UNION ALL SELECT dst FROM edges) u
),
nn AS (SELECT cast(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT page, cast({_PR_SCALE} {idiv} nn.n AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
)"""
    steps = []
    for t in range(_PR_ITERS):
        steps.append(f""",
c{t} AS (
  SELECT eo.dst AS page,
         cast(sum(((r.r * {_PR_DAMP_NUM})
                   {idiv} ({_PR_DAMP_DEN} * eo.wout)) * eo.w)
              AS BIGINT) AS contrib
  FROM eo JOIN r{t} r ON r.page = eo.src
  GROUP BY eo.dst
),
r{t + 1} AS (
  SELECT n.page,
         cast(({_PR_SCALE} * {_PR_DAMP_DEN - _PR_DAMP_NUM})
                {idiv} ({_PR_DAMP_DEN} * nn.n)
              + coalesce(c.contrib, 0) AS BIGINT) AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN c{t} c ON c.page = n.page
)""")
    tail = f"""
SELECT page, r AS rank_u
FROM r{_PR_ITERS}
ORDER BY rank_u DESC, page
LIMIT {_PR_TOPK}"""
    return head + "".join(steps) + tail


_PAGERANK_DUCK = _pagerank_sql("//")


@register(
    "pagerank_pages", _PAGERANK_DUCK, headline=True, tags=("graph", "behavior")
)
def pagerank_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 pages by PageRank over the per-user page-transition
    graph, 3 unrolled power-iteration rounds in exact fixed-point
    integer arithmetic (rank_u = rank in 1e-12 units of total mass).

    Plan: one corpus-sized window (lag per user — the sessionizer's
    partitioning) + one group-by collapses 100 TB of events into a
    |pages|^2-bounded weighted edge list, which is localCheckpointed
    so the THREE iterations reuse it instead of re-deriving the
    corpus window per join path (the naive CTE-inlined form measured
    44 scans of events; this form scans it ONCE). Every iteration
    joins rank-to-edges on src and re-aggregates by dst on the
    bounded tables only. See the module doc for the determinism
    contract and the dangling-mass/self-loop conventions."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.expr(D.PAGE_K_SQL).alias("page")
    ).where(F.col("page").isNotNull())
    wd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        F.lag("page").over(wd).alias("src"), F.col("page").alias("dst")
    )
    edges = (
        hops.where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
        # bounded (<= |pages|^2 rows) and EAGER: outdeg, the node set
        # and every iteration's join consume this, and several of
        # those are submitted as concurrent AQE stage jobs — a lazy
        # checkpoint re-runs the corpus-sized window once per
        # concurrent first-user (the dedup posting-list lesson);
        # eager runs it exactly once
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(
        F.sum("w").cast("bigint").alias("wout")
    )
    eo = edges.join(outdeg, "src")
    nodes = (
        edges.select(F.col("src").alias("page"))
        .unionAll(edges.select(F.col("dst").alias("page")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "page", F.expr(f"cast({_PR_SCALE} div n AS BIGINT)").alias("r")
    )
    teleport = F.expr(
        f"cast(({_PR_SCALE} * {_PR_DAMP_DEN - _PR_DAMP_NUM}) "
        f"div ({_PR_DAMP_DEN} * n) AS BIGINT)"
    )
    for _ in range(_PR_ITERS):
        contrib = (
            eo.join(
                F.broadcast(r.select(F.col("page").alias("src"), "r")),
                "src",
            )
            .groupBy(F.col("dst").alias("page"))
            .agg(
                F.sum(
                    F.expr(
                        f"((r * {_PR_DAMP_NUM}) "
                        f"div ({_PR_DAMP_DEN} * wout)) * w"
                    )
                )
                .cast("bigint")
                .alias("contrib")
            )
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(F.broadcast(contrib), "page", "left")
            .select(
                "page",
                (teleport + F.coalesce("contrib", F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
        )
    return (
        r.select("page", F.col("r").alias("rank_u"))
        .orderBy(F.desc("rank_u"), "page")
        .limit(_PR_TOPK)
    )


# ---------------------------------------------------------------------------
# triangle census / clustering coefficient of the co-visit kNN graph
# ---------------------------------------------------------------------------

#: neighbors kept per node in the similarity graph. The RAW co-visit
#: graph is COMPLETE on this fixture (uniform visiting makes every
#: page pair share visitors at every SF), so a support threshold
#: either kills it or keeps all of it — the mutual-kNN sparsification
#: is the standard similarity-graph construction that stays bounded
#: AND informative at any scale/density.
_TRI_KNN = 5


def _tri_sql(idiv: str) -> str:
    return f"""
WITH baskets AS (
  SELECT DISTINCT user_id, {D.PAGE_K_SQL} AS page FROM events
  WHERE {D.PAGE_K_SQL} IS NOT NULL
),
pairs AS (
  SELECT a.page AS pa, b.page AS pb, cast(count(*) AS BIGINT) AS c
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.page < b.page
  GROUP BY a.page, b.page
),
dirs AS (
  SELECT pa AS u, pb AS v, c FROM pairs
  UNION ALL
  SELECT pb AS u, pa AS v, c FROM pairs
),
knn AS (
  SELECT u, v FROM (
    SELECT u, v,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, v) AS rn
    FROM dirs
  ) ranked WHERE rn <= {_TRI_KNN}
),
mutual AS (
  SELECT a.u AS pa, a.v AS pb
  FROM knn a JOIN knn b ON b.u = a.v AND b.v = a.u
  WHERE a.u < a.v
),
nodes AS (
  SELECT page, cast(count(*) AS BIGINT) AS deg FROM (
    SELECT pa AS page FROM mutual UNION ALL SELECT pb FROM mutual
  ) np GROUP BY page
),
tri AS (
  SELECT cast(count(*) AS BIGINT) AS n_tri
  FROM mutual e1
  JOIN mutual e2 ON e2.pa = e1.pb
  JOIN mutual e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
wed AS (
  SELECT cast(sum(deg * (deg - 1)) AS BIGINT) {idiv} 2 AS n_wedges,
         cast(count(*) AS BIGINT) AS n_nodes
  FROM nodes
),
ecnt AS (SELECT cast(count(*) AS BIGINT) AS n_edges FROM mutual)
SELECT wed.n_nodes,
       ecnt.n_edges,
       tri.n_tri AS n_triangles,
       wed.n_wedges,
       CASE WHEN wed.n_wedges = 0 THEN 0.0
            ELSE cast((2 * 3 * tri.n_tri * 10000 + wed.n_wedges)
                      {idiv} (2 * wed.n_wedges) AS DOUBLE) / 10000 END
         AS global_clustering
FROM tri CROSS JOIN wed CROSS JOIN ecnt
"""


@register("covisit_triangle_census", _tri_sql("//"), tags=("behavior", "graph"))
def covisit_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import register_views

    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_tri_sql("div"))
covisit_triangle_census.__doc__ = """Triangle census + global clustering coefficient of the
    MUTUAL-kNN co-visit graph (each page keeps its {k} strongest
    co-visit neighbors, deterministic (count DESC, page) order; an
    edge survives only if BOTH endpoints keep it): C = 3*triangles /
    wedges — the transitivity number separating hub-and-spoke
    navigation (C ~ 0) from densely cross-linked content clusters.
    Complements `pagerank_pages` (importance) with STRUCTURE. The
    kNN sparsification is the standard similarity-graph construction:
    the RAW co-visit graph is complete on uniform traffic, where a
    support threshold is all-or-nothing; mutual-kNN stays bounded
    and informative at any density.

    Scale notes (100 TB): one user_id shuffle builds baskets, one
    page-pair group-by builds the weighted pair list, the per-node
    top-k is a bounded window — after which degree <= {k} BY
    CONSTRUCTION, so wedges <= |pages|*k^2/2 and the triangle join
    runs on an O(|pages|*k) edge list, broadcast everywhere. Counts
    exact; the coefficient is a half-up integer 4-dp ratio.""".format(
        k=_TRI_KNN
    )
