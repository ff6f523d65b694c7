"""Property-based tests (hypothesis) for the engine's pure math.

Parity tests pin implementations to oracles on fixed fixtures; these
pin the *algorithms* on arbitrary inputs."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_event_streaming_spark.operators.anomaly import (
    MIN_OBSERVATIONS,
    WelfordState,
)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite_floats, min_size=2, max_size=200))
@settings(max_examples=200, deadline=None)
def test_welford_matches_two_pass(xs):
    ws = WelfordState()
    for x in xs:
        ws.update(x)
    assert ws.n == len(xs)
    assert math.isclose(ws.mean, float(np.mean(xs)), rel_tol=1e-9, abs_tol=1e-6)
    assert math.isclose(
        ws.variance, float(np.var(xs, ddof=1)), rel_tol=1e-6, abs_tol=1e-6
    )
    assert ws.variance >= 0.0


@given(st.lists(finite_floats, min_size=MIN_OBSERVATIONS, max_size=50), finite_floats)
@settings(max_examples=200, deadline=None)
def test_score_is_symmetric_and_gated(xs, probe):
    ws = WelfordState()
    for x in xs:
        ws.update(x)
    is_anom, z, reason = ws.score(probe)
    if ws.stddev <= 0.0:
        assert not is_anom and reason == "zero-variance"
    else:
        # z is the standard score; anomaly iff |z| > threshold
        expect_z = (probe - ws.mean) / ws.stddev
        assert math.isclose(z, expect_z, rel_tol=1e-9, abs_tol=1e-9)
        assert is_anom == (abs(z) > 2.5)


@given(st.lists(finite_floats, min_size=0, max_size=MIN_OBSERVATIONS - 1), finite_floats)
@settings(max_examples=50, deadline=None)
def test_never_flags_without_history(xs, probe):
    ws = WelfordState()
    for x in xs:
        ws.update(x)
    is_anom, _, reason = ws.score(probe)
    assert not is_anom and reason == "insufficient-history"


@given(
    st.lists(st.text(alphabet="ab ", min_size=1, max_size=60), min_size=1, max_size=20)
)
@settings(max_examples=50, deadline=None)
def test_minhash_estimator_bounds(texts):
    """Pure-python mirror of the engine's MinHash definition: estimates
    must be in [0,1], exact duplicates estimate 1.0, disjoint shingle
    sets estimate 0.0."""
    import hashlib

    def shingle_set(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    def sig(ss):
        return [
            min(
                (hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:16] for s in ss),
                default=None,
            )
            for seed in range(16)
        ]

    sets = [shingle_set(t) for t in texts if shingle_set(t)]
    for a in sets[:5]:
        for b in sets[:5]:
            sa, sb = sig(a), sig(b)
            est = sum(x == y for x, y in zip(sa, sb)) / 16
            assert 0.0 <= est <= 1.0
            if a == b:
                assert est == 1.0
            if not (a & b) and a and b:
                # disjoint sets agree on a hash only via md5 prefix
                # collision — astronomically unlikely at this size
                assert est == 0.0


def test_bpe_run_round_merges_floor_half_per_run(spark):
    """Run-length greedy semantics (byte-level BPE): in
    'a a a a b a a' the winning pair (a,a) has 4 overlapping
    occurrences but applies only 3 merges — floor(4/2)=2 in the first
    run, floor(2/2)=1 in the second — yielding 'a+a a+a b a+a'."""
    import pyspark.sql.functions as F

    from realtime_event_streaming_spark.operators.corpusprep import (
        _bpe_run_round,
    )

    toks = spark.createDataFrame(
        [(1, i + 1, t) for i, t in enumerate("a a a a b a a".split())],
        "doc_id long, pos long, t string",
    )
    top, keep, merged = _bpe_run_round(toks)
    trow = top.collect()[0]
    assert (trow.a, trow.b, trow.cnt) == ("a", "a", 4)
    n_merges = keep.where("head").count()
    assert n_merges == 3
    out = [r.t for r in merged.orderBy("pos").collect()]
    assert out == ["a+a", "a+a", "b", "a+a"]


def test_pca_topk_basis_properties(spark):
    """Deflation must produce an orthonormal basis: every component
    unit-norm and pairwise dots ~0 at the engine's rounding — the
    structural point of top-k PCA beyond the single direction."""
    from realtime_event_streaming_spark.operators.similarity import (
        PCA_TOPK,
        pca_topk_components,
    )

    rows = pca_topk_components(spark, "/root/testdata/sf0.001").collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r.component, {})[r.dim] = r.loading
    assert sorted(by_c) == list(range(1, PCA_TOPK + 1))
    vecs = {c: [d[i] for i in sorted(d)] for c, d in by_c.items()}
    for c, v in vecs.items():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3, (c, "norm")
    for a in vecs:
        for b in vecs:
            if a < b:
                dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
                assert abs(dot) < 1e-3, (a, b, dot)


def test_repeated_substring_span_arithmetic(spark, tmp_path):
    """A planted 12-token verbatim repeat shared by two docs (all
    other tokens globally unique) must certify span = 12 exactly:
    12 - SPAN_W + 1 = 7 consecutive duplicated windows -> run 7 ->
    7 + SPAN_W - 1 = 12. Docs without the repeat contribute nothing."""
    from realtime_event_streaming_spark.operators.dedup import (
        SPAN_W,
        repeated_substring_census,
    )

    assert SPAN_W == 6
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, f"a0 a1 a2 {shared} a3 a4", "en", "planted", 0),
        (2, f"b0 {shared} b1 b2 b3 b4", "en", "planted", 0),
        (3, " ".join(f"c{i}" for i in range(20)), "en", "planted", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.source: r for r in repeated_substring_census(spark, d).collect()}
    r = out["planted"]
    assert r.max_span_tokens == 12
    assert r.docs_with_dup == 2
    assert r.dup_windows == 14  # 7 windows in each of the two docs
    assert r.avg_span_tokens == 12.0


def test_histogram_quantile_rank_tightness(spark):
    """The binned quantile must be rank-correct and one-bin tight:
    at least ceil(q*n) values sit at or below the estimate, and
    strictly fewer sit below the previous bin edge — the histogram
    sketch's whole accuracy guarantee."""
    import math

    import pyspark.sql.functions as F

    from realtime_event_streaming_spark.io import load_table
    from realtime_event_streaming_spark.operators.sketches import (
        HQ_BIN,
        histogram_quantile_rollup,
    )

    sf = "/root/testdata/sf0.001"
    est = {
        r.event_type: r for r in histogram_quantile_rollup(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events").select("event_type", "value")
    for et, r in est.items():
        vals = [
            x.value for x in ev.where(F.col("event_type") == et).collect()
        ]
        for q, e in ((0.5, r.p50_est), (0.95, r.p95_est), (0.99, r.p99_est)):
            need = math.ceil(q * r.n)
            assert sum(v <= e for v in vals) >= need, (et, q)
            assert sum(v <= e - HQ_BIN for v in vals) < need, (et, q)
