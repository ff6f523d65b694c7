"""Cross-validation between independent dedup implementations.

The three near-dup detectors (MinHash-LSH estimate, exact rare-shingle
Jaccard, SimHash Hamming) are independent algorithms over the same
corpus; on the planted near-duplicates they must substantially agree.
This catches algorithmic regressions that oracle parity cannot (oracle
and implementation drifting together)."""

from __future__ import annotations

import pytest

from realtime_event_streaming_spark.registry import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pairs(spark):
    reg = load_all()
    mh = {
        (r.doc_a, r.doc_b)
        for r in reg["dedup_minhash_lsh"].spark_fn(spark, SF).collect()
    }
    ex = {
        (r.doc_a, r.doc_b)
        for r in reg["dedup_ngram_jaccard"].spark_fn(spark, SF).collect()
    }
    sh = {
        (r.doc_a, r.doc_b)
        for r in reg["simhash_near_pairs"].spark_fn(spark, SF).collect()
    }
    return mh, ex, sh


def test_planted_near_dups_found(pairs):
    mh, ex, sh = pairs
    assert len(ex) >= 10, "expected planted near-duplicates in the fixture"
    assert len(mh) >= 10


def test_minhash_agrees_with_exact_jaccard(pairs):
    mh, ex, _ = pairs
    # MinHash at threshold 0.5 over 16 hashes is a noisy estimator of
    # Jaccard >= 0.5: demand high overlap, not equality.
    inter = len(mh & ex)
    assert inter / max(len(ex), 1) >= 0.8, (len(mh), len(ex), inter)
    assert inter / max(len(mh), 1) >= 0.8


def test_cc_merges_planted_chain(spark):
    """The planted a~b~c chain (no direct a~c edge) must collapse to ONE
    component keeping exactly the min id; the 5-chain proves label
    propagation iterates past round 1."""
    from realtime_event_streaming_spark.operators.dedup import (
        CC_PLANTED_BASE as B,
        dedup_survivors_cc,
    )

    comps = {
        r.component_id: (r.csize, r.n_removed)
        for r in dedup_survivors_cc(spark, "/root/testdata/sf0.001").collect()
    }
    assert comps[B + 1] == (3, 2)
    assert comps[B + 11] == (2, 1)
    assert comps[B + 21] == (5, 4)
    assert B + 2 not in comps and B + 22 not in comps


def test_simhash_recalls_exact_jaccard_pairs(pairs):
    _, ex, sh = pairs
    # Direction that is guaranteed: true high-Jaccard pairs differ in
    # ~1 token, so their simhashes must be within the Hamming cutoff
    # (high recall). Precision is corpus-dependent — the fixture's
    # 30-word vocabulary gives unrelated docs correlated bit profiles,
    # so simhash also flags some non-dup pairs; that is inherent to
    # simhash on low-diversity text, not a bug.
    assert sh, "simhash should flag the planted near-identical docs"
    assert len(sh & ex) / max(len(ex), 1) >= 0.8, (len(ex), len(sh & ex))


def test_golden_record_invariants(spark):
    """Structural contracts of the ER output: the canonical member is
    real (its title survives the CASE), source spread never exceeds
    membership, and components are genuinely multi-member."""
    from realtime_event_streaming_spark.registry import load_all

    rows = (
        load_all()["golden_record_entities"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows, "fixture should resolve at least one multi-member entity"
    for r in rows:
        assert r.n_members >= 2
        assert 1 <= r.n_sources <= r.n_members
        assert r.canonical_title is not None and len(r.canonical_title) > 0
