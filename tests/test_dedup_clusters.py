"""D15 dedup_clusters vs a union-find ground truth built from the same
candidate pairs (iterative CC has no SQL oracle)."""

from frolyk_spark.operators.dedup import dedup_clusters, dedup_minhash


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark, sf_dir):
    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash(spark, sf_dir).collect()]
    assert pairs, "expected candidate pairs in the test data"
    truth = _union_find(pairs)
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    assert got == truth
    canon = {r.doc_id for r in dedup_clusters(spark, sf_dir).collect() if r.is_canonical}
    assert canon == {c for c in truth.values()}


def test_persisted_signatures_reused_and_equal(spark, sf_dir):
    """The signature table is written to parquet once per corpus and reread
    on later calls (incremental-pipeline shape): same rows as the computed
    table, and a second call must NOT rewrite the files."""
    import os

    from frolyk_spark.operators.dedup import (
        band_pairs, minhash_signatures, persisted_minhash_signatures,
    )
    from frolyk_spark.sources.streams import SCRATCH

    persisted = persisted_minhash_signatures(spark, sf_dir)
    sig_dirs = [
        os.path.join(SCRATCH, "signatures", d)
        for d in os.listdir(os.path.join(SCRATCH, "signatures"))
    ]
    assert sig_dirs, "signature parquet should exist after first call"
    mtimes = {d: os.path.getmtime(d) for d in sig_dirs}

    again = persisted_minhash_signatures(spark, sf_dir)
    assert {d: os.path.getmtime(d) for d in sig_dirs} == mtimes, "reread must not rewrite"

    computed = minhash_signatures(spark, sf_dir)
    assert sorted(map(tuple, persisted.collect())) == sorted(map(tuple, computed.collect()))
    # pairs derived from the persisted table == pairs from the live pipeline
    assert sorted(map(tuple, band_pairs(again).collect())) == sorted(
        map(tuple, dedup_minhash(spark, sf_dir).collect())
    )


def test_reliable_checkpoint_path(spark, sf_dir, tmp_path):
    """With a checkpoint dir configured (the cluster posture), the
    propagation rounds use reliable checkpoint() instead of executor-local
    blocks — same clustering either way."""
    base = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    try:
        reliable = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    finally:
        # PySpark has no unsetCheckpointDir; point it at a scratch subdir so
        # later tests that rely on the local path still work correctly
        getattr(spark._jsc.sc(), "checkpointDir_$eq")(spark._jvm.scala.Option.empty())
    assert reliable == base
    import os

    assert os.path.isdir(str(tmp_path / "cc_ckpt")) and os.listdir(str(tmp_path / "cc_ckpt"))


def test_minhash_catches_high_jaccard_pairs(spark, sf_dir):
    """Banded LSH must recall essentially all true near-dups: every pair
    with ngram-Jaccard >= 0.9 should appear among minhash candidates
    (b=4 bands of r=3: P(miss | j=0.99) ~ 1e-5)."""
    from frolyk_spark.operators.dedup import dedup_minhash, dedup_ngram_jaccard

    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        if r.jaccard >= 0.9
    }
    cand_pairs = {(r.doc_a, r.doc_b) for r in dedup_minhash(spark, sf_dir).collect()}
    assert true_pairs, "test data should contain planted near-dups"
    missed = true_pairs - cand_pairs
    assert not missed, f"LSH missed high-jaccard pairs: {sorted(missed)[:5]}"
