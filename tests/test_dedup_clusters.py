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


def test_giant_bucket_guard_star_routes(spark):
    """LSH giant-bucket guard (VERDICT r6 #2): a mega-bucket (1k docs with
    identical signatures — a boilerplate flood) must NOT expand to the
    ~500k quadratic pairs; it star-routes to n-1 pairs anchored at the min
    doc_id, while preserving full bucket connectivity. Small buckets keep
    the exact quadratic expansion."""
    from frolyk_spark.operators.dedup import (
        LSH_BUCKET_CAP, _pairs_from_bands, oversize_band_buckets,
    )

    n = 1200
    assert n > LSH_BUCKET_CAP
    mega = spark.range(n).selectExpr(
        "id as doc_id", "0 as band_id", "42 as band_hash"
    )
    small = spark.range(5).selectExpr(
        "id + 10000 as doc_id", "1 as band_id", "7 as band_hash"
    )
    bands = mega.unionByName(small)

    pairs = _pairs_from_bands(bands).collect()
    mega_pairs = {(r.doc_a, r.doc_b) for r in pairs if r.doc_b < 10000}
    small_pairs = {(r.doc_a, r.doc_b) for r in pairs if r.doc_b >= 10000}
    # star: exactly n-1 pairs, all anchored at doc 0, spanning the bucket
    assert mega_pairs == {(0, i) for i in range(1, n)}
    # quadratic path untouched below the cap: all 10 sorted pairs
    assert small_pairs == {
        (10000 + a, 10000 + b) for a in range(5) for b in range(a + 1, 5)
    }
    # the report frame names exactly the routed bucket
    report = oversize_band_buckets(bands).collect()
    assert [(r.band_id, r.band_hash, r.n_docs) for r in report] == [(0, 42, n)]


def test_giant_bucket_guard_cap_boundary(spark):
    """A bucket of exactly `cap` docs still takes the exact path."""
    from frolyk_spark.operators.dedup import _pairs_from_bands

    cap = 16
    bands = spark.range(cap).selectExpr(
        "id as doc_id", "0 as band_id", "1 as band_hash"
    )
    got = {(r.doc_a, r.doc_b) for r in _pairs_from_bands(bands, cap=cap).collect()}
    assert got == {(a, b) for a in range(cap) for b in range(a + 1, cap)}


def test_star_routing_oracle_parity(spark):
    """The DuckDB oracle mirrors the giant-bucket star-routing (VERDICT r7
    #2): on a corpus with a planted >cap bucket, Spark's _pairs_from_bands
    and the _dedup_minhash_sql oracle must produce the IDENTICAL pair set —
    end-to-end through shingling, signatures, banding, and the cap — so
    parity no longer depends on test corpora never hitting the cap."""
    import duckdb
    import pandas as pd

    from frolyk_spark.operators.dedup import (
        _dedup_minhash_sql, _pairs_from_bands, band_hashes,
        minhash_signatures_frame,
    )

    cap = 4
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
        "one two three four five six seven eight nine ten eleven twelve",
        "red orange yellow green blue indigo violet pink brown black white",
    ]
    rows = [(i, boiler) for i in range(10)] + [
        (100 + i, t) for i, t in enumerate(uniq)
    ] + [(200, uniq[0])]  # one exact twin in a small (<=cap) bucket
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    docs = spark.createDataFrame(pdf)
    sigs = minhash_signatures_frame(docs)
    got = {
        (r.doc_a, r.doc_b)
        for r in _pairs_from_bands(band_hashes(sigs), cap=cap).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    want = {tuple(r) for r in con.sql(_dedup_minhash_sql(cap=cap)).fetchall()}
    con.close()

    # the planted bucket must actually exceed the cap for this to test the
    # star path, and the small twin bucket must take the quadratic path
    assert {(0, i) for i in range(1, 10)} <= got
    assert (100, 200) in got
    assert (1, 2) not in got, "star path should have pruned non-anchor pairs"
    assert got == want


def test_contrastive_pairs_triplet_invariants(spark, sf_dir):
    """D76: each triplet's negative differs from both the anchor and the
    paired positive, (anchor, positive) is exactly the minhash candidate
    pair set, and the agreement count stays within the signature width."""
    from frolyk_spark.operators.dedup import (
        MINHASH_K,
        band_pairs,
        contrastive_pairs,
        persisted_minhash_signatures,
    )

    rows = contrastive_pairs(spark, sf_dir).collect()
    assert rows
    want_pairs = {
        (r.doc_a, r.doc_b)
        for r in band_pairs(persisted_minhash_signatures(spark, sf_dir)).collect()
    }
    got_pairs = {(r.anchor_doc, r.positive_doc) for r in rows}
    # every emitted triplet is a real candidate pair; pairs may only drop
    # through the documented 1-doc-bucket degeneracy (none at these SFs)
    assert got_pairs == want_pairs
    for r in rows:
        assert r.negative_doc not in (r.anchor_doc, r.positive_doc)
        assert 0 <= r.n_agree <= MINHASH_K


def test_dedup_eval_confusion_identities(spark, sf_dir):
    """D85: the confusion row's counts must satisfy the partition
    identities exactly (tp+fp = candidates, tp+fn = truth) and agree with
    the two source operators counted independently."""
    from frolyk_spark.operators.dedup import (
        band_pairs,
        dedup_eval,
        dedup_ngram_jaccard,
        persisted_minhash_signatures,
    )

    row = dedup_eval(spark, sf_dir).collect()[0]
    assert row.tp + row.fp == row.n_candidates
    assert row.tp + row.fn == row.n_true
    cand = {
        (r.doc_a, r.doc_b)
        for r in band_pairs(persisted_minhash_signatures(spark, sf_dir)).collect()
    }
    truth = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert row.n_candidates == len(cand) and row.n_true == len(truth)
    assert row.tp == len(cand & truth)
    # the corpus's planted near-dups make the audit non-degenerate
    assert row.n_true > 0 and row.tp > 0


def test_lsh_band_sweep_precision_recall_identities(spark, sf_dir):
    """D46 (extended, r14): every (b,r) row must satisfy the partition
    identities exactly (tp+fp = n_pairs, tp+fn = n_true), n_true is one
    config-independent constant, and the shipped-config row (b=MINHASH_B)
    reproduces D85's confusion counts — the tuning table and the shipped
    audit cannot disagree about the operating point."""
    from frolyk_spark.operators.dedup import (
        MINHASH_B,
        dedup_eval,
        lsh_band_sweep,
    )

    rows = lsh_band_sweep(spark, sf_dir).collect()
    assert rows
    n_trues = {r.n_true for r in rows}
    assert len(n_trues) == 1 and n_trues.pop() > 0
    for r in rows:
        assert r.tp + r.fp == r.n_pairs
        assert r.tp + r.fn == r.n_true
        assert r.tp >= 0 and r.fp >= 0 and r.fn >= 0
    shipped = {r.bands: r for r in rows}[MINHASH_B]
    audit = dedup_eval(spark, sf_dir).collect()[0]
    assert (shipped.n_pairs, shipped.tp, shipped.fp, shipped.fn) == (
        audit.n_candidates, audit.tp, audit.fp, audit.fn
    )
    # NOTE: tp is NOT asserted monotone in the band count — band
    # boundaries don't nest between b=3 and b=4 (a pair agreeing exactly
    # on signature rows 4-7 is a b=3 candidate but no b=4 band is a
    # subset of rows 4-7), and the star-routing cap can drop pairs from
    # oversized buckets; only the partition identities are guaranteed.
