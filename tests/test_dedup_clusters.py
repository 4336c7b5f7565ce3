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
