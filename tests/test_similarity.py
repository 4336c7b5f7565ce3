"""ANN-specific checks (SURVEY §2 D10-D11).

ann_bruteforce / embedding_stats are oracle-checked in test_correctness;
ann_lsh is approximate so its gate is recall against the exact baseline.
"""

from frolyk_spark.operators.similarity import TOP_K, ann_bruteforce, ann_ivf, ann_lsh


def _pairs(df):
    return {(r.probe_id, r.neighbor_id) for r in df.collect()}


def test_ann_lsh_recall(spark, sf_dir):
    exact = _pairs(ann_bruteforce(spark, sf_dir))
    approx = _pairs(ann_lsh(spark, sf_dir))
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall {recall:.2f} < 0.6"


def test_ann_ivf_recall(spark, sf_dir):
    exact = _pairs(ann_bruteforce(spark, sf_dir))
    approx = _pairs(ann_ivf(spark, sf_dir))
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} < 0.5"


def test_ann_lsh_shape(spark, sf_dir):
    rows = ann_lsh(spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, group in by_probe.items():
        assert len(group) <= TOP_K
        ranks = sorted(r.rank for r in group)
        assert ranks == list(range(1, len(group) + 1))
        cos_by_rank = [r.cos_sim for r in sorted(group, key=lambda r: r.rank)]
        assert cos_by_rank == sorted(cos_by_rank, reverse=True)


def test_ann_pq_recall(spark, sf_dir):
    from frolyk_spark.operators.similarity import ann_bruteforce, ann_pq

    exact = _pairs(ann_bruteforce(spark, sf_dir))
    approx = _pairs(ann_pq(spark, sf_dir))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"PQ recall {recall:.2f} < 0.7"


def test_ann_pq_deterministic(spark, sf_dir):
    """Codebook training and ADC ranking are RNG-free: two runs agree."""
    from frolyk_spark.operators.similarity import ann_pq

    a = {tuple(r) for r in ann_pq(spark, sf_dir).collect()}
    b = {tuple(r) for r in ann_pq(spark, sf_dir).collect()}
    assert a == b
