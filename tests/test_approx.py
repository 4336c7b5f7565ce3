"""C14 approx_stats: sketch answers bounded against exact ones (no SQL
oracle by design — approximation is engine-specific)."""

from pyspark.sql import functions as F

from frolyk_spark.operators.relational import approx_stats
from frolyk_spark.sources.catalog import load_table


def test_approx_stats_within_tolerance(spark, sf_dir):
    row = approx_stats(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("nd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.n_orders == exact.n
    assert abs(row.approx_custkeys - exact.nd) / exact.nd < 0.05
    # percentile_approx picks an actual data point near the quantile
    assert abs(row.p50_totalprice - exact.p50) / exact.p50 < 0.02
    assert abs(row.p95_totalprice - exact.p95) / exact.p95 < 0.02


def test_sketch_profile_bounds_and_mergeability(spark, sf_dir):
    """D45: sketched heavy hitters and HLL distinct estimates stay near
    the exact answers, and per-source HLL sketches UNION to (nearly) the
    corpus estimate — the mergeability that makes the sketch the
    keep-per-shard profile at scale."""
    from pyspark.sql import functions as F

    from frolyk_spark.operators.vocab import sketch_profile
    from frolyk_spark.sources.catalog import load_table

    prof = sketch_profile(spark, sf_dir).collect()
    assert len(prof) > 0

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    exact = {
        r.word: r.c
        for r in words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_exact = len(exact)

    for row in prof:
        true_c = exact[row.word]
        assert abs(row.est_count - true_c) <= max(2, 0.05 * true_c), (
            row.word, row.est_count, true_c,
        )
        assert abs(row.distinct_words_est - n_exact) <= 0.05 * n_exact

    # mergeability: per-source sketches -> union == corpus-level estimate
    per_source = words.groupBy("source").agg(
        F.expr("hll_sketch_agg(word)").alias("sk")
    )
    merged = per_source.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0].est
    corpus = words.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(word))").alias("est")
    ).collect()[0].est
    assert abs(merged - corpus) <= max(2, 0.02 * corpus), (merged, corpus)


def test_sketch_kmv_registers_merge_and_estimate(spark, sf_dir):
    """KMV companion (D45): per-source register sets union+re-limit to
    exactly the corpus registers (mergeability is set-exact for KMV, not
    approximate like HLL), and the classic (k-1)*R/h_k estimator lands
    within the ~1/sqrt(k) relative-error band of the true distinct count."""
    from frolyk_spark.functions.hashing import portable_hash_expr
    from frolyk_spark.operators.sampling import load_table
    from frolyk_spark.operators.vocab import KMV_K, sketch_kmv

    regs = sketch_kmv(spark, sf_dir).collect()
    assert [r.rank for r in regs] == list(range(1, KMV_K + 1))
    assert all(a.register <= b.register for a, b in zip(regs, regs[1:]))

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    h = portable_hash_expr(F.col("word"))

    # mergeability: distinct (word, h) per source, union, global re-limit
    per_source = (
        words.select("source", "word", h.alias("h")).distinct()
        .select("word", "h").distinct()  # union of the per-source registers
        .orderBy("h", "word").limit(KMV_K).collect()
    )
    assert [(r.h, r.word) for r in per_source] == [
        (r.register, r.word) for r in regs
    ]

    # estimator: (k-1) * 2^60 / h_k within 3/sqrt(k) of the truth
    n_exact = words.select("word").distinct().count()
    est = (KMV_K - 1) * float(1 << 60) / float(regs[-1].register)
    assert abs(est - n_exact) <= 3.0 / (KMV_K ** 0.5) * n_exact, (est, n_exact)
