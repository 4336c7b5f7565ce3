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
