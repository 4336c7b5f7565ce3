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
