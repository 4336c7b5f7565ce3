"""Governance block (C68/D75): structural invariants beyond the oracle
parity test_correctness already runs."""

from frolyk_spark.operators.governance import (
    K_MIN,
    corpus_card,
    k_anonymity_audit,
)
from frolyk_spark.sources.catalog import load_table


def test_k_anonymity_bands_partition_the_corpus(spark, sf_dir):
    rows = {r.k_band: r for r in k_anonymity_audit(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows.values()) == total
    for band, r in rows.items():
        # violates_policy must be derivable from the band itself
        lo = int(band.rstrip("+").split("-")[0])
        assert r.violates_policy == (lo < K_MIN)
        assert r.n_groups <= r.n_rows


def test_corpus_card_totals_and_dup_consistency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cards = corpus_card(spark, sf_dir).collect()
    assert sum(r.n_docs for r in cards) == docs.count()
    n_distinct_texts = docs.selectExpr("source", "text").distinct().count()
    assert sum(r.n_dup_docs for r in cards) == docs.count() - n_distinct_texts
    for r in cards:
        # lang mix entries sum back to the doc count
        assert sum(int(x.split(":")[1]) for x in r.lang_mix.split(",")) == r.n_docs


def test_governance_plan_shapes(spark, sf_dir):
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(k_anonymity_audit(spark, sf_dir), forbid_cartesian=True)
    assert_scale_shape(corpus_card(spark, sf_dir), forbid_cartesian=True)


def test_l_diversity_bands_partition_and_catch_k_safe_leaks(spark, sf_dir):
    """C68b (r15): the l-bands partition the corpus row-exactly, the
    violation flag derives from the band, and the audit catches at least
    one group that k-anonymity PASSES (k >= K_MIN) while the sensitive
    attribute is near-homogeneous (l < L_MIN) — the leak the operator
    exists for (probed r15: max k among l<3 groups is 5/6/6 at
    sf0.001/0.01/0.1, all at or above K_MIN)."""
    from pyspark.sql import functions as F

    from frolyk_spark.operators.governance import (
        L_MIN, VALUE_BUCKET, l_diversity_audit,
    )

    rows = {r.l_band: r for r in l_diversity_audit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_rows for r in rows.values()) == ev.count()
    for band, r in rows.items():
        lo = int(band.rstrip("+").split("-")[0])
        assert r.violates_policy == (lo < L_MIN)
        assert r.n_groups <= r.n_rows
    # a k-safe but l=1 group exists on the shipped data (probed r15)
    g = (
        ev.select(
            F.date_trunc("day", "ts").alias("d"),
            F.floor(F.col("value") / VALUE_BUCKET).cast("bigint").alias("vb"),
            "event_type",
        )
        .groupBy("d", "vb")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.size(F.collect_set("event_type")).alias("l"),
        )
    )
    assert g.where((F.col("k") >= K_MIN) & (F.col("l") < L_MIN)).count() > 0


def test_l_diversity_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.governance import l_diversity_audit
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(l_diversity_audit(spark, sf_dir), forbid_cartesian=True)


def test_t_closeness_bands_partition_and_catch_l_safe_skew(spark, sf_dir):
    """C68c (r15): the t-bands partition the corpus row-exactly, the
    violation flag derives from the band's quartile (bands q2/q3 are
    exactly TVD >= 1/2 under the integer predicate), and the audit
    catches at least one group that l-diversity PASSES (l >= L_MIN)
    while sitting at TVD >= 1/2 from the global distribution — the
    skew leak the operator exists for (probed r15: present at every
    shipped SF)."""
    from pyspark.sql import functions as F

    from frolyk_spark.operators.governance import (
        L_MIN, qi_sensitive_counts, t_closeness_audit,
    )

    rows = {r.t_band: r for r in t_closeness_audit(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows.values()) == total
    for band, r in rows.items():
        assert r.violates_policy == (int(band[1:]) >= 2)
        assert r.n_groups <= r.n_rows
    # an l-safe but t-violating group exists on the shipped data
    pairs = qi_sensitive_counts(spark, sf_dir)
    g = pairs.groupBy("d", "vb").agg(
        F.sum("c").alias("k"), F.count(F.lit(1)).alias("l")
    )
    gd = pairs.groupBy("event_type").agg(F.sum("c").alias("cg"))
    nn = pairs.agg(F.sum("c").alias("nt"))
    tv = (
        g.crossJoin(F.broadcast(gd))
        .crossJoin(F.broadcast(nn))
        .join(pairs, ["d", "vb", "event_type"], "left")
        .groupBy("d", "vb", "k", "l")
        .agg(
            F.max("nt").alias("nt"),
            F.sum(
                F.abs(
                    F.coalesce("c", F.lit(0)) * F.col("nt")
                    - F.col("cg") * F.col("k")
                )
            ).alias("num"),
        )
    )
    assert (
        tv.where(
            (F.col("l") >= L_MIN)
            & (F.col("num") * 2 >= 2 * F.col("k") * F.col("nt"))
        ).count()
        > 0
    )


def test_t_closeness_plan_shape(spark, sf_dir):
    """max_scans=1 pins the lineage cut (r15 second review: the uncut
    form scanned the corpus four times — pairs feeds g, gd, the
    broadcast-scalar nn, and the join-back)."""
    from frolyk_spark.operators.governance import t_closeness_audit
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(
        t_closeness_audit(spark, sf_dir),
        forbid_cartesian=False,
        max_scans=1,
    )
