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
