"""Runs EVERY queries() entry against its oracle_sql() — the driver's t2
gate, locally, at sf0.001 (set SPARK_GRAFT_TEST_SF_DIR to raise)."""

import pytest

import __spark_entry__ as entry_mod
from tests.compare import compare_results

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_all_queries_have_oracles_or_are_declared():
    # every oracle key must have a query; queries without oracle are the
    # declared non-SQL-expressible set
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    rel = duck.sql(ORACLES[name])
    compare_results(df, rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0


def test_rotation_order_is_sound():
    """The driver runs queries() in dict order under a wall-clock budget;
    the hand-ordered rotation must stay duplicate-free, fully resolvable,
    and a superset-preserving reordering (every registered query appears
    exactly once, nothing is dropped or shadowed)."""
    names = list(QUERIES)
    assert len(names) == len(set(names))
    # first entries are the explicitly-ordered rotation; re-calling must be
    # deterministic
    assert names == list(entry_mod.queries())
    # every oracle key resolves and no rotation name is stale
    assert set(ORACLES) <= set(names)


def test_bench_headline_fully_registered():
    """Every bench headline key must resolve to a registered query — a
    rename that orphans a headline entry should fail here, not surface as
    a silent 'skipped' in the round's bench artifact."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headline keys without queries(): {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
