"""Portable-hash parity: the 60-bit md5 bigint must be identical in Spark
and DuckDB — it is the keystone every hash-dependent operator (D4-D8)
builds on (frolyk_spark/functions/hashing.py)."""

from pyspark.sql import functions as F

from frolyk_spark.functions.hashing import (
    portable_hash_expr, portable_hash_spark_sql, portable_hash_sql,
)

CORPUS = [
    "hello",
    "",
    "a b c",
    "tab\tand\nnewline",
    "ünïcodé çhars §±",
    "日本語テキスト",
    "x" * 500,
    "0",
    " leading and trailing ",
]


def test_hash_parity_fixed_corpus(spark, duck):
    import pandas as pd

    sdf = spark.createDataFrame([(s,) for s in CORPUS], "s string")
    spark_hashes = [r.h for r in sdf.select(portable_hash_expr("s").alias("h")).collect()]
    corpus_pdf = pd.DataFrame({"s": CORPUS})
    duck.register("hash_corpus", corpus_pdf)
    duck_hashes = [
        r[0] for r in duck.sql(f"SELECT {portable_hash_sql('s')} FROM hash_corpus").fetchall()
    ]
    assert spark_hashes == duck_hashes
    assert all(h >= 0 for h in spark_hashes)


def test_hash_parity_documents_table(spark, duck, sf_dir):
    from frolyk_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = sorted(
        r.h for r in docs.selectExpr(f"{portable_hash_spark_sql('text')} AS h").collect()
    )
    d = sorted(
        r[0] for r in duck.sql(f"SELECT {portable_hash_sql('text')} FROM documents").fetchall()
    )
    assert s == d


def test_portable_hash_py_matches_engines(spark):
    """The Python kernel twin must produce the same 60-bit value as the
    Spark and DuckDB forms for the same input string."""
    import duckdb

    from frolyk_spark.functions.hashing import (
        portable_hash_py, portable_hash_spark_sql, portable_hash_sql,
    )

    samples = ["", "a", "deadbeef", "Hello, wörld", "0" * 64]
    for x in samples:
        got_py = portable_hash_py(x)
        got_spark = spark.sql(
            f"SELECT {portable_hash_spark_sql('x')} AS h FROM (SELECT '{x}' AS x)"
        ).collect()[0].h
        got_duck = duckdb.sql(
            f"SELECT {portable_hash_sql('x')} AS h FROM (SELECT '{x}' AS x)"
        ).fetchone()[0]
        assert got_py == got_spark == got_duck, (x, got_py, got_spark, got_duck)


def test_bloom_positions_spark_python_parity(spark):
    """E18's probe side recomputes bit positions in pure Python (the
    manifest consumer path); they must agree with the Spark-side array
    expression for arbitrary values, or a point lookup silently turns
    false-negative — the one failure mode a Bloom index must never have."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from frolyk_spark.sources.catalog import (
        _bloom_positions_expr, _bloom_positions_py,
    )

    vals = [-987654321, 0, 1, 7, 10**12, 42]
    df = spark.createDataFrame([(v,) for v in vals], "k bigint")
    spark_pos = {
        r["k"]: list(r["p"])
        for r in df.select(
            "k", F.expr(_bloom_positions_expr("k")).alias("p")
        ).collect()
    }
    for v in vals:
        assert spark_pos[v] == _bloom_positions_py(v), v

    # second supported type: STRING keys (Spark cast-to-string is the
    # identity there, so the shared renderer agrees byte-for-byte)
    svals = ["", "a", "needle-42", "Hello, wörld", "0" * 64]
    sdf = spark.createDataFrame([(v,) for v in svals], "k string")
    spark_spos = {
        r["k"]: list(r["p"])
        for r in sdf.select(
            "k", F.expr(_bloom_positions_expr("k")).alias("p")
        ).collect()
    }
    for v in svals:
        assert spark_spos[v] == _bloom_positions_py(v), v

    # unsupported key types reject LOUDLY (bool renders True vs true,
    # floats/decimals have engine-specific repr) — a silent divergence
    # would be the false negative the index must never produce
    import datetime
    import decimal

    import pytest as _pytest

    for bad in (True, 1.5, decimal.Decimal("1.50"), datetime.date(2024, 1, 2)):
        with _pytest.raises(TypeError):
            _bloom_positions_py(bad)

    @given(st.integers(min_value=-(2**40), max_value=2**40))
    @settings(max_examples=50, deadline=None)
    def py_side_is_total_and_in_range(v):
        pos = _bloom_positions_py(v)
        from frolyk_spark.sources.catalog import BLOOM_K, BLOOM_M
        assert len(pos) == BLOOM_K
        assert all(0 <= p < BLOOM_M for p in pos)

    py_side_is_total_and_in_range()
