"""Order-insensitive Spark vs DuckDB result comparison.

Mirrors the driver's t2 gate: row count, column names (sorted), numeric
KIND parity, and a value-level comparison that is insensitive to row and
column order but otherwise EXACT — floats must match to the last ULP,
like the driver's value hash. The whole suite passes repr-exact
(verified r4: every cosine/jaccard/money-sum agrees bit-for-bit because
dot/norm folds accumulate in the same order on both engines and
cents-valued money sums are exact below 2^53), so any future ULP drift
is a real regression, not noise. There is deliberately no tolerance
knob: rows are aligned by sorting on exact reprs, so a tolerant compare
over that alignment would mispair near-equal rows — a tolerant check
belongs in its own test (cf. tests/test_approx.py), not here.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    out = []
    for v in row:
        v = _norm(v)
        out.append((str(type(v).__name__)[:1], repr(v)))
    return tuple(out)


#: DuckDB logical types that surface as pandas float64 through the driver's
#: Arrow/pandas path.  HUGEINT is the trap: ``sum(BIGINT)`` returns HUGEINT,
#: ``fetchall()`` hides it as a Python int, but the driver's value hash sees
#: ``123.0`` vs Spark's ``123`` (the CORRECTNESS_r03 source_mix red row).
_DUCK_FLOATISH = {"DOUBLE", "FLOAT", "REAL", "HUGEINT", "UHUGEINT"}
_DUCK_INTISH = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_SPARK_INTISH = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOATISH = {"float", "double"}


def _assert_numeric_kinds_match(spark_df, duck_rel):
    duck_kinds = {c.lower(): str(t).upper()
                  for c, t in zip(duck_rel.columns, duck_rel.types)}
    for name, dtype in spark_df.dtypes:
        d = duck_kinds.get(name.lower())
        if d is None:
            continue
        if dtype in _SPARK_INTISH and d in _DUCK_FLOATISH:
            raise AssertionError(
                f"column {name!r}: spark {dtype} vs duckdb {d} — the driver "
                f"hash will see 123.0 vs 123; CAST the oracle aggregate to "
                f"BIGINT (HUGEINT comes from sum() over integer columns)")
        if dtype in _SPARK_FLOATISH and d in _DUCK_INTISH:
            raise AssertionError(
                f"column {name!r}: spark {dtype} vs duckdb {d} — cast one "
                f"side so both are floating")


def compare_results(spark_df, duck_rel):
    """Raise AssertionError with a diff summary if results differ."""
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    _assert_numeric_kinds_match(spark_df, duck_rel)

    order = [d_cols.index(c) for c in sorted(s_cols)]
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]

    s_rows = [tuple(r[i] for i in s_idx) for r in spark_df.collect()]
    d_rows = [tuple(r[i] for i in order) for r in duck_rel.fetchall()]

    assert len(s_rows) == len(d_rows), f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_sorted = sorted(_key(r) for r in s_rows)
    d_sorted = sorted(_key(r) for r in d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ][:5]
    assert not mismatches, f"value mismatches (spark vs duckdb), first 5: {mismatches}"
