"""Order-insensitive Spark vs DuckDB result comparison.

Mirrors the driver's t2 gate: row count, column names (sorted), and a
value-level comparison that is insensitive to row and column order.
Floats are compared with tolerance here (the operators themselves round
outputs so the driver's exact value-hash also matches).
"""

from __future__ import annotations

import math
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
        if isinstance(v, float):
            # quantize so -0.0/0.0 and last-ulp noise compare equal
            v = 0.0 if v == 0 else round(v, 9)
        out.append((str(type(v).__name__)[:1], str(v)))
    return tuple(out)


def compare_results(spark_df, duck_rel, float_tol=1e-6):
    """Raise AssertionError with a diff summary if results differ."""
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"

    order = [d_cols.index(c) for c in sorted(s_cols)]
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]

    s_rows = [tuple(r[i] for i in s_idx) for r in spark_df.collect()]
    d_rows = [tuple(r[i] for i in order) for r in duck_rel.fetchall()]

    assert len(s_rows) == len(d_rows), f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_sorted = sorted((_key(r) for r in s_rows))
    d_sorted = sorted((_key(r) for r in d_rows))
    mismatches = []
    for a, b in zip(s_sorted, d_sorted):
        if a != b and not _rows_close(a, b, float_tol):
            mismatches.append((a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"value mismatches (spark vs duckdb), first 5: {mismatches}"


def _rows_close(a, b, tol):
    if len(a) != len(b):
        return False
    for (ta, va), (tb, vb) in zip(a, b):
        if va == vb:
            continue
        try:
            fa, fb = float(va), float(vb)
        except (TypeError, ValueError):
            return False
        if not math.isclose(fa, fb, rel_tol=tol, abs_tol=tol):
            return False
    return True
