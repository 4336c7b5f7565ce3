"""Cross-engine-portable numeric forms for oracle-compared outputs.

Spark's round() rounds the SHORTEST decimal repr of a double
(BigDecimal.valueOf: 0.59825 → 0.5983) while DuckDB rounds the numeric
double (the same stored double is 0.59824999…, → 0.5982) — a boundary
divergence the r5 sf0.1 sweep hit on a real corpus value. Any derived
RATIO that feeds the value-hash compare must round with the floor form
below, evaluated with the identical expression on both engines.
Money-sum rounds are exempt (cents-exact doubles have no hidden digits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Portable 4-dp round-half-up: floor(x·10⁴ + 0.5)/10⁴.
    Non-negative inputs only (ratios)."""
    return F.floor(col * 10000.0 + F.lit(0.5)) / 10000.0


def round4_sql(expr: str) -> str:
    """The DuckDB-side twin of round4 — identical operation order."""
    return f"floor(({expr}) * 10000.0 + 0.5) / 10000.0"


def round2(col: Column) -> Column:
    """Portable 2-dp round-half-up (ratio outputs quoted in money-like
    units, e.g. a scaled sum divided back down — NOT needed for plain
    cents-exact money sums, which have no hidden digits)."""
    return F.floor(col * 100.0 + F.lit(0.5)) / 100.0


def round2_sql(expr: str) -> str:
    return f"floor(({expr}) * 100.0 + 0.5) / 100.0"


def round6(col: Column) -> Column:
    """Portable 6-dp round-half-up (fine-grained ratios like vocabulary
    Jaccard overlaps)."""
    return F.floor(col * 1000000.0 + F.lit(0.5)) / 1000000.0


def round6_sql(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"
