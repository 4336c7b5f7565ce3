"""Vector math over ``array<float>`` columns — JVM-side, no Python UDFs.

Dot products / norms fold left-to-right with ``aggregate(zip_with(...))``
after casting elements to double, so Spark and DuckDB accumulate in the same
order and precision; outputs are rounded before comparison anyway.

At cluster scale these expressions run inside whole-stage codegen over the
Arrow-backed parquet scan — the embedding column never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB SQL fragments computing the same fold (list_aggregate orders match):
def dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}),"
        f" z -> cast(z[1] as double) * cast(z[2] as double)), 'sum')"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_aggregate(list_transform({a}, x -> cast(x as double) * cast(x as double)), 'sum'))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
