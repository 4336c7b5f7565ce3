"""Engine-portable deterministic hashing.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so results built on them could never be oracle-checked. Instead
every hash-dependent operator (minhash, simhash, LSH, fingerprints) uses the
top 60 bits of md5 reinterpreted as a non-negative bigint — md5 is identical
everywhere, and both engines can slice hex strings and cast to int64.

Spark side: ``conv(substr(md5(x),1,15),16,10)`` (JVM built-ins, codegen'd —
this stays on the fast path, no Python UDF). DuckDB side:
``cast(concat('0x',substr(md5(x),1,15)) as bigint)``. Parity is asserted in
tests/test_hashing.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash_expr(col: Column | str) -> Column:
    """60-bit non-negative bigint hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash_sql(expr: str) -> str:
    """Same hash as :func:`portable_hash_expr`, as DuckDB SQL text."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def portable_hash_spark_sql(expr: str) -> str:
    """Same hash as Spark SQL text (for use inside F.expr strings)."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def portable_hash_py(s: str) -> int:
    """Python-side twin for Arrow kernels (mapInPandas/pandas_udf) that
    must agree with the Spark/DuckDB forms — one definition of the
    60-bit width so a kernel can never drift to e.g. [:16]."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
