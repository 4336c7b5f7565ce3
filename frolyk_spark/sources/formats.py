"""Text-format readers (JSONL / CSV) with corrupt-record capture.

Real corpora arrive as JSONL and CSV long before they are parquet; at
100 TB a single malformed line must not kill a multi-hour job, and
silently dropping it is worse. These readers pin the schema (no inference
pass over the data — at scale, inference is a full extra read) and default
to PERMISSIVE parsing with an explicit corrupt-record column, so bad lines
become quarantine rows a pipeline can count, sample, and route to a
dead-letter sink.

Modes mirror Spark's: PERMISSIVE (capture), DROPMALFORMED (drop),
FAILFAST (die on first bad record).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: default quarantine column for unparsable lines
CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema: str, mode: str, corrupt_col: str) -> str:
    """PERMISSIVE capture requires the corrupt column IN the schema.

    The membership test parses the DDL's field NAMES — a substring test
    would see '_corrupt_record' inside e.g. 'raw_corrupt_record' and skip
    the append, silently disabling quarantine capture (Spark ignores
    columnNameOfCorruptRecord when the column isn't in the schema). Fields
    are split only at nesting depth 0: a comma inside struct<a int, b
    string> or decimal(10,2) belongs to the TYPE, and splitting there would
    surface a nested field name as a phantom top-level one (e.g. a nested
    `_corrupt_record` suppressing the top-level append)."""
    names = set()
    depth, cur = 0, []
    for ch in schema + ",":
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            field = "".join(cur).strip()
            if field:
                names.add(field.split()[0].strip("`"))
            cur = []
        else:
            cur.append(ch)
    if mode.upper() == "PERMISSIVE" and corrupt_col not in names:
        return f"{schema}, {corrupt_col} string"
    return schema


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-pinned JSON-lines reader. Rows that fail to parse (or fail
    type coercion) come back with data columns null and the raw line in
    ``corrupt_col``; well-formed rows have ``corrupt_col`` null — filter on
    it to split clean/quarantine."""
    return (
        spark.read.schema(_with_corrupt_col(schema, mode, corrupt_col))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-pinned CSV reader with the same quarantine contract as
    load_jsonl."""
    return (
        spark.read.schema(_with_corrupt_col(schema, mode, corrupt_col))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def split_quarantine(df: DataFrame, corrupt_col: str = CORRUPT_COL) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_quarantine_column, quarantined_raw_lines).
    The dead-letter side keeps only the raw line — route it to a sink and
    alert on its count.

    The parsed frame is cached first: Spark refuses a plan that reads ONLY
    the corrupt column straight off a raw JSON/CSV scan (the parser prunes
    to referenced columns, so nothing would ever fail to parse); caching
    materializes the full parse once, which both sides then share — one
    read for clean + quarantine instead of two."""
    df = df.cache()
    clean = df.where(df[corrupt_col].isNull()).drop(corrupt_col)
    bad = df.where(df[corrupt_col].isNotNull()).select(corrupt_col)
    return clean, bad
