"""Deterministic sampling / split assignment (SURVEY §2 D18-D19).

Training pipelines need samples and train/val/test splits that are
reproducible across reruns, engines, and data relayouts. RNG-based
`sample()`/`sampleBy()` can't promise that (seeds bind to partitioning),
so both operators here derive membership from the portable 60-bit md5 of
the stable document id: pure map-side predicates, no shuffle, identical
answers in Spark and DuckDB — which also makes them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.functions.hashing import portable_hash_expr, portable_hash_sql
from frolyk_spark.sources.catalog import load_table

#: per-language sampling percentages (strata -> percent kept)
STRATA_PCT = {"en": 50, "de": 20, "fr": 20, "es": 10, "zh": 10}
#: train/val/test split percentages
SPLIT_TRAIN, SPLIT_VAL = 80, 10  # test = remainder


def _bucket(col) -> F.Column:
    """Stable 0-99 bucket from the document id."""
    return F.pmod(portable_hash_expr(col), F.lit(100))


def _bucket_sql(expr: str) -> str:
    return f"({portable_hash_sql(expr)}) % 100"


# --- D18: stratified sample ---------------------------------------------------

def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep a per-language percentage of documents, deterministically:
    doc is kept iff hash-bucket(doc_id) < pct(lang). Re-running, adding
    columns, or repartitioning never changes membership."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = _bucket(F.col("doc_id").cast("string"))
    pct = F.lit(None).cast("int")
    for lang, p in sorted(STRATA_PCT.items(), reverse=True):
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < F.coalesce(pct, F.lit(0)))
        .select("doc_id", "lang", "bucket")
    )


def _sample_stratified_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in sorted(STRATA_PCT.items())
    )
    b = _bucket_sql("cast(doc_id as varchar)")
    return f"""
SELECT doc_id, lang, {b} AS bucket
FROM documents
WHERE {b} < coalesce(CASE {cases} END, 0)
"""


# --- D19: train/val/test split ------------------------------------------------

def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by stable hash bucket
    ({SPLIT_TRAIN}/{SPLIT_VAL}/remainder percent). The assignment is a
    pure function of doc_id — new data lands in splits without moving any
    existing document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bucket = _bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_TRAIN + SPLIT_VAL, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


def _train_test_split_sql() -> str:
    b = _bucket_sql("cast(doc_id as varchar)")
    return f"""
SELECT doc_id,
       CASE WHEN {b} < {SPLIT_TRAIN} THEN 'train'
            WHEN {b} < {SPLIT_TRAIN + SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# --- D44: exact-k per-group sample -------------------------------------------

#: documents kept per source
SAMPLE_K = 5


def sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {SAMPLE_K} documents per source, deterministically — the
    reservoir-sample shape without RNG: rank documents within each
    source by the portable hash of doc_id (a stable uniform-ish order)
    and keep the first {SAMPLE_K}. Fraction-based sampling (D18) can't
    promise exact counts per group; this can, and membership still
    survives reruns, engines, and relayouts.

    Scale shape: one window rank per source partition (partition count =
    source count; rows-per-source is the per-group data, the same bound
    any per-group top-K has — Spark runs it as a partial top-K-per-
    partition before the exchange via WindowGroupLimit). doc_id breaks
    hash ties so boundary membership is total-ordered.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    from pyspark.sql import Window

    h = portable_hash_expr(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K)
        .select("source", "rk", "doc_id")
    )


def _sample_per_source_sql() -> str:
    h = portable_hash_sql("cast(doc_id as varchar)")
    return f"""
SELECT source, rk, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h} ASC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {SAMPLE_K}
"""


QUERIES = {
    "sample_stratified": sample_stratified,
    "train_test_split": train_test_split,
    "sample_per_source": sample_per_source,
}

ORACLES = {
    "sample_stratified": _sample_stratified_sql(),
    "train_test_split": _train_test_split_sql(),
    "sample_per_source": _sample_per_source_sql(),
}
