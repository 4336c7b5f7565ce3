"""Multimodal columns for training-data pipelines (SURVEY §2 D13-D14).

Images/audio/video are opaque ``binary`` columns with typed metadata riding
alongside. No media libraries ship in this container, so payload bytes are
deterministic fakes (unhex of repeated md5) and the real decode step is a
clearly marked stub — but the Spark-side plumbing is real and is the part
that matters at 100 TB: binary columns flow through parquet scans and Arrow
batches untouched, metadata stays in typed scalar/struct columns the
optimizer can prune and filter WITHOUT touching payload bytes, and feature
extraction runs as ``mapInPandas`` over bounded Arrow batches (payloads
never concentrate on the driver or in one worker's memory).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.functions.hashing import portable_hash_expr, portable_hash_sql
from frolyk_spark.sources.catalog import load_table

MODALITIES = ("image", "audio", "video")


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed multimodal frame other operators consume: doc_id, modality,
    binary payload, and a metadata struct (all deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash_expr("text")
    payload = F.unhex(F.repeat(F.md5("text"), (F.pmod("doc_id", F.lit(4)) + 1).cast("int")))
    modality = F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (F.pmod("doc_id", F.lit(3)) + 1).cast("int"))
    meta = F.struct(
        (64 + F.pmod(h, F.lit(960))).cast("int").alias("width"),
        (64 + F.pmod(F.shiftright(h, 10), F.lit(960))).cast("int").alias("height"),
        (1000 + F.pmod(F.shiftright(h, 20), F.lit(59000))).cast("int").alias("duration_ms"),
    )
    return docs.select("doc_id", modality.alias("modality"), payload.alias("payload"), meta.alias("meta"))


# --- D13: manifest (oracle-checked scalar projection) ------------------------

def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest view: one row per asset with modality, payload size and
    typed metadata — flattened to scalars so the DuckDB oracle can
    value-check every derivation (the binary column itself is exercised by
    multimodal_features / tests)."""
    t = multimodal_table(spark, sf_dir)
    return t.select(
        "doc_id",
        "modality",
        F.length("payload").cast("bigint").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def _manifest_sql() -> str:
    h = portable_hash_sql("text")
    return f"""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
       octet_length(unhex(repeat(md5(text), cast(doc_id % 4 + 1 as int)))) AS byte_len,
       cast(64 + ({h}) % 960 as int) AS width,
       cast(64 + (({h}) >> 10) % 960 as int) AS height,
       cast(1000 + (({h}) >> 20) % 59000 as int) AS duration_ms
FROM documents
"""


# --- D14: feature extraction over Arrow batches -------------------------------

def _decode_media(payload: bytes, modality: str):
    """Real decode would go through PIL/librosa/pyav — not in this image.
    STUB: fails loudly rather than fake-decoding."""
    raise NotImplementedError(
        f"media decode for {modality!r} requires PIL/librosa/pyav; "
        "install them and replace this stub"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction via mapInPandas: payload length, a
    32-bit prefix fingerprint, and bytes-per-pixel density from metadata.
    Shows the Arrow-batch shape real decoders plug into (swap
    `_decode_media` in); payloads stay distributed, batch-bounded."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "prefix_u32": payloads.map(
                        lambda b: int.from_bytes(b[:4], "big")
                    ).astype("int64"),
                    "bytes_per_pixel": (
                        payloads.map(len) / (pdf["width"] * pdf["height"])
                    ).astype("float64").round(8),
                }
            )

    t = multimodal_table(spark, sf_dir).select(
        "doc_id", "modality", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return t.mapInPandas(
        extract,
        "doc_id bigint, modality string, byte_len bigint, prefix_u32 bigint, bytes_per_pixel double",
    )


def _features_sql() -> str:
    h = portable_hash_sql("text")
    blob = "unhex(repeat(md5(text), cast(doc_id % 4 + 1 as int)))"
    return f"""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
       octet_length({blob}) AS byte_len,
       cast(concat('0x', substr(md5(text), 1, 8)) as bigint) AS prefix_u32,
       round(octet_length({blob}) * 1.0 /
             ((64 + ({h}) % 960) * (64 + (({h}) >> 10) % 960)), 8) AS bytes_per_pixel
FROM documents
"""


QUERIES = {
    "multimodal_manifest": multimodal_manifest,
    "multimodal_features": multimodal_features,
}

ORACLES = {
    "multimodal_manifest": _manifest_sql(),
    # features: the first 4 payload bytes are the first 8 md5 hex chars, so
    # even the Python-side extraction is value-checkable
    "multimodal_features": _features_sql(),
}
