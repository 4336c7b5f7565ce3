"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` provides the DuckDB-equivalent SQL for the
value-hash correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from frolyk_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from frolyk_spark.operators import (
        dedup, multimodal, pipeline, relational, sampling, similarity, text,
        vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    # Registration order matters: the driver's correctness gate runs entries
    # in dict order under a wall-clock budget (CORRECTNESS_r02 stopped after
    # 50 of 61).  Entries with no green driver row yet run FIRST: the new
    # r3 operators (pipeline module + the three new TPC-H adaptations),
    # then the r2 entries the truncated run never reached; the twice-green
    # relational block goes last (dict.update keeps first-insertion order,
    # so re-adding the hoisted keys later is a no-op).
    new_relational = (
        "q21_waiting_suppliers",
        "q17_small_qty_revenue", "q19_discount_revenue", "q22_idle_balance",
        "value_deciles", "resample_gapfill", "salted_join_segments",
    )
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # newest additions — no driver row yet, so they go absolutely first
    out["dedup_simhash_pairs"] = dedup.QUERIES["dedup_simhash_pairs"]
    out["unigram_logprob"] = text.QUERIES["unigram_logprob"]
    out.update(vocab.QUERIES)
    out["sequence_pack"] = pipeline.QUERIES["sequence_pack"]
    out["token_entropy"] = text.QUERIES["token_entropy"]
    out["dedup_incremental"] = dedup.QUERIES["dedup_incremental"]
    out["q21_waiting_suppliers"] = relational.QUERIES["q21_waiting_suppliers"]
    out.update(pipeline.QUERIES)
    out.update({k: relational.QUERIES[k] for k in new_relational})
    out.update(multimodal.QUERIES)
    out.update(sampling.QUERIES)
    out.update(streaming_jobs.QUERIES)
    out.update(bridge.QUERIES)
    out.update(text.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(relational.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from frolyk_spark.operators import (
        dedup, multimodal, pipeline, relational, sampling, similarity, text,
        vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    out: dict[str, str] = {}
    out.update(vocab.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(sampling.ORACLES)
    out.update(streaming_jobs.ORACLES)
    out.update(bridge.ORACLES)
    out.update(text.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    out.update(relational.ORACLES)
    return out
