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
        dedup, learn, multimodal, partsupp, pipeline, relational,
        sampling, similarity, temporal, text, vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    # Registration order matters: the driver's correctness gate runs entries
    # in dict order under a wall-clock budget (~50 per round of the 156
    # registered entries). Rotation order is BY DRIVER-ROW AGE, red/new
    # FIRST (CLAUDE.md). The r9 driver burned the r9 head (new_r9 +
    # stale_r4 + the first 26 of green_r6), leaving ten r6 rows stale, so:
    #   1. new_r10 (10): stream_full_outer_join and the two companion
    #      views are brand new; the other six just GAINED full SQL
    #      oracles (unrolled BPE/Lloyd/PQ CTEs) and need their first
    #      hash-checked row (their old rows were rows-only/no_oracle);
    #   2. stale_r6 (10): the r9 budget slippage — newest green row is r6,
    #      the designated r10 head per the r9 verdict;
    #   3. green_r7 (35): completing the freshness ledger — after this
    #      head no entry's newest row predates r8.
    # Head = 10+10+35 = 55 vs the ~50 budget; slippage (if any) falls on
    # the green_r7 tail, never a new or r6-stale entry.
    new_r10 = (
        "stream_full_outer_join",  # B21: both-side null emission
        "bpe_train",               # D47: unrolled-loop SQL oracle (was no-oracle)
        "bpe_encode",              # D52: same
        "ann_lsh",                 # D11: bucket-geometry + rerank oracle (was recall-only)
        "ann_ivf",                 # D11b: unrolled-Lloyd SQL oracle (was rows-only)
        "ann_pq",                  # D40: unrolled per-subspace fit + ADC oracle
        "semantic_dedup",          # D51: same + cos_sim moved to portable round4
        "cluster_profile",         # D63: unrolled-Lloyd SQL oracle (was rows-only)
        "logreg_features",         # D53 companion: feature pipeline, first row
        "pca_moments",             # D56 companion: covariance moments, first row
    )
    stale_r6 = (
        "dedup_clusters", "text_redact", "corpus_filter",
        "minhash_jaccard_estimate", "cross_source_duplication",
        "length_histogram", "multimodal_manifest",
        "feature_hash_embedding", "dup_span_coverage", "stream_topk",
    )
    green_r7 = (
        "stream_anomaly", "stream_quarantine", "q22_idle_balance",
        "value_deciles", "resample_gapfill", "salted_join_segments",
        "markov_transitions", "order_value_quartiles", "conversion_funnel",
        "funnel_fold", "q16_parts_supplier_counts",
        "q20_concentrated_suppliers", "data_quality_audit", "rfm_segments",
        "market_basket", "ewma_value", "top_paths", "skyline_parts",
        "scd2_lookup", "sample_stratified", "media_resize", "frame_sample",
        "boilerplate_ngrams", "dedup_canonical", "sample_per_source",
        "lsh_band_sweep", "lang_confusion", "source_yield", "media_decode",
        "video_decode", "span_trim", "dsir_select", "decontaminate_bloom",
        "benchmark_leakage", "training_pipeline",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn,
                streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r10, *stale_r6, *green_r7):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r8/r9-green remainder; first-insertion order wins
    return out


def oracle_sql() -> dict[str, str]:
    from frolyk_spark.operators import (
        dedup, learn, multimodal, partsupp, pipeline, relational, sampling,
        similarity, temporal, text, vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    out: dict[str, str] = {}
    out.update(learn.ORACLES)
    out.update(temporal.ORACLES)
    out.update(partsupp.ORACLES)
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
