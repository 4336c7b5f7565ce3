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
    # in dict order under a wall-clock budget (~50 per round of the 142
    # registered entries). The r7 rotation is ordered strictly by driver-row
    # AGE, red/never-checked first, computed from the delivered
    # CORRECTNESS_r01..r06 artifacts (r5 was never delivered, so the 25
    # r5-wave operators have no driver row at all):
    #   1. red_r4: embedding_quantize — newest driver row is the r4 RED
    #      (unhashable array output; the r5 concat_ws fix is local-only);
    #   2. never_checked: the 25 r5-wave entries with NO driver row ever;
    #   3. stale_r3: newest green row is r3 — includes the whole streaming
    #      family (VERDICT r6 item 6) and the flagship q1/q3/dedup block;
    #   4. stale_r4: newest green row is r4;
    #   5. green_r6: freshly checked last round — park last.
    # The r7-new entries (16 after the second and third waves) slot after
    # the never-checked block — equally row-less, and new operators need
    # their FIRST driver row more than three-round-stale greens need a
    # refresh. Budget math: 1 + 25 + 16 = 42, so ~8 of the 24 stale_r3
    # entries fit a ~50-entry budget (most new entries are sub-2 s, so the
    # WALL-CLOCK budget likely stretches further) — most of the streaming
    # family; the flagship q1/q3/dedup tail of stale_r3 likely slips to
    # r8, which is the right trade (those have r3 greens AND run in every
    # local pytest sweep).
    red_r4 = ("embedding_quantize",)
    never_checked = (
        "json_props_stats", "markov_transitions", "order_value_quartiles",
        "price_discount_corr", "boilerplate_ngrams", "anomaly_zscore",
        "dedup_canonical", "conversion_funnel", "funnel_fold",
        "key_skew_profile", "ann_pq",
        "q2_min_cost_supplier", "q11_important_parts",
        "q16_parts_supplier_counts", "q20_concentrated_suppliers",
        "source_vocab_overlap", "ngram_novelty", "sample_temperature",
        "stream_anomaly", "sample_per_source", "sketch_profile",
        "lsh_band_sweep", "bpe_train", "lang_confusion", "source_yield",
    )
    new_r7 = ("media_decode", "span_trim", "video_decode",
              "dsir_select", "decontaminate_bloom", "cluster_profile",
              "data_quality_audit", "benchmark_leakage", "stream_quarantine",
              "rfm_segments", "market_basket", "training_pipeline",
              "ewma_value", "top_paths", "skyline_parts", "scd2_lookup")
    stale_r3 = (
        "q22_idle_balance", "value_deciles", "resample_gapfill",
        "salted_join_segments", "multimodal_features", "media_resize",
        "frame_sample", "sample_stratified", "train_test_split",
        "stream_tumbling", "stream_hopping", "stream_dedup", "sessionize",
        "stream_stateful", "stream_stream_join", "stream_static_join",
        "task_pipeline",
        "q1_pricing_summary", "q3_unshipped_revenue", "dedup_exact",
        "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding",
    )
    stale_r4 = (
        "q4_order_priority", "q7_volume_shipping", "q14_promo_revenue",
        "q9_product_profit", "salted_skew_agg", "asof_cogroup",
        "retention_cohorts", "grouping_sets_revenue", "q8_market_share",
        "q13_order_distribution", "q15_top_supplier", "q18_large_orders",
        "approx_stats", "sequence_pack", "decontaminate", "doc_chunks",
        "repetition_stats", "q21_waiting_suppliers", "q17_small_qty_revenue",
        "q19_discount_revenue", "vocab_topk", "bigram_counts",
        "unigram_logprob", "token_entropy", "dedup_incremental",
        "dedup_simhash_pairs",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn,
                streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*red_r4, *never_checked, *new_r7, *stale_r3, *stale_r4):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # green_r6 remainder; first-insertion order wins
    return out


def oracle_sql() -> dict[str, str]:
    from frolyk_spark.operators import (
        dedup, multimodal, partsupp, pipeline, relational, sampling,
        similarity, temporal, text, vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    out: dict[str, str] = {}
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
