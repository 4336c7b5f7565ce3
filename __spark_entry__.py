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
    # in dict order under a wall-clock budget (~50 per round of the 126
    # registered entries). The r6 rotation is ordered by driver-row AGE.
    # CORRECTNESS_r05 was not delivered to the repo, so r5 coverage is
    # estimated from the r5 registration order and the observed ~50/round
    # budget (the 26 red_or_new entries plus roughly the first two dozen of
    # the last_green_r3 block):
    #   1. new_r6: the operators new this round — no driver row at all;
    #   2. likely_last_green_r3: the TAIL of r5's last_green_r3 block, the
    #      entries an r5 budget of ~50 would not have reached — their
    #      newest green row is still r3 (two rounds stale);
    #   3. r4_green_once / r4_green: entries whose newest green row is r4;
    #   4. the head of r5's rotation (embedding_quantize + the 25 r5-new
    #      ops, then the last_green_r3 head) — freshly checked in r5 if
    #      the estimate holds, so they park last and still fit a ~50
    #      budget's remainder partially.
    new_r6 = (
        "dup_span_coverage", "scd2_history", "supplier_peak_load",
        "semantic_dedup", "bpe_encode", "quality_logreg",
        "spending_percentiles", "feature_hash_embedding",
        "minhash_containment", "embedding_pca", "stream_topk",
        "containment_chains", "time_weighted_avg", "ohlc_bars",
        "stream_ohlc",
    )
    likely_last_green_r3 = (
        "dedup_clusters", "ann_bruteforce", "ann_lsh",
        "ann_ivf", "embedding_stats", "text_stats", "lang_id",
        "token_count", "doc_fingerprint", "text_redact", "corpus_filter",
        "multimodal_manifest",
    )
    r4_green = (
        "source_mix", "q12_delay_priority", "minhash_jaccard_estimate",
        "cross_source_duplication", "length_histogram", "tfidf_top_terms",
        "q5_local_supplier", "q6_forecast", "q10_returned",
        "topk_orders_per_customer", "running_revenue", "event_deltas",
        "rollup_revenue", "cube_lineitem", "customers_with_orders",
        "customers_without_orders", "distinct_parts_per_supplier",
        "event_type_pivot", "asof_purchase_click", "clicks_before_purchase",
        "set_ops_customers", "explode_words", "daily_revenue",
        "q4_order_priority", "q7_volume_shipping", "q14_promo_revenue",
        "q9_product_profit", "salted_skew_agg", "asof_cogroup",
        "retention_cohorts", "grouping_sets_revenue", "q8_market_share",
        "q13_order_distribution", "q15_top_supplier", "q18_large_orders",
        "approx_stats",
    )
    likely_r5_green = (
        "embedding_quantize",
        "json_props_stats", "markov_transitions", "order_value_quartiles",
        "price_discount_corr", "boilerplate_ngrams", "anomaly_zscore",
        "dedup_canonical", "conversion_funnel", "funnel_fold",
        "key_skew_profile", "ann_pq",
        "q2_min_cost_supplier", "q11_important_parts",
        "q16_parts_supplier_counts", "q20_concentrated_suppliers",
        "source_vocab_overlap", "ngram_novelty", "sample_temperature",
        "stream_anomaly", "sample_per_source", "sketch_profile",
        "lsh_band_sweep", "bpe_train", "lang_confusion", "source_yield",
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
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn,
                streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r6, *likely_last_green_r3, *r4_green, *likely_r5_green):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # remainder; first-insertion order wins
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
