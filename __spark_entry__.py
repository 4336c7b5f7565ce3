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
        dedup, governance, graph, learn, multimodal, partsupp, pipeline,
        relational, retrieval, sampling, similarity, temporal, text, vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    # Registration order matters: the driver's correctness gate runs entries
    # in dict order under a wall-clock budget (~50 per round of the 188
    # registered entries). Rotation order is BY DRIVER-ROW AGE, red/new
    # FIRST (CLAUDE.md). The r11 driver burned its whole 50-row head green
    # (new_r11 + stale_r7 + 22 of green_r8); 28 green_r8 entries slipped to
    # r12 as designed. So:
    #   1. new_r12 (9): dedup_substring (D80, maximal exact-substring
    #      spans — the Lee et al. 2022 ExactSubstr artifact via
    #      gaps-and-islands over positional-gram pair matches),
    #      kcore_parts (C69, fixed-round onion-layer k-core peel of the
    #      co-purchase graph, integer-exact like pagerank_parts),
    #      triangle_parts (C70, degree-oriented wedge-check triangle
    #      count), heavy_hitters_cms (D81, Count-Min bigram sketch with
    #      exact oracle), vocab_growth (D82, Heaps-law curve), and
    #      stream_asof_join (B30, range-batched streaming as-of join
    #      sharing C16's oracle), stream_heavy_hitters (B31, mergeable
    #      CMS state sharing D81's oracle), stream_vocab_growth (B32,
    #      MIN-mergeable first-occurrence state sharing D82's oracle),
    #      and tokenizer_fertility (D83, per-source pieces-per-word of
    #      the persisted BPE model) are brand new this round;
    #   2. stale_r8 (28): the r11 budget slippage — newest green row is
    #      r8, the oldest block in the ledger and the r11 verdict's
    #      designated r12 head (streaming core block + the r8
    #      relational/sampling tail);
    #   3. green_r9 (49): after the head burns, no oracle-checkable
    #      entry's newest row predates r9; remaining budget starts here
    #      per the r11 verdict's "done" criterion.
    # Head = 9+28+49 = 86 vs the ~50 budget; slippage (if any) falls on the
    # green_r9 tail, never a new or r8-stale entry.
    new_r12 = (
        "dedup_substring",  # D80: suffix-array-style maximal dup spans
        "kcore_parts",      # C69: onion-layer k-core peel
        "triangle_parts",   # C70: degree-oriented triangle count
        "heavy_hitters_cms",  # D81: Count-Min bigram sketch, exact oracle
        "vocab_growth",     # D82: Heaps-law vocabulary growth curve
        "stream_asof_join",  # B30: streaming as-of join (C16 oracle)
        "stream_heavy_hitters",  # B31: mergeable CMS state (D81 oracle)
        "stream_vocab_growth",  # B32: MIN-mergeable state (D82 oracle)
        "tokenizer_fertility",  # D83: per-source pieces-per-word
    )
    stale_r8 = (
        "sessionize", "stream_tumbling", "stream_hopping", "stream_dedup",
        "stream_stateful", "stream_stream_join", "stream_static_join",
        "stream_ohlc", "stream_dedup_incremental", "task_pipeline",
        "anomaly_zscore", "asof_cogroup", "curriculum_mix", "epoch_shuffle",
        "grouping_sets_revenue", "json_props_stats", "key_skew_profile",
        "line_dedup", "ngram_novelty", "price_discount_corr",
        "retention_cohorts", "salted_skew_agg", "sample_temperature",
        "source_mix", "source_vocab_overlap", "tfidf_top_terms",
        "token_count", "train_test_split",
    )
    green_r9 = (
        "q5_local_supplier", "q6_forecast", "q10_returned",
        "q12_delay_priority", "q13_order_distribution", "q15_top_supplier",
        "q17_small_qty_revenue", "q18_large_orders", "q19_discount_revenue",
        "q21_waiting_suppliers", "topk_orders_per_customer",
        "running_revenue", "event_deltas", "rollup_revenue",
        "cube_lineitem", "customers_with_orders", "customers_without_orders",
        "distinct_parts_per_supplier", "event_type_pivot",
        "asof_purchase_click", "clicks_before_purchase", "set_ops_customers",
        "explode_words", "daily_revenue", "scd2_history",
        "supplier_peak_load", "spending_percentiles", "time_weighted_avg",
        "ohlc_bars", "session_overlaps", "ann_lsh_buckets", "sketch_kmv",
        "text_stats", "lang_id", "doc_fingerprint", "token_entropy",
        "unigram_logprob", "vocab_topk", "bigram_counts", "decontaminate",
        "doc_chunks", "repetition_stats", "sequence_pack",
        "dedup_incremental", "dedup_simhash_pairs", "curriculum_quota",
        "stream_cdc_apply", "stream_outer_join", "stream_session_ttl",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn, graph,
                retrieval, governance, streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r12, *stale_r8, *green_r9):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r10/r11-green remainder; first-insertion order wins
    return out


def oracle_sql() -> dict[str, str]:
    from frolyk_spark.operators import (
        dedup, governance, graph, learn, multimodal, partsupp, pipeline,
        relational, retrieval, sampling, similarity, temporal, text, vocab,
    )
    from frolyk_spark.streaming import jobs as streaming_jobs
    from frolyk_spark.tasks import bridge

    out: dict[str, str] = {}
    out.update(governance.ORACLES)
    out.update(retrieval.ORACLES)
    out.update(graph.ORACLES)
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
