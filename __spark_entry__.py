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
    # in dict order under a wall-clock budget (~50 per round of the 190
    # registered entries). Rotation order is BY DRIVER-ROW AGE, red/new
    # FIRST (CLAUDE.md). The r12 driver burned its whole head green
    # (new_r12 9 + stale_r8 28 + the first 13 of green_r9, through
    # event_deltas); 36 green_r9 entries slipped to r13 as designed. So:
    #   1. new_r13 (5): components_parts (C71, min-label connected
    #      components over the persisted co-purchase edges, unrolled
    #      fixed-round oracle + converged flag) and dedup_substring_trim
    #      (D84, ExactSubstr keep-earliest span removal sharing D80's
    #      maximal-run CTEs) are brand new; kcore_parts re-heads because
    #      its output gained the converged truncation-honesty column and
    #      its loop became the delta peel; stream_dedup_incremental and
    #      stream_media_dedup re-head because their sinks fused into the
    #      side-partitioned per-batch layout (outputs bit-identical, but
    #      changed code re-certifies first);
    #   2. green_r9 (36): the r12 budget slippage — newest green row is
    #      r9, the oldest block in the ledger and the r12 verdict's
    #      designated r13 head (rollup/cube/set-ops relational tail, the
    #      temporal block, the text/vocab tail, three streaming rows);
    #   3. green_r10 (14): after the r9 tail burns, the oldest remaining
    #      rows are r10; budget slippage falls here, never on a new or
    #      r9-stale entry.
    new_r13 = (
        "components_parts",      # C71: connected components + converged
        "dedup_substring_trim",  # D84: keep-earliest span removal
        "graph_profile",         # C72: degree/assortativity health card
        "dedup_eval",            # D85: LSH-vs-exact-truth confusion audit
        "stream_length_histogram",  # B33: mergeable histogram state (D35)
        "stream_edge_degrees",   # B34: incremental co-purchase graph
        "quantile_sketch",       # C73: histogram quantiles + exact audit
        "stream_quantile_sketch",  # B35: mergeable bin state (C73 oracle)
        "filter_funnel",         # D87: per-source cleaning-funnel counts
        "kcore_parts",           # C69: delta peel + converged column
        "stream_dedup_incremental",  # B17: fused side-partitioned sink
        "stream_media_dedup",        # B24: fused side-partitioned sink
    )
    green_r9 = (
        "rollup_revenue",
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
    green_r10 = (
        "stream_topk", "stream_quarantine", "stream_anomaly",
        "stream_full_outer_join", "q22_idle_balance", "value_deciles",
        "resample_gapfill", "salted_join_segments", "markov_transitions",
        "order_value_quartiles", "conversion_funnel", "funnel_fold",
        "q16_parts_supplier_counts", "q20_concentrated_suppliers",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn, graph,
                retrieval, governance, streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r13, *green_r9, *green_r10):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r10/r11/r12-green remainder; first insertion wins
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
