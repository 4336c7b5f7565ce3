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
    # in dict order under a wall-clock budget (~50 per round of the 148
    # registered entries). Rotation order is BY DRIVER-ROW AGE, red/new
    # FIRST (CLAUDE.md): the r7 driver consumed exactly the first 50
    # r7-rotation entries (through sample_stratified, CORRECTNESS_r07),
    # leaving the 42 entries below whose newest green row is r3/r4:
    #   1. new_r8 (6): operators added this round — need their FIRST row;
    #   2. rewritten_r7 (3): code rewritten in r7 AFTER their newest (r6)
    #      row — the rewrite itself is what needs a driver check;
    #   3. rewritten_r8 (16): ratio rounding moved to the portable floor
    #      form this round (output changes at .5 boundaries);
    #   4. stale_r3 (16): newest green row is r3 — the streaming family,
    #      the task bridge, flagship q1/q3, and the core dedup block;
    #   5. stale_r4 (26): newest green row is r4 — the TPC-H q4..q21
    #      tail, tokenizer aggs, incremental dedup;
    #   6. the r6/r7-green remainder via registry order (all ≤2 rounds
    #      old; whatever budget remains refreshes the head of it).
    # Head = 6+3+16+16+26 = 67 vs the ~50 budget: entries that slip are
    # the TAIL of stale_r4 (r4-green, unchanged, re-verified locally at
    # three SFs this round), never a new/rewritten one.
    stale_r3 = (
        "train_test_split", "stream_tumbling", "stream_hopping",
        "stream_dedup", "sessionize", "stream_stateful",
        "stream_stream_join", "stream_static_join", "task_pipeline",
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
    new_r8 = (
        "stream_dedup_incremental",  # B17: continuous-ingest minhash probe
        "line_dedup",                # D66: CCNet line-granularity dedup
        "epoch_shuffle",             # D67: deterministic epoch shuffle/shards
        "curriculum_mix",            # D68: quality-tier curriculum sampling
        "mv_incremental_refresh",    # C64: incremental MV maintenance
        "table_diff",                # C65: snapshot reconciliation diff
    )
    # The r7 rewrites needing a post-rewrite row: OHLC full-width key,
    # BFS closure, LSH cap on containment pairs:
    rewritten_r7 = ("stream_ohlc", "containment_chains", "minhash_containment")
    # Rewritten IN r8 after their newest row (portable floor rounding on
    # derived ratios — the r5 .xxxx5 divergence class, caught by this
    # round's review and then swept across every remaining
    # engine-round-of-ratio site — plus tfidf's lineage cut). Entries
    # already in stale_r3/r4 (q1, q14, q8, q17, repetition_stats,
    # dedup_ngram_jaccard, dedup_embedding) are not repeated here:
    rewritten_r8 = (
        "q2_min_cost_supplier", "q11_important_parts",
        "source_vocab_overlap", "tfidf_top_terms",
        "source_mix", "sample_temperature", "ngram_novelty",
        "json_props_stats", "anomaly_zscore", "key_skew_profile",
        "ann_bruteforce", "embedding_stats", "embedding_quantize",
        "multimodal_features", "token_count", "price_discount_corr",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn,
                streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r8, *rewritten_r7, *rewritten_r8, *stale_r3, *stale_r4):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # green_r6/r7 remainder; first-insertion order wins
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
