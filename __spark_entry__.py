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
    # in dict order under a wall-clock budget (~50 per round of the 179
    # registered entries). Rotation order is BY DRIVER-ROW AGE, red/new
    # FIRST (CLAUDE.md). The r10 driver burned its whole 50-row head green
    # (new_r10 + stale_r6 + 30 of green_r7); the five green_r7 tail entries
    # slipped to r11 as designed. So:
    #   1. new_r11 (23): bigram_lm_score (D79),
    #      stream_sample_weighted (B29),
    #      sample_weighted (D78),
    #      stream_corpus_filter (B28),
    #      stream_k_anonymity (B27),
    #      split_leakage_audit (D77),
    #      contrastive_pairs (D76),
    #      k_anonymity_audit + corpus_card (the
    #      governance block), stream_token_feed (B26, the streaming
    #      tokenize->pack feed), media_binary_ingest (E17, binaryFile source),
    #      stream_late_routing (B25, the late-data DLQ
    #      router), bm25_topk (D74, integer-quantized BM25),
    #      pagerank_parts (C67, integer-exact by
    #      construction), approx_stats_bounds (C14's first oracle-checked
    #      verdict row), the perceptual media-dedup family (D70-D73:
    #      image/audio/video pairs + CC clusters over the image graph),
    #      stream_cdc_versioned (B23 CDC-into-snapshots), and
    #      stream_media_dedup (B24 incremental perceptual probe) are
    #      brand new; bpe_train/bpe_encode changed OUTPUT this round
    #      (merge depth 6 -> 24) so their r10 rows no longer describe
    #      the current code;
    #   2. stale_r7 (5): the r10 budget slippage — newest green row is r7,
    #      the designated r11 head per the r10 verdict;
    #   3. green_r8 (50): the oldest block in the ledger — after this head
    #      burns, no entry's newest row predates r9 and the r8 block is
    #      fully cleared (the r10 verdict's "half" target, exceeded).
    # Head = 23+5+50 = 78 vs the ~50 budget; slippage (if any) falls on the
    # green_r8 tail, never a new or r7-stale entry.
    new_r11 = (
        "bigram_lm_score",         # D79: stupid-backoff LM scoring
        "stream_sample_weighted",  # B29: mergeable bottom-k sample state
        "sample_weighted",       # D78: deterministic weighted sample
        "stream_corpus_filter",  # B28: streaming ingest quality gate
        "stream_k_anonymity",    # B27: streaming privacy monitor
        "split_leakage_audit",   # D77: eval-hygiene leakage audit
        "contrastive_pairs",     # D76: triplet mining for embedding training
        "k_anonymity_audit",     # C68: re-identification risk audit
        "corpus_card",           # D75: per-source dataset card
        "stream_token_feed",     # B26: streaming tokenize->pack feed
        "media_binary_ingest",   # E17: binaryFile-source asset ingest
        "stream_late_routing",   # B25: watermark late-data side-output
        "bm25_topk",             # D74: integer-quantized BM25 retrieval
        "pagerank_parts",        # C67: integer-exact 8-round PageRank
        "approx_stats_bounds",   # C14 companion: sketch bounds verdict
        "image_dedup",           # D70: dHash near-dup over the decode path
        "audio_dedup",           # D71: sign-of-delta fingerprint twin
        "video_dedup_pairs",     # D72: frame-dHash parity fingerprint
        "media_dedup_clusters",  # D73: CC over the image pair graph
        "stream_cdc_versioned",  # B23: CDC into E14 versioned snapshots
        "stream_media_dedup",    # B24: incremental perceptual probe
        "bpe_train",             # D47: depth 6 -> 24 (new output)
        "bpe_encode",            # D52: same
    )
    stale_r7 = (
        "span_trim", "dsir_select", "decontaminate_bloom",
        "benchmark_leakage", "training_pipeline",
    )
    green_r8 = (
        "q1_pricing_summary", "q3_unshipped_revenue", "q4_order_priority",
        "q7_volume_shipping", "q8_market_share", "q9_product_profit",
        "q14_promo_revenue", "q2_min_cost_supplier", "q11_important_parts",
        "dedup_exact", "dedup_minhash", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_embedding", "ann_bruteforce",
        "minhash_containment", "containment_chains", "embedding_stats",
        "embedding_quantize", "multimodal_features", "mv_incremental_refresh",
        "table_diff", "line_dedup", "epoch_shuffle", "curriculum_mix",
        "sample_temperature", "train_test_split", "source_mix",
        "source_vocab_overlap", "ngram_novelty", "tfidf_top_terms",
        "token_count", "anomaly_zscore",
        "asof_cogroup", "grouping_sets_revenue", "json_props_stats",
        "key_skew_profile", "price_discount_corr", "retention_cohorts",
        "salted_skew_agg", "sessionize", "stream_tumbling", "stream_hopping",
        "stream_dedup", "stream_stateful", "stream_stream_join",
        "stream_static_join", "stream_ohlc", "stream_dedup_incremental",
        "task_pipeline",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn, graph,
                retrieval, governance, streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r11, *stale_r7, *green_r8):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r9/r10-green remainder; first-insertion order wins
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
