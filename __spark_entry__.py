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
    # in dict order under a wall-clock budget (~50 per round of the 203
    # registered entries; 199 oracle-checked + 4 documented no-oracle).
    # Rotation order is BY DRIVER-ROW AGE, red/new FIRST (CLAUDE.md). The
    # r14 driver burned exactly its designed head green: new_r14 (4) +
    # stale_r10 (45) + sequence_pack = 50. Freshness after r14: 50 at r14,
    # 49 at r13, 48 at r12, 49 at r11 — so:
    #   1. new_r15 (4): kcore_weighted (C75, strength-peel k-core off the
    #      C74 weighted artifact), l_diversity_audit (C68b, the
    #      attribute-disclosure companion to C68) and stream_l_diversity
    #      (B37, its counts-add streaming twin sharing the batch oracle)
    #      are brand new; graph_profile re-heads with a CHANGED OUTPUT
    #      (kind-keyed deg + strength histograms, r14 verdict item 5);
    #   2. changed_r15 (9): outputs bit-identical but code re-headed —
    #      the basket-pair kernel factoring (r14 verdict item 1) re-bases
    #      every co-purchase builder (kcore/triangle/components/
    #      pagerank_weighted and the B34/B36 per-batch builders;
    #      stream_edge_degrees additionally gained the live E21
    #      compaction cadence, item 4), and the ANN build/query split
    #      (item 3) re-bases ann_ivf/ann_pq/ann_eval on persisted fits;
    #   3. stale_r11 (49): the oldest block — every entry whose newest
    #      green row is r11 (pagerank_parts, also kernel-affected, is
    #      here). Head = 62 of the ~50 budget: slippage falls on this
    #      tail's END (the slipped entries head r16), never on a new or
    #      changed entry.
    new_r15 = (
        "kcore_weighted",      # C75: weighted k-core (strength peel)
        "l_diversity_audit",   # C68b: attribute-disclosure audit
        "stream_l_diversity",  # B37: counts-add twin (shares C68b oracle)
        "t_closeness_audit",   # C68c: integer-TVD distribution-skew audit
        "graph_profile",       # C72: + strength histogram (changed output)
    )
    changed_r15 = (
        "stream_edge_degrees",  # B34: kernel + live E21 cadence
        "stream_components",    # B36: kernel
        "kcore_parts", "triangle_parts", "components_parts",  # kernel
        "pagerank_weighted",    # C74: kernel
        "ann_ivf", "ann_pq", "ann_eval",  # persisted index fits
    )
    stale_r11 = (
        "pagerank_parts",  # kernel-affected: burn first in the tail
        "ann_bruteforce", "approx_stats_bounds", "audio_dedup",
        "benchmark_leakage", "bigram_lm_score", "bm25_topk", "bpe_encode",
        "bpe_train", "containment_chains", "contrastive_pairs",
        "corpus_card", "decontaminate_bloom", "dedup_embedding",
        "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
        "dedup_simhash", "dsir_select", "embedding_quantize",
        "embedding_stats", "image_dedup", "k_anonymity_audit",
        "media_binary_ingest", "media_dedup_clusters",
        "minhash_containment", "multimodal_features",
        "mv_incremental_refresh", "q11_important_parts", "q14_promo_revenue",
        "q1_pricing_summary", "q2_min_cost_supplier", "q3_unshipped_revenue",
        "q4_order_priority", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "sample_weighted", "span_trim",
        "split_leakage_audit", "stream_cdc_versioned",
        "stream_corpus_filter", "stream_k_anonymity", "stream_late_routing",
        "stream_sample_weighted", "stream_token_feed", "table_diff",
        "training_pipeline", "video_dedup_pairs",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn, graph,
                retrieval, governance, streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r15, *changed_r15, *stale_r11):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r12/r13/r14-green remainder; first insertion wins
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
