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
    # in dict order under a wall-clock budget (~50 per round of the 200
    # registered entries; 196 oracle-checked + 4 documented no-oracle).
    # Rotation order is BY DRIVER-ROW AGE, red/new FIRST (CLAUDE.md). The
    # r13 driver burned exactly its designed head green: new_r13 (12) +
    # green_r9 (36) + the first 2 of green_r10 (stream_topk,
    # stream_quarantine) = 50. Freshness after r13: 50 entries newest-green
    # at r13, 48 at r12, 49 at r11, 46 at r10 — so:
    #   1. new_r14 (4): stream_components (B36, incremental connected
    #      components over B34's basket-intact batches — contracted
    #      min-label merge per batch, shares C71's oracle),
    #      pagerank_weighted (C74, co-order-count-weighted integer
    #      PageRank) and ann_eval (D88, per-method ANN recall audit vs
    #      the D10 truth) are brand new; lsh_band_sweep re-heads because
    #      its output gained the ground-truth confusion columns
    #      (n_true/tp/fp/fn vs the D8 truth — the per-(b,r)
    #      precision/recall tuning closure, r13 verdict item 6);
    #   2. stale_r10 (45): the rest of the oldest block — every entry
    #      whose newest green row is r10 (lsh_band_sweep is listed in
    #      new_r14 instead). Head = 49 of the ~50 budget;
    #   3. after the r10 tail burns, the oldest remaining rows are r11
    #      (49 entries); budget slippage falls there, never on a new or
    #      r10-stale entry.
    new_r14 = (
        "stream_components",   # B36: incremental CC label state (C71 oracle)
        "pagerank_weighted",   # C74: weighted co-purchase PageRank
        "ann_eval",            # D88: per-method ANN recall audit (D10 truth)
        "lsh_band_sweep",      # D46: + per-(b,r) tp/fp/fn vs D8 truth
    )
    stale_r10 = (
        "ann_ivf", "ann_lsh", "ann_pq", "boilerplate_ngrams",
        "cluster_profile", "conversion_funnel", "corpus_filter",
        "cross_source_duplication", "data_quality_audit", "dedup_canonical",
        "dedup_clusters", "dup_span_coverage", "ewma_value",
        "feature_hash_embedding", "frame_sample", "funnel_fold",
        "lang_confusion", "length_histogram", "logreg_features",
        "market_basket", "markov_transitions", "media_decode",
        "media_resize", "minhash_jaccard_estimate", "multimodal_manifest",
        "order_value_quartiles", "pca_moments", "q16_parts_supplier_counts",
        "q20_concentrated_suppliers", "q22_idle_balance", "resample_gapfill",
        "rfm_segments", "salted_join_segments", "sample_per_source",
        "sample_stratified", "scd2_lookup", "semantic_dedup",
        "skyline_parts", "source_yield", "stream_anomaly",
        "stream_full_outer_join", "text_redact", "top_paths",
        "value_deciles", "video_decode",
    )
    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (pipeline, relational, partsupp, temporal, vocab, text,
                dedup, similarity, multimodal, sampling, learn, graph,
                retrieval, governance, streaming_jobs, bridge):
        registry.update(mod.QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in (*new_r14, *stale_r10):
        out[k] = registry[k]  # KeyError = stale rotation name, fail fast
    out.update(registry)  # r11/r12/r13-green remainder; first insertion wins
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
