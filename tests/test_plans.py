"""Plan-shape assertions (SURVEY §6): pushdown, pruning, join strategy.

These guard the 100 TB posture that correctness tests can't see: a query
can return the right rows while scanning every column, skipping pushdown,
or force-broadcasting a fact-scaled table.
"""

import io
import re
from contextlib import redirect_stdout

import pytest as _pytest

from frolyk_spark.operators.relational import (
    q1_pricing_summary, q3_unshipped_revenue, q5_local_supplier, q6_forecast,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _formatted(q1_pricing_summary(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1), "shipdate filter must reach the scan"
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read is not None
    cols = {c.split(":")[0] for c in read.group(1).split(",") if c}
    # only the 7 referenced columns leave the parquet reader
    assert "l_orderkey" not in cols and "l_partkey" not in cols, f"unpruned scan: {cols}"
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q6_filter_pushdown(spark, sf_dir):
    plan = _formatted(q6_forecast(spark, sf_dir))
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_discount" in pushed.group(1)


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _formatted(q5_local_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "region/nation/supplier joins should broadcast"


def test_whole_stage_codegen(spark, sf_dir):
    # AQE hides codegen subtrees until execution; plan once without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            q1_pricing_summary(spark, sf_dir).explain("codegen")
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
        assert m and int(m.group(1)) >= 1, "q1 should run inside whole-stage codegen"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_no_forced_scaling_table_broadcast():
    """customer/supplier/part all scale linearly with data volume: no
    operator may pin them with a broadcast hint — AQE picks the strategy.
    Only fixed-cardinality region/nation may carry hints."""
    import frolyk_spark.operators.relational as rel
    import inspect

    src = inspect.getsource(rel)
    for name in ("cust", "supp", "part"):
        assert f"F.broadcast({name}" not in src, f"forced broadcast of scaling table {name}"


def test_dedup_minhash_plan_shape(spark, sf_dir):
    """The LSH dedup must (a) never plan a cartesian product and (b) keep
    the minhash aggregation map-side combinable (partial_min before the
    doc_id exchange) — the properties that make it linear at 100 TB."""
    from frolyk_spark.operators.dedup import dedup_minhash

    plan = _formatted(dedup_minhash(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan, "minhash must combine map-side"


def test_ngram_jaccard_prefix_filter_plan(spark, sf_dir):
    """The set-similarity join must join on df-ordered PREFIX postings, not
    the full inverted index — the guard against hot posting lists at scale.
    The plan must carry the row_number ranking window and the
    prefix-length cutoff (rank <= n - ceil(t*n) + 1), and never a
    cartesian."""
    from frolyk_spark.operators.dedup import (
        _jaccard_prefix,
        _jaccard_shingled,
        dedup_ngram_jaccard,
    )

    # dedup_ngram_jaccard checkpoints the prefix stage (it feeds both join
    # sides), which truncates the final plan — so assert the prefix
    # properties on the pre-cut stage, and the join properties on the whole.
    prefix = _jaccard_prefix(_jaccard_shingled(spark, sf_dir))
    pplan = _formatted(prefix)
    assert "row_number" in pplan, "df-ordered prefix ranking must survive planning"
    logical = prefix._jdf.queryExecution().optimizedPlan().toString()
    assert "CEIL" in logical.upper(), "prefix-length cutoff filter must survive optimization"

    plan = _formatted(dedup_ngram_jaccard(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_block_join(spark, sf_dir):
    """The Hamming pair join must be driven by the (block_id, block_val)
    equi-join — pigeonhole blocking — never an all-pairs comparison, and
    the bit_count(xor) verify must run before the pair-distinct."""
    from frolyk_spark.operators.dedup import dedup_simhash_pairs

    plan = _formatted(dedup_simhash_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "block_val" in plan, "block keys must drive the join"
    assert "bit_count" in plan, "hamming verify must stay a JVM expression"


def test_unigram_logprob_combines_map_side(spark, sf_dir):
    """The vocab count must combine map-side (partial_count before the
    word exchange) — shuffled volume is the vocabulary, not the token
    stream — and the corpus total must broadcast, never collect."""
    from frolyk_spark.operators.text import unigram_logprob

    plan = _formatted(unigram_logprob(spark, sf_dir))
    assert "partial_count" in plan, "vocab count must combine map-side"
    assert "BroadcastExchange" in plan, "one-row total must broadcast"
    assert "CartesianProduct" not in plan


def test_unigram_logprob_hybrid_skew_join(spark, sf_dir):
    """The Zipf-head join must be a map-side BroadcastHashJoin (the
    bounded top-K head broadcasts; its huge postings never shuffle), and
    the tail branch must anti-filter head tokens map-side (broadcast
    LeftAnti) BEFORE any exchange — otherwise hot tokens would still be
    shuffled and only dropped at the tail join."""
    from frolyk_spark.operators.text import unigram_logprob

    plan = _formatted(unigram_logprob(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "vocab head must broadcast-join"
    assert plan.count("LeftAnti") >= 2, (
        "both the vocab tail and the tail token stream must be "
        "anti-filtered against the broadcast head"
    )
    # the only nested-loop join allowed is the one-row corpus total
    # broadcast into the final projection (formatted explain names each
    # node twice: once in the tree, once in the numbered details)
    import re

    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark gram-hash set is small by construction (it's an eval
    suite) and must broadcast; the corpus side probes it map-side — the
    corpus is never shuffled for the join."""
    from frolyk_spark.operators.pipeline import decontaminate

    plan = _formatted(decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "benchmark side must broadcast"
    assert "CartesianProduct" not in plan


def test_doc_chunks_map_only(spark, sf_dir):
    """Chunking is a per-row generator expression: zero shuffles, straight
    from scan to output."""
    from frolyk_spark.operators.pipeline import doc_chunks

    plan = _formatted(doc_chunks(spark, sf_dir))
    assert "Exchange" not in plan, "chunking must be map-only"


def test_retention_two_aggregate_shuffles_only(spark, sf_dir):
    from frolyk_spark.operators.relational import retention_cohorts

    plan = _formatted(retention_cohorts(spark, sf_dir))
    assert "Join" not in plan, "cohort assignment must ride the window, not a join"


def test_customer_join_strategy_is_planner_chosen(spark, sf_dir):
    """The optimized logical plan for q3 must carry no join hint on the
    customer side (broadcast of tiny inputs chosen by AQE/planner is fine)."""
    df = q3_unshipped_revenue(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in logical
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "customer" not in analyzed.lower() or "BROADCAST" not in analyzed


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """At 100 TB a selective dim-side predicate should also prune the fact
    side's SHUFFLE, not just its post-join rows — Spark's runtime bloom
    filter (on by default, spark.sql.optimizer.runtime.bloomFilter.enabled)
    injects a bloom_filter_agg over the filtered creation side and a
    might_contain probe into the fact scan once the application side
    crosses its 10 GB size threshold. The threshold is what keeps it off
    for tiny local data, so this test lowers it to simulate scale and
    asserts the rewrite actually fires on our join shape."""
    from pyspark.sql import functions as F

    from frolyk_spark.sources.catalog import load_table

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        logical = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in logical.lower() or "bloomfilter" in logical.lower()
        assert "might_contain" in logical.lower()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_thresh,
        )


def test_sequence_pack_distributed_cumsum(spark, sf_dir):
    """The global token-offset cumsum must NOT plan as a single-partition
    window (the driver-shaped bottleneck it exists to avoid): the window
    partitions on the hash-range bucket, and the prefix-offset table joins
    as a broadcast."""
    from frolyk_spark.operators.pipeline import sequence_pack

    plan = _formatted(sequence_pack(spark, sf_dir))
    assert "SinglePartition" not in plan, "global window would serialize the corpus"
    assert "BroadcastHashJoin" in plan, "prefix offsets must broadcast"


def test_dedup_incremental_no_cartesian(spark, sf_dir):
    """Incremental dedup joins new-batch bands against corpus bands on the
    (band_id, band_hash) equi-key — never a cartesian/nested-loop pair
    expansion."""
    from frolyk_spark.operators.dedup import dedup_incremental

    plan = _formatted(dedup_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_pack_offset_invariants(spark, sf_dir):
    """Exact global packing invariants: offsets start at 0, are contiguous
    (each doc starts where the previous one ends in hash order), and the
    final offset+len equals the corpus token total — i.e. the two-phase
    bucket cumsum is EXACTLY the single global cumsum it replaces."""
    from frolyk_spark.operators.pipeline import SEQ_LEN, sequence_pack

    rows = sequence_pack(spark, sf_dir).collect()
    by_offset = sorted(rows, key=lambda r: r.start_offset)
    assert by_offset[0].start_offset == 0
    pos = 0
    for r in by_offset:
        assert r.start_offset == pos, "offsets must be contiguous"
        assert r.seq_id == r.start_offset // SEQ_LEN
        assert r.offset_in_seq == r.start_offset % SEQ_LEN
        pos += r.n_tokens
    assert pos == sum(r.n_tokens for r in rows)


def test_vocab_topk_heap_not_global_sort(spark, sf_dir):
    """Top-K vocabulary must plan as TakeOrderedAndProject (per-partition
    heap + driver merge of K rows), never a global Sort, and the
    count/count_distinct pair must partial-aggregate map-side so the
    shuffle carries distinct words, not corpus tokens."""
    from frolyk_spark.operators.vocab import bigram_counts, vocab_topk

    for op in (vocab_topk, bigram_counts):
        plan = _formatted(op(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, f"{op.__name__}: top-K must be a heap"
        assert "partial_count" in plan, f"{op.__name__}: agg must map-side combine"


def test_new_corpus_ops_plan_shapes(spark, sf_dir):
    """r4 corpus-inventory ops keep the scale shapes: no cartesian or
    nested-loop joins anywhere; tfidf's per-source top-K is a keyed window
    (no global Sort-then-Limit over the vocabulary); the length histogram
    partial-aggregates map-side."""
    from frolyk_spark.operators.dedup import minhash_jaccard_estimate
    from frolyk_spark.operators.pipeline import (
        cross_source_duplication,
        length_histogram,
    )
    from frolyk_spark.operators.vocab import tfidf_top_terms

    for op in (minhash_jaccard_estimate, cross_source_duplication,
               tfidf_top_terms):
        plan = _formatted(op(spark, sf_dir))
        assert "CartesianProduct" not in plan, op.__name__
        # the one-row n_sources broadcast in tfidf is a legitimate
        # BroadcastNestedLoopJoin of a single-row frame; forbid NLJ for
        # the pair-producing ops only
        if op is not tfidf_top_terms:
            assert "BroadcastNestedLoopJoin" not in plan, op.__name__

    hist = _formatted(length_histogram(spark, sf_dir))
    assert "partial_count" in hist or "partial_sum" in hist, (
        "length_histogram must map-side combine"
    )


def test_boilerplate_ngrams_heap_topk(spark, sf_dir):
    """Top-K must be a TakeOrderedAndProject (per-partition heap), never a
    global sort; the two aggregation phases must both combine map-side."""
    from frolyk_spark.operators.pipeline import boilerplate_ngrams

    plan = _formatted(boilerplate_ngrams(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "top-K must be a heap, not a sort"
    assert "partial_count" in plan, "gram counts must combine map-side"
    assert "CartesianProduct" not in plan


def test_markov_transitions_single_window_shuffle(spark, sf_dir):
    """The lead() window partitions by user_id (one shuffle); the pair
    aggregation over ~25 keys must combine map-side on top of it."""
    from frolyk_spark.operators.relational import markov_transitions

    plan = _formatted(markov_transitions(spark, sf_dir))
    assert "partial_count" in plan, "transition counts must combine map-side"
    assert "CartesianProduct" not in plan


def test_json_props_pruned_scan(spark, sf_dir):
    """from_json extraction must not block column pruning: the scan reads
    only event_type and props."""
    from frolyk_spark.operators.relational import json_props_stats

    plan = _formatted(json_props_stats(spark, sf_dir))
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:500]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"event_type", "props"}, cols


def test_partsupp_family_plan_shapes(spark, sf_dir):
    """The derived-partsupp family (C47-C50) keeps the scale shapes: no
    cartesian products; part/region filters reach the parquet scans; Q2's
    decorrelation is a keyed window + top-100 heap; Q16's exclusion list
    is an anti-join; Q11's scalar is the one legitimate one-row
    nested-loop broadcast."""
    import re as _re

    from frolyk_spark.operators.partsupp import (
        q2_min_cost_supplier,
        q11_important_parts,
        q16_parts_supplier_counts,
        q20_concentrated_suppliers,
    )

    p2 = _formatted(q2_min_cost_supplier(spark, sf_dir))
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoopJoin" not in p2
    assert "TakeOrderedAndProject" in p2, "Q2 top-100 must be a heap"
    assert "row_number" in p2, "Q2 decorrelation must be a window rank"
    pushed = " ".join(_re.findall(r"PushedFilters: \[([^\]]*)\]", p2))
    assert "p_size" in pushed and "r_name" in pushed, pushed

    p11 = _formatted(q11_important_parts(spark, sf_dir))
    assert "CartesianProduct" not in p11
    # the broadcast one-row total may plan as BroadcastNestedLoopJoin —
    # legitimate for a single-row side; the lineage cut keeps the
    # lineitem aggregation from running twice (one Scan ExistingRDD feeds
    # both sides)
    assert p11.count("Scan parquet") == 0 or "lineitem" not in p11, (
        "per_part must be materialized once, not recomputed per side"
    )

    p16 = _formatted(q16_parts_supplier_counts(spark, sf_dir))
    assert "CartesianProduct" not in p16 and "BroadcastNestedLoopJoin" not in p16
    assert "LeftAnti" in p16, "exclusion list must be an anti-join"
    pushed16 = " ".join(_re.findall(r"PushedFilters: \[([^\]]*)\]", p16))
    assert "p_brand" in pushed16 and "s_acctbal" in pushed16, pushed16

    p20 = _formatted(q20_concentrated_suppliers(spark, sf_dir))
    assert "CartesianProduct" not in p20 and "BroadcastNestedLoopJoin" not in p20
    assert "LeftSemi" in p20, "qualifying suppliers must semi-join"
    pushed20 = " ".join(_re.findall(r"PushedFilters: \[([^\]]*)\]", p20))
    assert "p_name" in pushed20 and "r_name" in pushed20, pushed20


def test_source_vocab_overlap_equi_join(spark, sf_dir):
    """The pairwise intersection must be an equi-join on word (hash or
    sort-merge), never a nested-loop over postings; the postings side is
    materialized once (lineage cut) so the self-join doesn't re-run the
    explode+distinct twice."""
    from frolyk_spark.operators.vocab import source_vocab_overlap

    plan = _formatted(source_vocab_overlap(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 0, (
        "postings must come from the materialized cut, not a re-scan"
    )


def test_ngram_novelty_window_not_join_back(spark, sf_dir):
    """Document frequency comes from a count window PARTITION BY gram —
    one gram-keyed shuffle — not an aggregate-then-join-back (which would
    shuffle the postings by gram twice)."""
    from frolyk_spark.operators.pipeline import ngram_novelty

    plan = _formatted(ngram_novelty(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, (
        "df must come from a window, not a join-back"
    )
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan, "the per-doc reduce must combine map-side"


def test_plan_report_utility(spark, sf_dir):
    """frolyk_spark.plans: the user-facing pre-flight audit extracts the
    same facts these tests grep for, and assert_scale_shape enforces
    them (positive + negative paths)."""
    import pytest as _pytest

    from frolyk_spark.plans import assert_scale_shape, plan_report
    from frolyk_spark.operators.relational import q1_pricing_summary
    from frolyk_spark.sources.catalog import load_table

    q1 = q1_pricing_summary(spark, sf_dir)
    rep = plan_report(q1)
    assert not rep["has_cartesian"]
    assert any("l_shipdate" in p for p in rep["pushed_filters"])
    assert all(len(c) <= 7 for c in rep["read_schemas"])

    # guard passes for the good plan...
    assert_scale_shape(
        q1, require_pushed=("l_shipdate",), max_scan_columns=7, max_scans=1
    )

    # ...and fails for a genuine cartesian product
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").limit(5)
    nat = load_table(spark, sf_dir, "nation")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    bad = li.crossJoin(nat.hint("shuffle_replicate_nl"))
    with _pytest.raises(AssertionError, match="Cartesian"):
        assert_scale_shape(bad)

    # unpushed-filter detection: a filter on a computed expression can't
    # reach the scan
    from pyspark.sql import functions as F

    unpushed = load_table(spark, sf_dir, "lineitem").where(
        F.sqrt(F.col("l_quantity") + 1.0) > 100.0
    )
    with _pytest.raises(AssertionError, match="did not reach"):
        assert_scale_shape(unpushed, require_pushed=("nonexistent_col",))


def test_sample_per_source_partial_topk(spark, sf_dir):
    """D44's rank filter must plan as WindowGroupLimit (per-partition
    partial top-K before the exchange), one scan, one shuffle."""
    from frolyk_spark.operators.sampling import sample_per_source
    from frolyk_spark.plans import plan_report

    rep = plan_report(sample_per_source(spark, sf_dir))
    assert "WindowGroupLimit" in rep["plan"], "rank<=k must push a group limit"
    assert rep["scans"] == 1 and rep["exchanges"] == 1, (
        rep["scans"], rep["exchanges"],
    )


def test_plan_report_nested_types_and_bracketed_filters(spark, sf_dir):
    """plan_report must not truncate ReadSchema at nested type closers
    (array<float>) or PushedFilters at In(...)'s bracket."""
    from pyspark.sql import functions as F

    from frolyk_spark.plans import plan_report
    from frolyk_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")  # embedding: array<float>
    rep = plan_report(emb.select("vec_id", "embedding", "label"))
    assert {"vec_id", "embedding", "label"} in rep["read_schemas"], (
        rep["read_schemas"]
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isin("en", "de") & F.col("source").isNotNull()
    )
    rep2 = plan_report(docs.select("doc_id"))
    pushed = " ".join(rep2["pushed_filters"])
    assert "lang" in pushed and "source" in pushed, pushed


def test_r6_ops_plan_shapes(spark, sf_dir):
    """r6 operators keep the scale shapes. scd2_history: one user_id
    shuffle reused by all three windows (lag/row_number/lead), zero joins,
    pruned scan. supplier_peak_load: the sweep-line never forms interval
    pairs (no cartesian/NLJ), the orders join is on orderkey, and the
    delta aggregation combines map-side. dup_span_coverage: gram joins
    are equi-joins, no cartesian. semantic_dedup: the candidate self-join
    runs on the lineage-cut assignment (the pandas-UDF scan appears once,
    not once per join side)."""
    import re

    from frolyk_spark.operators.pipeline import dup_span_coverage
    from frolyk_spark.operators.similarity import _semantic_candidate_pairs
    from frolyk_spark.operators.temporal import scd2_history, supplier_peak_load
    from frolyk_spark.plans import assert_scale_shape, plan_report

    rep = assert_scale_shape(
        scd2_history(spark, sf_dir), forbid_nested_loop=True, max_scans=1
    )
    assert not rep["joins"], "SCD2 must be pure windows"
    assert len(re.findall(r"hashpartitioning\(user_id", rep["plan"])) == 1, (
        "the three windows must share ONE user_id exchange"
    )

    rep = assert_scale_shape(
        supplier_peak_load(spark, sf_dir), forbid_nested_loop=True
    )
    assert "partial_sum" in rep["plan"], "sweep deltas must combine map-side"

    assert_scale_shape(dup_span_coverage(spark, sf_dir), forbid_nested_loop=True)

    rep = plan_report(_semantic_candidate_pairs(spark, sf_dir))
    assert not rep["has_cartesian"]
    assert "FlatMapGroupsInPandas" in rep["plan"], (
        "verification must be the per-cluster matmul (applyInPandas), "
        "not a per-pair interpreted-HOF join"
    )
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", rep["plan"])) <= 1, (
        "one assignment UDF stage only"
    )


def test_r6_wave2_plan_shapes(spark, sf_dir):
    """spending_percentiles: the three rank windows must share ONE
    nationkey exchange (after the custkey aggregation's). quality_logreg
    scoring and feature_hash_embedding: map-side-combinable aggregation,
    no cartesian anywhere."""
    import re

    from frolyk_spark.operators.learn import quality_logreg
    from frolyk_spark.operators.relational import spending_percentiles
    from frolyk_spark.operators.text import feature_hash_embedding
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(spending_percentiles(spark, sf_dir))
    assert len(re.findall(r"hashpartitioning\(c_nationkey", rep["plan"])) == 1, (
        "rank windows must share one nationkey exchange"
    )

    rep = assert_scale_shape(feature_hash_embedding(spark, sf_dir))
    assert "partial_sum" in rep["plan"], "hashed sums must combine map-side"

    assert_scale_shape(quality_logreg(spark, sf_dir))


def test_containment_chains_recursion_reads_cut_edges(spark, sf_dir):
    """D57: the BFS closure must run over the LINEAGE-CUT edge frame — if
    the cut is dropped, the whole containment verify (parquet scans,
    shingle joins) reappears in the plan once per BFS level; after the
    cut the returned plan has no parquet scans at all."""
    from frolyk_spark.operators.dedup import containment_chains
    from frolyk_spark.plans import plan_report

    rep = plan_report(containment_chains(spark, sf_dir))
    assert not rep["has_cartesian"]
    assert rep["scans"] == 0, (
        f"recursion must read checkpointed edges, not recompute them: "
        f"{rep['scans']} scans"
    )


def test_timeseries_ops_share_one_exchange(spark, sf_dir):
    """C55/C56: the TWA lead window + per-user reduce must share ONE
    user_id exchange; the OHLC bar window + aggregate must share ONE
    (event_type, bar) partitioning. No joins anywhere."""
    import re

    from frolyk_spark.operators.temporal import ohlc_bars, time_weighted_avg
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(time_weighted_avg(spark, sf_dir), forbid_nested_loop=True)
    assert not rep["joins"]
    assert len(re.findall(r"hashpartitioning\(user_id", rep["plan"])) == 1

    rep = assert_scale_shape(ohlc_bars(spark, sf_dir), forbid_nested_loop=True)
    assert not rep["joins"]
    assert len(re.findall(r"hashpartitioning\(event_type", rep["plan"])) == 1


def test_media_decode_is_one_mapinpandas_pass(spark, sf_dir):
    """D58: the encode->decode round trip must be a single Arrow-batched
    pass over a two-column documents scan — no join, no exchange, payload
    bytes never shuffle."""
    from frolyk_spark.operators.multimodal import media_decode
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        media_decode(spark, sf_dir),
        forbid_nested_loop=True,
        max_scan_columns=2,
        max_scans=1,
    )
    assert not rep["joins"]
    assert "Exchange" not in rep["plan"], "decode pass must not shuffle"


def test_span_trim_scale_shape(spark, sf_dir):
    """D59: the trim must stay on equi-keyed shuffles — no cartesian, no
    nested loop, and the covered-position anti-join must be a real
    equi-join on (doc_id, p)."""
    from frolyk_spark.operators.pipeline import span_trim
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(span_trim(spark, sf_dir), forbid_nested_loop=True)
    assert "LeftAnti" in rep["plan"], "covered positions must anti-join"


def test_r7_wave2_plan_shapes(spark, sf_dir):
    """dsir_select: the bucket-count model (bounded at DSIR_BUCKETS rows by
    the hash range) must broadcast into the corpus probe — no corpus-keyed
    shuffle before the per-doc aggregation — and the one-row totals scalar
    is the only nested-loop. decontaminate_bloom: both the set-bit relation
    (bounded at BLOOM_M) and the benchmark hash set must broadcast; no
    cartesian. video_decode: one Arrow-batched pass over one scan, zero
    shuffles."""
    from frolyk_spark.operators.multimodal import video_decode
    from frolyk_spark.operators.pipeline import decontaminate_bloom, dsir_select
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(dsir_select(spark, sf_dir))
    assert rep["joins"].get("BroadcastHashJoin", 0) >= 1, (
        "bucket counts must broadcast into the gram probe"
    )
    assert rep["joins"].get("BroadcastNestedLoopJoin", 0) <= 1, (
        "only the one-row totals scalar may nested-loop"
    )

    rep = assert_scale_shape(
        decontaminate_bloom(spark, sf_dir), forbid_nested_loop=True
    )
    assert rep["joins"].get("BroadcastHashJoin", 0) >= 2, (
        "set bits and benchmark hashes must both broadcast"
    )
    assert not rep["joins"].get("SortMergeJoin") or (
        rep["joins"]["SortMergeJoin"] <= 2
    ), "per-doc rejoins only"

    rep = assert_scale_shape(video_decode(spark, sf_dir), max_scans=1)
    assert rep["exchanges"] == 0, "decode+sample must be one map-only pass"
    assert "MapInPandas" in rep["plan"]

    from frolyk_spark.operators.relational import data_quality_audit

    rep = assert_scale_shape(
        data_quality_audit(spark, sf_dir), forbid_nested_loop=True
    )
    assert "partial_sum" in rep["plan"], (
        "domain checks must combine map-side"
    )
    assert not rep["joins"].get("CartesianProduct")

    from frolyk_spark.operators.pipeline import training_pipeline

    assert_scale_shape(training_pipeline(spark, sf_dir), forbid_nested_loop=True)


def test_r7_wave3_plan_shapes(spark, sf_dir):
    """rfm_segments/ewma_value/top_paths/skyline_parts: aggregate-level
    windows only, no cartesians, heap top-K where a top-K exists.
    market_basket: the basket self-join is an equi-join (never a
    cartesian) and the singles/total frames broadcast. training_pipeline
    covered in wave2."""
    import re

    from frolyk_spark.operators.relational import (
        ewma_value, market_basket, rfm_segments, skyline_parts, top_paths,
    )
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(rfm_segments(spark, sf_dir))
    assert not rep["has_cartesian"]

    rep = assert_scale_shape(ewma_value(spark, sf_dir), max_scans=1)
    assert "partial_sum" in rep["plan"], "weighted sums must combine map-side"
    assert re.search(r"WindowGroupLimit", rep["plan"]), (
        "per-user top-K must prune before the sort materializes"
    )

    rep = assert_scale_shape(top_paths(spark, sf_dir), max_scans=1)
    assert rep["has_take_ordered"], "top-20 must be a heap, not a global sort"
    assert len(re.findall(r"hashpartitioning\(user_id", rep["plan"])) == 1, (
        "break flags and session ids must share ONE user_id exchange"
    )

    rep = assert_scale_shape(skyline_parts(spark, sf_dir))
    assert not rep["has_cartesian"]
    assert rep["joins"].get("SortMergeJoin", 0) + rep["joins"].get(
        "BroadcastHashJoin", 0
    ) >= 1, "frontier re-join must be an equi-join"

    rep = assert_scale_shape(market_basket(spark, sf_dir))
    assert not rep["has_cartesian"]
    assert rep["joins"].get("BroadcastHashJoin", 0) >= 2, (
        "singles and total supports must broadcast"
    )

    from frolyk_spark.operators.temporal import scd2_lookup

    rep = assert_scale_shape(scd2_lookup(spark, sf_dir), max_scans=2)
    assert not rep["joins"], (
        "the point-in-time lookup must be the union-window form — "
        "ANY join here means it regressed to the interval-predicate join"
    )
    assert len(re.findall(r"hashpartitioning\(user_id", rep["plan"])) <= 2, (
        "history build and lookup window must not multiply user_id exchanges"
    )


def test_line_dedup_scale_shape(spark, sf_dir):
    """D66: keep-first line dedup must stay on two equi-keyed exchanges
    (segment-hash window + doc rebuild) over ONE documents scan — no
    cartesian, no nested loop, no lineage recompute."""
    from frolyk_spark.operators.pipeline import line_dedup
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        line_dedup(spark, sf_dir), forbid_nested_loop=True, max_scans=1
    )
    assert "RunningWindowFunction" in rep["plan"] or "Window" in rep["plan"]


def test_epoch_shuffle_scale_shape(spark, sf_dir):
    """D67: the deterministic epoch shuffle must be ONE hash exchange into
    (epoch, shard) window groups over ONE documents scan — no global sort
    (SortExec outside the window partitioning would mean a single-range
    ordering), no join, no cartesian."""
    from frolyk_spark.operators.sampling import epoch_shuffle
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        epoch_shuffle(spark, sf_dir), forbid_nested_loop=True, max_scans=1
    )
    assert not rep["joins"]
    assert "Window" in rep["plan"]
    assert "rangepartitioning" not in rep["plan"].lower(), (
        "a range partitioning here means Spark planned a global sort — "
        "the shard rank must sort only within (epoch, shard) hash groups"
    )


def test_curriculum_mix_scale_shape(spark, sf_dir):
    """D68: the curriculum report is a 1-row stats broadcast back over the
    lineage-cut scan plus one map-side-combinable aggregate — no cartesian
    beyond the one-row scalar, no quantile/global sort, bounded scans."""
    from frolyk_spark.operators.sampling import curriculum_mix
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(curriculum_mix(spark, sf_dir), max_scans=1)
    assert "Window" not in rep["plan"], (
        "bins must come from the mean-relative integer test, not ntile"
    )


def test_curriculum_mix_bins_are_scale_free(spark):
    """The bin edges are multiples of the corpus mean: scaling every
    document count uniformly must not move any document across bins, and
    the keep decision must be independent of corpus size."""
    import pandas as pd
    from frolyk_spark.operators import sampling

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [" ".join(["w"] * (5 + 7 * (i % 8))) for i in range(40)],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "s"
    docs["n_chars"] = docs.text.str.len()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.to_parquet(os.path.join(d, "documents.parquet"))
        base = {
            r["bin"]: (r["n_docs"], r["n_kept"])
            for r in sampling.curriculum_mix(spark, d).collect()
        }
        # duplicate the corpus 3x with distinct ids: mean unchanged, so
        # per-bin doc counts must scale exactly 3x and the per-doc keep
        # decision for the original ids is unchanged (hash of doc_id)
        tripled = pd.concat(
            [docs.assign(doc_id=docs.doc_id + 1000 * k) for k in range(3)]
        )
        with tempfile.TemporaryDirectory() as d3:
            tripled.to_parquet(os.path.join(d3, "documents.parquet"))
            out3 = {
                r["bin"]: r["n_docs"]
                for r in sampling.curriculum_mix(spark, d3).collect()
            }
    assert {b: 3 * v[0] for b, v in base.items()} == out3


def test_mv_incremental_refresh_scale_shape(spark, sf_dir):
    """C64: the refresh plan (the returned frame) must read the COMPACT
    persisted state plus ONE delta scan of lineitem with the cutoff
    predicate pushed to parquet — no join, no cartesian; a second
    lineitem scan here would mean the merge recomputes the base corpus."""
    import re
    from frolyk_spark.operators.relational import mv_incremental_refresh
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        mv_incremental_refresh(spark, sf_dir),
        max_scans=2,  # state parquet + delta lineitem
        require_pushed=("l_shipdate",),
    )
    assert not rep["joins"]
    assert len(re.findall(r"lineitem", rep["plan"])) <= 2, (
        "refresh must not rescan the base corpus"
    )


def test_table_diff_scale_shape(spark, sf_dir):
    """C65: the reconciliation must be ONE full-outer sort-merge join on
    the key over ONE materialized snapshot (lineage-cut base read twice —
    a second orders scan would mean the cut regressed), no cartesian."""
    import re
    from frolyk_spark.operators.relational import table_diff
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        table_diff(spark, sf_dir), forbid_nested_loop=True, max_scans=1
    )
    assert rep["joins"].get("SortMergeJoin", 0) == 1, rep["joins"]
    assert len(re.findall(r"orders", rep["plan"])) <= 1, (
        "both diff sides must read the lineage-cut snapshot, not rescan"
    )


def test_tfidf_single_corpus_scan(spark, sf_dir):
    """r8 review regression: tf feeds both self-join sides and the source
    count — without the lineage cut the explode+aggregate ran three times
    (3 documents scans). Must be ONE scan feeding the materialized tf."""
    from frolyk_spark.operators.vocab import tfidf_top_terms
    from frolyk_spark.plans import assert_scale_shape

    assert_scale_shape(tfidf_top_terms(spark, sf_dir), max_scans=1)


def test_curriculum_quota_scale_shape(spark, sf_dir):
    """D69: the joint (tier x source) quota shares D68's single lineage-cut
    scan (stats broadcast is the only join) and executes the exact-k as a
    partial top-K per window group (WindowGroupLimit) before one hash
    exchange — the same shapes its two parents are pinned to."""
    from frolyk_spark.operators.sampling import curriculum_quota
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(curriculum_quota(spark, sf_dir), max_scans=1)
    assert "WindowGroupLimit" in rep["plan"], "rank<=k must push a group limit"
    assert "rangepartitioning" not in rep["plan"].lower()


def test_ann_lsh_buckets_scale_shape(spark, sf_dir):
    """D11 companion: the bucket-occupancy view is one embeddings scan
    through the Arrow-batched bucketize UDF into one hash aggregation —
    no join, no cartesian, no global-sort surprises."""
    from frolyk_spark.operators.similarity import ann_lsh_buckets
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        ann_lsh_buckets(spark, sf_dir), forbid_nested_loop=True, max_scans=1
    )
    assert not rep["joins"]


def test_sketch_kmv_scale_shape(spark, sf_dir):
    """D45 companion: distinct words (two-phase hash agg) then the k-min
    registers via TakeOrderedAndProject — per-partition K-row heaps, no
    global sort, no single-partition window over the corpus."""
    from frolyk_spark.operators.vocab import sketch_kmv
    from frolyk_spark.plans import plan_report

    rep = plan_report(sketch_kmv(spark, sf_dir))
    assert rep["has_take_ordered"], "k-min registers must plan as TakeOrdered"
    assert rep["scans"] == 1 and not rep["joins"]


def test_session_overlaps_is_keyed_interval_join(spark, sf_dir):
    """C66: the interval-overlap join must plan as an EQUI-join on user_id
    (the key prunes; range predicates filter within the key's bursts) —
    never a cartesian or a broadcast nested loop over all interval pairs."""
    from frolyk_spark.operators.relational import session_overlaps
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(
        session_overlaps(spark, sf_dir), forbid_nested_loop=True
    )
    assert any(
        op in rep["joins"] for op in ("SortMergeJoin", "ShuffledHashJoin",
                                      "BroadcastHashJoin")
    ), rep["joins"]


def test_logreg_features_map_only_single_scan(spark, sf_dir):
    """D53 companion: the feature frame is one pruned scan and NO shuffle
    — lineage-cut map-only JVM expressions. (A shuffle or second scan
    here would multiply into every one of the GD steps that re-aggregate
    this frame.)"""
    from frolyk_spark.operators.learn import logreg_features
    from frolyk_spark.plans import assert_scale_shape, plan_report

    df = logreg_features(spark, sf_dir)
    rep = assert_scale_shape(df, max_scans=1, max_scan_columns=3)
    # the only exchanges allowed are the explicit spread repartition and
    # the output orderBy's range partitioning — never a hash aggregate
    assert "Exchange hashpartitioning" not in rep["plan"], rep["plan"][:1500]


def test_pca_moments_partial_aggregates_before_shuffle(spark, sf_dir):
    """D56 companion: the d²/2 pair fan-out must combine map-side — the
    shuffle carries only (i, j) partial sums (2080 groups x partitions),
    never the exploded pair rows. A missing partial agg here is the
    difference between shuffling ~2k rows and shuffling n·d²/2 rows at
    100 TB."""
    from frolyk_spark.operators.similarity import pca_moments
    from frolyk_spark.plans import plan_report

    rep = plan_report(pca_moments(spark, sf_dir))
    plan = rep["plan"]
    # both aggregations (mean pass + moment pass) are two-phase
    assert plan.count("partial_sum") >= 2, plan[:2000]
    assert not rep["has_cartesian"]


@_pytest.mark.parametrize(
    "opname", ["image_dedup", "audio_dedup", "video_dedup_pairs"]
)
def test_media_dedup_block_equi_join(spark, sf_dir, opname):
    """D70-D72: the perceptual-code pairing must be the pigeonhole block
    equi-join over the lineage-cut code frame — never an all-pairs
    comparison (the oracle goes all-pairs; the Spark side must not)."""
    from frolyk_spark.operators import multimodal
    from frolyk_spark.plans import assert_scale_shape

    op = getattr(multimodal, opname)
    rep = assert_scale_shape(op(spark, sf_dir), forbid_nested_loop=True)
    assert any(
        op_ in rep["joins"]
        for op_ in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), rep["joins"]
    assert "block_val" in rep["plan"], "join must key on the pigeonhole blocks"


def test_ann_ivf_nprobe_pruned_join(spark, sf_dir):
    """D11b (r10 verdict #8): candidate generation must stay the
    cluster-id equi-join against the broadcast (probe, cell) pairs — the
    nprobe/nlist pruning a refactor could silently degrade to a
    full-corpus rerank. The r10 oracle change touched only the SQL side;
    this pins the Spark plan."""
    from frolyk_spark.operators.similarity import ann_ivf
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(ann_ivf(spark, sf_dir), forbid_nested_loop=True)
    assert "BroadcastHashJoin" in rep["joins"], rep["joins"]
    assert "cluster" in rep["plan"], "candidates must join on the IVF cell id"


def test_ann_pq_lut_and_partial_topk(spark, sf_dir):
    """D40 (r10 verdict #8): ADC scoring must stay on the coded path —
    per-probe top-C planned as WindowGroupLimit (per-partition partial
    top-K before the exchange), exact rerank only on the C survivors,
    never a cartesian over probe x corpus floats."""
    from frolyk_spark.operators.similarity import ann_pq
    from frolyk_spark.plans import plan_report

    rep = plan_report(ann_pq(spark, sf_dir))
    assert "WindowGroupLimit" in rep["plan"], "top-C must push a group limit"
    assert not rep["has_cartesian"]


def test_approx_stats_bounds_no_distinct_expand(spark, sf_dir):
    """C14 companion (r11): the exact count(DISTINCT) must aggregate in
    its own pass — mixed into the sketch aggregate it routes the
    GK-percentile/HLL buffers through the distinct-Expand regroup over
    every key (measured 13 s vs 1.3 s at sf0.1). No Expand anywhere in
    the plan; both quantiles share one sketch (a single
    approx_percentile call)."""
    from frolyk_spark.operators.relational import approx_stats_bounds
    from frolyk_spark.plans import plan_report

    rep = plan_report(approx_stats_bounds(spark, sf_dir))
    assert "Expand" not in rep["plan"], "distinct rewrite leaked into the sketch pass"
    assert rep["plan"].count("approx_percentile") <= 2, "quantiles must share one sketch"


def test_distinct_sketch_regroup_guard(spark, sf_dir):
    """The r11 Expand trap as a FIRST-CLASS audit (r14): mixing
    count(DISTINCT) into an aggregate that also carries sketch buffers
    must fail assert_scale_shape loudly, while the correct two-pass
    shape (and plain rollup/cube Expands without sketch buffers) pass."""
    import pytest
    from pyspark.sql import functions as F

    from frolyk_spark.plans.inspect import assert_scale_shape
    from frolyk_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    # Spark 4 plans a SINGLE distinct without Expand (one-distinct
    # strategy); the rewrite that drags buffers through the regroup fires
    # from two distincts on (or one distinct combined with grouping
    # shapes that force RewriteDistinctAggregates) — use the two-distinct
    # form, the shape approx_stats_bounds originally shipped with (r11)
    bad = o.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.expr("approx_percentile(o_totalprice, 0.5)").alias("p50"),
    )
    with pytest.raises(AssertionError, match="per-distinct-key regroup"):
        assert_scale_shape(bad)
    # the correct shape: distinct in its own pass, crossJoined one-rows
    good = (
        o.agg(F.countDistinct("o_custkey").alias("n_cust"))
        .crossJoin(
            o.agg(F.expr("approx_percentile(o_totalprice, 0.5)").alias("p50"))
        )
    )
    assert_scale_shape(good, forbid_nested_loop=False)
    # grouping-set Expands WITHOUT sketch buffers stay legal
    from frolyk_spark.operators.relational import rollup_revenue

    assert_scale_shape(rollup_revenue(spark, sf_dir))
    # and a legitimate rollup + sketch buffer (Expand from GROUPING SETS,
    # not from the distinct rewrite — no gid attribute) must NOT trip the
    # guard (r14 review: the two Expand origins are distinguishable)
    rollup_sketch = (
        o.rollup("o_orderpriority")
        .agg(F.collect_set("o_orderstatus").alias("statuses"))
    )
    rep = assert_scale_shape(rollup_sketch)
    assert rep["has_expand"] and rep["has_object_aggregate"]
    assert not rep["has_distinct_expand"]


def test_cms_and_vocab_growth_plan_shapes(spark, sf_dir):
    """D81/D82: cartesian-free (the only nested-loop allowed is the
    broadcast of genuinely bounded state — the 1024-cell sketch and the
    one-row min/max bounds), and the corpus scan prunes to the text
    column(s) it needs."""
    from frolyk_spark.operators.vocab import heavy_hitters_cms, vocab_growth
    from frolyk_spark.plans import assert_scale_shape

    rep = assert_scale_shape(heavy_hitters_cms(spark, sf_dir))
    assert not rep["has_cartesian"]
    assert rep["has_take_ordered"], "top-K must plan as a heap, not a sort"
    rep2 = assert_scale_shape(vocab_growth(spark, sf_dir))
    assert not rep2["has_cartesian"]


def test_quantile_sketch_plan_shape(spark, sf_dir):
    """C73's plan must stay cartesian-free (the lo/hi crossJoin is a
    broadcast one-row scalar) and window-safe: the only orderBy-window
    runs over the bounded 256-row bin frame or a decile partition."""
    from frolyk_spark.operators.relational import quantile_sketch
    from frolyk_spark.plans import assert_scale_shape

    assert_scale_shape(quantile_sketch(spark, sf_dir), forbid_cartesian=False)
