"""Fixed-plan loop machinery (functions.loops, r15 optimization):
partition derivation, conf hygiene, and the one-exchange round-body
plan contract the iterative graph loops rely on."""

import os

import pytest
from pyspark.sql import functions as F

from frolyk_spark.functions.lineage import cut_lineage
from frolyk_spark.functions.loops import (
    LOOP_PARTITION_BYTES,
    fixed_plan_loop,
    loop_partitions,
)
from frolyk_spark.plans.inspect import plan_report

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_loop_partitions_core_floor_and_bytes_term(spark):
    """Concrete literal expectations (r15 ADVICE: the old form restated
    the implementation formula verbatim and could only catch a crash)."""
    cores = spark.sparkContext.defaultParallelism
    if cores < 6:
        pytest.skip("literal expectations assume cores//2 >= 3")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        # small state: the session setting (3) undercuts the core floor
        assert loop_partitions(spark, 0) == 3
        # bytes term dominates once the artifact crosses its multiples
        assert loop_partitions(spark, 5 * LOOP_PARTITION_BYTES) == 5
        assert loop_partitions(spark, 5 * LOOP_PARTITION_BYTES - 1) == 4
        assert loop_partitions(spark, 1000 * LOOP_PARTITION_BYTES) == 1000
        # below one unit the floor holds
        assert loop_partitions(spark, LOOP_PARTITION_BYTES - 1) == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_loop_partitions_respects_lowered_session_setting(spark):
    # a streaming foreachBatch body that pinned partitions=4 must keep 4
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        assert loop_partitions(spark, 0) == 4
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_loop_partitions_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOOP_PARTS", "7")
    assert loop_partitions(spark, 10**15) == 7


def test_min_label_propagation_honors_big_bytes(spark):
    """r15 verdict item 2: the min-label loop's partition count must scale
    with the persisted-artifact size its pairs derive from — observable as
    the returned label frame's partitioning (each round's output carries
    the loop's pinned count through the lazy checkpoint)."""
    from frolyk_spark.operators.dedup import min_label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    want = loop_partitions(spark, 0) + 5  # strictly above the core floor
    labels, converged = min_label_propagation(
        pairs, 5, big_bytes=want * LOOP_PARTITION_BYTES
    )
    assert converged
    assert labels.rdd.getNumPartitions() == want
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_sizes_loop_from_signature_artifact(spark, sf_dir, monkeypatch):
    """The dedup_clusters call site passes the persisted signature
    artifact's on-disk bytes into the CC core (r15 verdict item 2: an
    unsized loop pins the cores//2 floor with AQE off — a 100 TB spill
    risk)."""
    import frolyk_spark.operators.dedup as dd
    from frolyk_spark.functions.loops import dir_bytes

    seen = {}
    orig = dd.min_label_clusters

    def spy(pairs, *, big_bytes=0):
        seen["big_bytes"] = big_bytes
        return orig(pairs, big_bytes=big_bytes)

    monkeypatch.setattr(dd, "min_label_clusters", spy)
    dd.dedup_clusters(spark, sf_dir).collect()
    expect = dir_bytes(dd._minhash_signature_path(sf_dir))
    assert expect > 0
    assert seen["big_bytes"] == expect


def test_fixed_plan_loop_restores_confs_on_error(spark):
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )
    before = {k: spark.conf.get(k) for k in keys}
    with pytest.raises(RuntimeError):
        with fixed_plan_loop(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
            raise RuntimeError("boom")
    assert {k: spark.conf.get(k) for k in keys} == before


def test_round_body_runs_one_exchange(spark):
    """The loop contract the r15 graph rewrite claims: with the edge
    table cached pre-partitioned on the round join key and the state
    checkpointed (partitioning preserved through LogicalRDD), a
    PageRank-shaped round plans exactly ONE Exchange — the aggregate
    transport — and no broadcast of the edge side."""
    from frolyk_spark.operators.graph import persisted_copurchase_edges

    with fixed_plan_loop(spark) as nparts:
        edges = (
            persisted_copurchase_edges(spark, SF_DIR)
            .repartition(nparts, "src")
            .persist()
        )
        try:
            deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
            ranks = cut_lineage(
                deg.select(F.col("src").alias("part"), "outdeg").withColumn(
                    "r", F.lit(10**6)
                )
            )
            shares = ranks.select(
                F.col("part").alias("src"), F.expr("r div outdeg").alias("share")
            )
            inflow = (
                edges.join(shares, "src")
                .groupBy("dst")
                .agg(F.sum("share").alias("inflow"))
            )
            nxt = ranks.join(inflow, ranks.part == inflow.dst, "left").select(
                "part",
                "outdeg",
                (F.coalesce("inflow", F.lit(0)) + F.col("r")).alias("r"),
            )
            rep = plan_report(nxt)
            # exactly TWO exchanges in the printed plan: the round's
            # aggregate transport plus the ONE-TIME edge cache build
            # (InMemoryRelation prints its child plan, repartition
            # included, whether or not the cache is materialized — it
            # executes once, not per round)
            assert rep["exchanges"] == 2, rep
            assert rep["joins"].get("BroadcastHashJoin", 0) == 0, rep
            # the checkpointed state keeps its hash partitioning (the
            # property that makes the state-side joins exchange-free)
            from frolyk_spark.plans.inspect import _formatted

            plan = _formatted(nxt)
            assert "hashpartitioning(part" in plan, plan
        finally:
            edges.unpersist()
