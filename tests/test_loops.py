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
    cores = spark.sparkContext.defaultParallelism
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # small state: the floor is min(session setting, cores // 2)
    assert loop_partitions(spark, 0) == max(min(cur, max(1, cores // 2)), 1)
    # large artifact: the bytes term dominates (guide §2.2 sizing)
    big = 1000 * LOOP_PARTITION_BYTES
    assert loop_partitions(spark, big) == 1000


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
