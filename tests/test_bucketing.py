"""Bucketed co-located join (SURVEY §6): pre-bucketing both sides of a
recurring join on the join key removes the per-query shuffle entirely —
the 100 TB answer for fact-fact joins that run every day. Asserts the
physical plan contains NO shuffle exchange for the bucketed join while the
plain-parquet join has one."""

import io
import re
import uuid
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from frolyk_spark.sources.catalog import load_table, write_bucketed

BUCKETS = 8


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    ot, lt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    write_bucketed(load_table(spark, sf_dir, "orders"), ot, "o_orderkey", buckets=BUCKETS)
    write_bucketed(load_table(spark, sf_dir, "lineitem"), lt, "l_orderkey", buckets=BUCKETS)
    yield ot, lt
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    joined = (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    # at test scale the planner would broadcast the tiny side; disable that
    # so the plan shows what happens at fact-fact scale, where bucketing is
    # the thing that removes the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _explain(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, f"bucketed join must not shuffle:\n{join_section}"

    # results identical to the plain-parquet join
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_edge_store_bucketed_anti_join_shuffles_only_the_batch_side(spark, sf_dir):
    """B34 at scale (r13 verdict item 5): the per-batch keep-first
    anti-join probes the ACCUMULATED edge store — O(m) reshuffled per
    batch if the store is plain parquet. Compacted into an E2 bucketed
    table on the COMPOSITE join key (src, dst), the plan shuffles only
    the incoming batch: exactly one Exchange, none above the bucketed
    scan. The live operator keeps per-batch dirs (redelivery exclusion —
    an append-only bucketed table can't exclude a redelivered batch's own
    earlier write; see the BASELINE.md r14 ledger finding); this test
    pins the plan shape of the compaction target a 100 TB deployment
    would roll sealed batches into. Composite bucketing is load-bearing:
    bucketed on src alone, requireAllClusterKeysForCoPartition makes the
    store side exchange anyway."""
    from frolyk_spark.operators.graph import persisted_copurchase_edges

    edges = persisted_copurchase_edges(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    tname = f"edge_store_{suffix}"
    write_bucketed(edges, tname, ["src", "dst"], buckets=BUCKETS)
    try:
        store = spark.table(tname)
        # stand-in new pairs via a filter (a limit would add its own
        # GlobalLimit exchange and muddy the count)
        batch = edges.where(F.col("src") % 97 == 0).select("src", "dst")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _explain(batch.join(store, ["src", "dst"], "left_anti"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # count TREE nodes only ("+- Exchange"/":- Exchange") — formatted
        # explain repeats each node in the detail section below the tree
        n_exchanges = len(re.findall(r"[+:]- Exchange", plan))
        assert n_exchanges == 1, (
            f"expected one Exchange (batch side only):\n{plan}"
        )
        # and it sits on the batch side: the store-side subtree (the tree
        # section from its Sort down to the catalog scan) is exchange-free
        tree = plan.split("\n\n")[0]
        store_side = tree[tree.rfind("Sort"):]
        assert "Scan parquet spark_catalog" in store_side
        assert "Exchange" not in store_side
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Directory-partitioned parquet + a filter on the partition column:
    the scan must carry the predicate as a PartitionFilter (directory
    pruning — never opens non-matching files), and read back exactly the
    partition's rows."""
    from frolyk_spark.sources.catalog import write_partitioned

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    reread = write_partitioned(events, out, ["event_type"])

    filtered = reread.where(F.col("event_type") == "purchase")
    plan = _explain(filtered)
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "event_type" in pf.group(1), f"no partition pruning:\n{plan}"

    assert filtered.count() == events.where("event_type = 'purchase'").count()


def test_plain_join_does_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _explain(li.join(orders, li.l_orderkey == orders.o_orderkey))
        assert len(re.findall(r"\bExchange\b", plan)) >= 2, "unbucketed join should shuffle both sides"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dynamic_partition_overwrite_preserves_siblings(spark, sf_dir, tmp_path):
    """Re-writing one partition's data must replace exactly that partition
    and leave every other partition byte-identical — the incremental
    (daily re-ingest) story. Static mode would truncate the table root."""
    from frolyk_spark.sources.catalog import overwrite_partitions, write_partitioned

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    out = str(tmp_path / "events_incr")
    write_partitioned(events, out, ["event_type"])
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }

    # recompute one partition with fewer rows (a corrected re-ingest)
    purchases = events.where("event_type = 'purchase'").limit(10)
    reread = overwrite_partitions(purchases, out, ["event_type"])

    after = {
        r["event_type"]: r["n"]
        for r in reread.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert after["purchase"] == 10, "targeted partition must be replaced"
    for k, v in before.items():
        if k != "purchase":
            assert after[k] == v, f"sibling partition {k} must be untouched"


def test_write_compacted_sizes_files_from_plan_stats(spark, sf_dir, tmp_path):
    """Compaction derives the output file count from the optimizer's size
    estimate: a tiny target yields many files, a huge target collapses the
    same data to one file, and rows survive both round-trips."""
    import os

    from frolyk_spark.sources.catalog import write_compacted

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    n_rows = li.count()

    def parquet_files(p):
        return [f for f in os.listdir(p) if f.endswith(".parquet")]

    # the stats estimate for this 2-column projection is ~23 KB (column
    # pruning scales the footer stats), so an 8 KB target forces a split
    many = str(tmp_path / "many")
    reread = write_compacted(li, many, target_file_bytes=8 * 1024)
    assert reread.count() == n_rows
    assert len(parquet_files(many)) > 1, "small target must split into multiple files"

    one = str(tmp_path / "one")
    reread = write_compacted(li, one, target_file_bytes=1 << 40)
    assert reread.count() == n_rows
    assert len(parquet_files(one)) == 1, "huge target must compact to a single file"


def test_write_training_shards_round_trip(spark, sf_dir, tmp_path):
    """Shard writing: sequence boundaries never straddle shards, one file
    per shard directory (repartition-by-shard before partitionBy), and the
    packed rows survive the round trip exactly."""
    import os

    from frolyk_spark.operators.pipeline import sequence_pack
    from frolyk_spark.sources.catalog import write_training_shards

    packed = sequence_pack(spark, sf_dir)
    out = str(tmp_path / "shards")
    reread = write_training_shards(packed, out, seqs_per_shard=4)

    exp = {tuple(r) for r in packed.collect()}
    got = {tuple(r) for r in reread.drop("shard_id").collect()}
    assert got == exp, "packed rows must survive the shard round trip"

    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert len(shard_dirs) > 1, "small shard size must produce several shards"
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: one sequentially-written file per shard"

    # every sequence lives in exactly one shard
    import pyspark.sql.functions as F

    straddle = (
        reread.groupBy("seq_id")
        .agg(F.count_distinct("shard_id").alias("n_shards"))
        .where(F.col("n_shards") > 1)
        .count()
    )
    assert straddle == 0, "a training sequence must never straddle shards"


def test_write_zordered_tightens_both_columns(spark, sf_dir, tmp_path):
    """E9: z-order clustering must give every output file a tight min/max
    envelope on BOTH clustered columns (the property parquet row-group /
    file skipping uses), where a single-column sort tightens only one.
    Also: round-trip preserves rows exactly."""
    import os

    from frolyk_spark.sources.catalog import write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "events_z")
    back = write_zordered(ev, out, ("user_id", "value"), n_files=16)

    # round-trip: same rows, no z/helper columns leaked
    assert back.columns == ["event_id", "user_id", "value"]
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 8, files

    # per-file spans: read each file alone, compare to the global span
    glob = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("su"),
        (F.max("value") - F.min("value")).alias("sv"),
    ).collect()[0]
    spans_u, spans_v = [], []
    for f in files:
        r = (
            spark.read.parquet(os.path.join(out, f))
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("su"),
                (F.max("value") - F.min("value")).alias("sv"),
            )
            .collect()[0]
        )
        spans_u.append(r.su / glob.su)
        spans_v.append(r.sv / glob.sv)
    mean_u = sum(spans_u) / len(spans_u)
    mean_v = sum(spans_v) / len(spans_v)
    # 16 files on a 2-D curve ≈ 4x4 grid: each file should cover roughly
    # a quarter of each dimension; 0.6 is a generous bound that still
    # fails for an unclustered or single-column-sorted layout (~1.0 on
    # at least one dimension)
    assert mean_u < 0.6, f"user_id not clustered: mean span {mean_u:.2f}"
    assert mean_v < 0.6, f"value not clustered: mean span {mean_v:.2f}"


def test_collect_file_stats_indexes_zordered_layout(spark, sf_dir, tmp_path):
    """E10: the per-file stats index is one distributed pass (no driver
    loop), covers every file, and over a z-ordered layout shows the
    tight per-file envelopes a planner would prune with."""
    import os

    from frolyk_spark.sources.catalog import collect_file_stats, write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "events_z_stats")
    write_zordered(ev, out, ("user_id", "value"), n_files=16)

    stats = collect_file_stats(spark, out, ("user_id", "value"))
    rows = stats.collect()
    n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert len(rows) == n_files
    assert sum(r.n_rows for r in rows) == ev.count()
    # stats usable for pruning: a point query on the hottest user should
    # match only a fraction of files by min/max envelope
    target = ev.agg(F.max("user_id")).collect()[0][0]
    matching = [r for r in rows if r.min_user_id <= target <= r.max_user_id]
    assert len(matching) < n_files, "stats must discriminate between files"


def test_zorder_bit_fold_matches_reference(spark):
    """The JVM Morton fold in write_zordered must equal the textbook
    bit-interleave; checked against a Python reference over a range of
    rank pairs including the 16-bit extremes."""
    from pyspark.sql import functions as F

    def morton_ref(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0),
             (0, 65535), (12345, 54321), (257, 4096), (43690, 21845)]
    df = spark.createDataFrame(pairs, "ra long, rb long")
    z = (
        "aggregate(sequence(0, 15), 0L, (acc, i) -> "
        "acc | shiftleft(shiftright(ra, i) & 1L, 2 * i) "
        "    | shiftleft(shiftright(rb, i) & 1L, 2 * i + 1))"
    )
    got = {(r.ra, r.rb): r.z for r in df.withColumn("z", F.expr(z)).collect()}
    for a, b in pairs:
        assert got[(a, b)] == morton_ref(a, b), (a, b)


def test_merge_upsert_updates_inserts_and_preserves_siblings(spark, sf_dir, tmp_path):
    """E11: MERGE-style upsert must (a) replace rows whose key is in the
    batch, (b) append new keys, (c) leave untouched partitions
    byte-identical (their files are not rewritten), and (d) be idempotent
    under at-least-once redelivery (re-merging the same batch changes
    nothing) — the foreachBatch CDC-sink contract."""
    import os

    from frolyk_spark.sources.catalog import merge_upsert, write_partitioned

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_merge")
    write_partitioned(events, out, ["event_type"])

    def files_of(part):
        d = os.path.join(out, f"event_type={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    base_n = spark.read.parquet(out).count()
    # update stays in its key's own partition (merge_upsert's documented
    # partition-stability contract); pick an untouched sibling dynamically
    row0 = events.where("event_id = 0").first()
    untouched = next(
        t
        for (t,) in events.select("event_type").distinct().collect()
        if t not in (row0.event_type, "purchase")
    )
    untouched_before = files_of(untouched)

    updates = spark.createDataFrame(
        [
            (0, 999, row0.event_type, 1.5),   # update: event_id 0 exists
            (10_000_000, 7, "purchase", 2.5),  # insert: brand-new key
        ],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    merged = merge_upsert(updates, out, key="event_id", partition_col="event_type")

    assert merged.count() == base_n + 1, "one insert, updates replace in place"
    got = {r.event_id: r for r in merged.where("event_id in (0, 10000000)").collect()}
    assert got[0].user_id == 999 and got[0].event_type == row0.event_type
    assert got[10_000_000].user_id == 7
    assert files_of(untouched) == untouched_before, "untouched partition rewritten"

    # idempotent retry: same batch again -> same table
    again = merge_upsert(updates, out, key="event_id", partition_col="event_type")
    assert again.count() == base_n + 1
    assert {r.event_id: r.user_id for r in again.where("event_id in (0, 10000000)").collect()} == {
        0: 999, 10_000_000: 7,
    }


def test_read_pruned_skips_files_and_matches_full_scan(spark, sf_dir, tmp_path):
    """E12: the stats-index read must return EXACTLY the full-scan
    predicate result while reading fewer files over a clustered layout,
    and degrade gracefully (correct, possibly unpruned) over random
    layouts; an empty selection reads zero files and zero rows."""
    from frolyk_spark.sources.catalog import (
        collect_file_stats, read_pruned, write_zordered,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "events_z_prune")
    write_zordered(ev, out, ("user_id", "value"), n_files=16)
    stats = collect_file_stats(spark, out, ("user_id", "value"))
    n_files = stats.count()

    lo, hi = 3, 7  # a narrow user_id band over the clustered column
    pruned, files = read_pruned(spark, out, stats, "user_id", lo, hi)
    full = spark.read.parquet(out).where(F.col("user_id").between(lo, hi))
    assert len(files) < n_files, "clustered layout must let files prune"
    assert pruned.count() == full.count()
    assert pruned.exceptAll(full).count() == 0

    # out-of-domain range: nothing to read
    empty, none = read_pruned(spark, out, stats, "user_id", 10**12, 10**12 + 1)
    assert none == [] and empty.count() == 0


def test_merge_upsert_rejects_duplicate_keys_in_batch(spark, sf_dir, tmp_path):
    """E11: a batch carrying two rows for one key has no defined winner
    (no order column) — merge_upsert must fail loudly, like Delta's
    MERGE on multiple matches, never write duplicate keys silently."""
    import pytest

    from frolyk_spark.sources.catalog import merge_upsert, write_partitioned

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_dupkey")
    write_partitioned(events, out, ["event_type"])
    dup = spark.createDataFrame(
        [(0, 1, "view", 1.0), (0, 2, "view", 2.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    with pytest.raises(ValueError, match="distinct"):
        merge_upsert(dup, out, key="event_id", partition_col="event_type")


def test_read_evolved_unions_schemas_and_nulls_old_files(spark, sf_dir, tmp_path):
    """E13: files written before a column existed must read as NULL for
    it under read_evolved; a plain read sampling one footer can silently
    drop the new column; a cross-file TYPE conflict must fail loudly."""
    import pytest

    from frolyk_spark.sources.catalog import read_evolved

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.mode("append").parquet(out)

    df = read_evolved(spark, out)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}

    # type conflict: score re-lands as string -> must raise, not coerce
    spark.createDataFrame([(3, "c", "oops")], "id bigint, name string, score string").write.mode(
        "append"
    ).parquet(out)
    with pytest.raises(Exception, match="[Mm]erge|[Ss]chema|[Tt]ype"):
        read_evolved(spark, out).collect()


def test_versioned_snapshots_commit_read_rollback(spark, sf_dir, tmp_path):
    """E14 manifest log: commits are atomic snapshots (readers see exactly
    one manifest's file list), time travel reads any retained version,
    rollback is a new version referencing the old files, and a lost
    O_EXCL race retries at the next version."""
    import os

    from frolyk_spark.sources.catalog import (
        read_versioned, rollback_versioned, vacuum_versioned, write_versioned,
    )

    out = str(tmp_path / "vtable")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    v0 = write_versioned(ev.where(F.col("event_id") % 2 == 0), out)
    v1 = write_versioned(ev, out)
    assert (v0, v1) == (0, 1)
    n_all = ev.count()
    n_even = ev.where(F.col("event_id") % 2 == 0).count()
    assert read_versioned(spark, out).count() == n_all  # latest
    assert read_versioned(spark, out, 0).count() == n_even  # time travel
    # rollback restores v0's content as v2 without touching files
    v2 = rollback_versioned(out, 0)
    assert v2 == 2
    assert read_versioned(spark, out).count() == n_even
    # a pre-existing manifest (lost race) forces a retry at the next slot
    pre = os.path.join(out, "_manifests", "v3.json")
    with open(pre, "w") as f:
        f.write('{"version": 3, "files": []}')
    v4 = write_versioned(ev.limit(5), out)
    assert v4 == 4
    os.remove(pre)


def test_versioned_vacuum_keeps_referenced_files(spark, sf_dir, tmp_path):
    """Vacuum drops old manifests and every unreferenced data file
    (including crash-orphaned staging dirs) but keeps files a RETAINED
    rollback manifest still references — retained versions stay readable."""
    import os

    from frolyk_spark.sources.catalog import (
        read_versioned, rollback_versioned, vacuum_versioned, write_versioned,
    )

    out = str(tmp_path / "vtable2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    write_versioned(ev.limit(50), out)                  # v0
    write_versioned(ev.limit(10), out)                  # v1
    rollback_versioned(out, 0)                          # v2 -> v0's files
    os.makedirs(os.path.join(out, "data", ".stage-orphan"), exist_ok=True)
    deleted = vacuum_versioned(out, keep_last=2, grace_seconds=0)  # keep v1, v2
    # v0's manifest went, the orphan staging dir went
    assert any("v0.json" in d for d in deleted)
    assert any(".stage-orphan" in d for d in deleted)
    # v2 (rollback) still references v0's FILES, so they must survive
    assert read_versioned(spark, out, 2).count() == 50
    assert read_versioned(spark, out, 1).count() == 10
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, out, 0)


def test_versioned_snapshots_random_op_sequence_matches_model(spark, tmp_path):
    """Model-based check: a seeded random interleaving of commit /
    rollback / vacuum must leave the manifest log equivalent to a plain
    Python model (version -> expected row count; vacuum retires versions
    older than the retention window). Catches protocol drift the
    scenario tests can't (e.g. rollback-of-rollback, vacuum right after
    rollback, vacuum twice)."""
    import random

    from frolyk_spark.sources.catalog import (
        read_versioned, rollback_versioned, vacuum_versioned, write_versioned,
    )

    rng = random.Random(20260814)
    out = str(tmp_path / "vmodel")
    model: dict[int, int] = {}  # version -> row count
    live: list[int] = []        # versions still readable
    for step in range(14):
        op = rng.choice(["commit", "commit", "rollback", "vacuum"])
        if op == "commit" or not live:
            n = rng.randrange(1, 40)
            v = write_versioned(spark.range(n), out)
            assert v == max(model, default=-1) + 1
            model[v] = n
            live.append(v)
        elif op == "rollback":
            src = rng.choice(live)
            v = rollback_versioned(out, src)
            model[v] = model[src]
            live.append(v)
        else:
            keep = rng.randrange(1, 4)
            vacuum_versioned(out, keep_last=keep, grace_seconds=0)
            live = sorted(live)[-keep:]
        # the latest read always matches the newest model version
        newest = max(model)
        assert read_versioned(spark, out).count() == model[newest]
        # every retained version reads its exact model count
        for v in live:
            assert read_versioned(spark, out, v).count() == model[v]
        # a vacuumed version must be gone, not wrong
        for v in sorted(set(model) - set(live)):
            with pytest.raises(FileNotFoundError):
                read_versioned(spark, out, v)


def test_versioned_vacuum_grace_window_spares_inflight_files(spark, tmp_path):
    """An unreferenced data file YOUNGER than the grace window may belong
    to a commit whose manifest hasn't published yet — vacuum must leave it
    (and young staging dirs) alone; only aged orphans are reclaimed."""
    import os
    import time

    from frolyk_spark.sources.catalog import vacuum_versioned, write_versioned

    out = str(tmp_path / "vgrace")
    write_versioned(spark.range(5), out)
    young = os.path.join(out, "data", "deadbeef-part-inflight.parquet")
    with open(young, "wb") as f:
        f.write(b"not yet manifested")
    old = os.path.join(out, "data", "cafebabe-part-orphan.parquet")
    with open(old, "wb") as f:
        f.write(b"crashed long ago")
    aged = time.time() - 7200
    os.utime(old, (aged, aged))
    deleted = vacuum_versioned(out, keep_last=1)  # default grace window
    assert old in deleted
    assert not os.path.exists(old)
    assert os.path.exists(young), "in-flight file inside grace must survive"


def test_versioned_concurrent_commits_get_distinct_complete_versions(
    spark, tmp_path
):
    """Four threads committing simultaneously must each win a DISTINCT
    version (the link-into-place claim is put-if-absent), and every
    published manifest must be complete — each version reads back exactly
    the row count its committer wrote."""
    from concurrent.futures import ThreadPoolExecutor

    from frolyk_spark.sources.catalog import read_versioned, write_versioned

    out = str(tmp_path / "vconc")
    counts = [11, 22, 33, 44]

    def commit(n):
        return n, write_versioned(spark.range(n), out)

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(commit, counts))
    versions = [v for _, v in results]
    assert sorted(versions) == [0, 1, 2, 3], versions
    for n, v in results:
        assert read_versioned(spark, out, v).count() == n


def test_pipeline_summary_snapshots_and_rolls_back(spark, sf_dir, tmp_path):
    """Integration of D65 × E14: commit the composed pipeline's summary as
    a snapshot, commit a narrowed re-run as the next version, and RESTORE —
    the table reads back exactly the first run's rows."""
    from frolyk_spark.operators.pipeline import training_pipeline
    from frolyk_spark.sources.catalog import (
        read_versioned, rollback_versioned, write_versioned,
    )

    out = str(tmp_path / "pipeline_summary")
    full = training_pipeline(spark, sf_dir)
    v0 = write_versioned(full, out)
    narrowed = full.where(F.col("predicted_lang") == "en")
    v1 = write_versioned(narrowed, out)
    assert (v0, v1) == (0, 1)
    assert read_versioned(spark, out).count() == narrowed.count()
    rollback_versioned(out, 0)
    got = sorted(map(tuple, read_versioned(spark, out).collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want


def test_versioned_manifest_dir_tolerates_stray_files(spark, tmp_path):
    """ADVICE r7: a non-numeric 'v*.json' name in _manifests (editor
    backup, stray note) must be ignored by version listing, not crash
    every read/commit with ValueError; and vacuum on a table whose data/
    directory is absent must be a clean no-op."""
    import os

    from frolyk_spark.sources.catalog import (
        read_versioned, vacuum_versioned, write_versioned,
    )

    out = str(tmp_path / "tbl")
    write_versioned(spark.range(3).toDF("id"), out)
    with open(os.path.join(out, "_manifests", "vNEXT.json"), "w") as fh:
        fh.write("not a manifest")
    # listing skips the stray name: read and a second commit both work
    assert read_versioned(spark, out).count() == 3
    write_versioned(spark.range(5).toDF("id"), out)
    assert read_versioned(spark, out).count() == 5

    # manifest-only state: no data/ directory — vacuum must no-op
    bare = str(tmp_path / "bare")
    os.makedirs(os.path.join(bare, "_manifests"))
    assert vacuum_versioned(bare, keep_last=1, grace_seconds=0) == []


def test_merge_upsert_rejects_null_keys_with_clear_error(spark, tmp_path):
    """r8 review regression: a null merge key used to surface as a
    MISLEADING duplicate-key error (count_distinct ignores nulls); it is
    its own failure — a null key can never be superseded by the anti-join."""
    import pytest
    from pyspark.sql import functions as F

    from frolyk_spark.sources.catalog import merge_upsert

    path = str(tmp_path / "t")
    base = spark.range(5).select(
        F.col("id").alias("k"), F.lit("a").alias("v"),
        (F.col("id") % 2).alias("p"),
    )
    base.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(0, "b", 0), (None, "c", 1), (3, "d", 1)], "k bigint, v string, p bigint"
    )
    with pytest.raises(ValueError, match="non-null"):
        merge_upsert(updates, path, key="k", partition_col="p")


def test_dynamic_partition_pruning_fires_on_dim_filter(spark, sf_dir, tmp_path):
    """DPP — the RUNTIME half of partition pruning: a fact table
    partitioned on the join key, joined to a dim whose filter is only
    knowable at plan time through the join, must prune fact partitions
    via a dynamicpruning subquery instead of scanning the whole fact.
    At 100 TB this is the classic star-join lever (scan one region's
    partitions, not the world) and it only works when the fact is
    PARTITIONED on the join key — which is why write_partitioned exists."""
    from pyspark.sql import functions as F

    from frolyk_spark.sources.catalog import load_table, write_partitioned

    out = str(tmp_path / "cust_by_nation")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("int").alias("nk")
    )
    fact = write_partitioned(cust, out, ["nk"])
    dim = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").cast("int").alias("nk"), "n_name")
    )
    joined = fact.join(dim, "nk").groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n")
    )
    # run FIRST, then read the final adaptive plan: pre-execution
    # executedPlan() under AQE is not yet final and the dpp subquery's
    # presence there is timing-dependent (observed flaky)
    got = {r.n_name: r.n for r in joined.collect()}
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, f"DPP did not fire:\n{plan[:2000]}"
    want = {
        r.n_name: r.n
        for r in load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .groupBy("n_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and got


def test_read_changes_between_snapshots(spark, sf_dir, tmp_path):
    """E16: the change feed between two E14 snapshots classifies exactly
    the drifted keys (added / removed / changed on exact integer images)
    and nothing else — time travel + C65's reconciliation as one API."""
    from pyspark.sql import functions as F

    from frolyk_spark.sources.catalog import (
        load_table, read_changes, write_versioned,
    )

    out = str(tmp_path / "orders_versioned")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(floor(o_totalprice * 100.0d + 0.5d) as bigint)").alias(
            "price_c"
        ),
    )
    r = F.pmod("o_orderkey", F.lit(100))
    v1 = write_versioned(base.where(r != 1), out)                  # key%100==1 "added" later
    v2 = write_versioned(
        base.where(r != 0).withColumn(                             # key%100==0 removed
            "price_c",
            F.col("price_c") + F.when(r.isin(2, 3), F.lit(100)).otherwise(F.lit(0)),
        ),
        out,
    )
    changes = read_changes(spark, out, v1, v2, "o_orderkey", ["price_c"])
    got = {r_.o_orderkey: r_._change for r_ in changes.collect()}
    n = base.count()
    assert got, "test data must produce drift"
    for k, status in got.items():
        m = k % 100
        want = {0: "removed", 1: "added", 2: "changed", 3: "changed"}[m]
        assert status == want, (k, status, want)
    # completeness: every drifted key is reported, no unchanged key is
    want_n = base.where(r.isin(0, 1, 2, 3)).count()
    assert len(got) == want_n
    # row images carry through: a changed key shows the +100 delta
    ch = changes.where(F.col("_change") == "changed").limit(1).collect()[0]
    assert ch.price_c_after - ch.price_c_before == 100


def test_read_changes_null_keys_and_membership_only(spark, tmp_path):
    """r9 review regressions on the change feed: (a) a null-keyed row
    present only in v_from must classify as REMOVED (presence markers, not
    key-value null tests — the full-outer join never matches null keys);
    (b) empty compare_cols = membership-only feed, matched keys unchanged."""
    from pyspark.sql import functions as F

    from frolyk_spark.sources.catalog import read_changes, write_versioned

    out = str(tmp_path / "t")
    v1 = write_versioned(
        spark.createDataFrame([(1, 10), (None, 99), (2, 20)], "k int, v int"), out
    )
    v2 = write_versioned(
        spark.createDataFrame([(1, 11), (3, 30)], "k int, v int"), out
    )
    got = {
        (r.k, r._change)
        for r in read_changes(spark, out, v1, v2, "k", ["v"]).collect()
    }
    assert got == {(None, "removed"), (2, "removed"), (3, "added"), (1, "changed")}
    # membership-only: value drift on matched keys is ignored
    got2 = {
        (r.k, r._change)
        for r in read_changes(spark, out, v1, v2, "k", []).collect()
    }
    assert got2 == {(None, "removed"), (2, "removed"), (3, "added")}


def test_versioned_txn_markers_and_mixed_lineage(spark, tmp_path):
    """E14 txn markers (r11): committed_txns maps each txn to the newest
    version that committed it; plain (txn-less) commits coexist in the
    same lineage and are simply absent from the map — backward compatible
    with pre-txn manifests."""
    from frolyk_spark.sources.catalog import (
        committed_txns, read_versioned, write_versioned,
    )

    out = str(tmp_path / "txn_table")
    df = spark.range(5).withColumnRenamed("id", "k")
    v0 = write_versioned(df, out)                      # plain commit
    v1 = write_versioned(df.limit(3), out, txn="b0")
    v2 = write_versioned(df.limit(1), out, txn="b1")
    txns = committed_txns(out)
    assert txns == {"b0": v1, "b1": v2}
    assert v0 not in txns.values()
    # a re-commit of the same txn (the at-least-once window) maps to the
    # NEWEST version — last-writer-wins for consumers that do re-commit
    v3 = write_versioned(df.limit(2), out, txn="b1")
    assert committed_txns(out)["b1"] == v3
    assert read_versioned(spark, out, v1).count() == 3


def test_bloom_pruned_point_lookup_skips_files(spark, sf_dir, tmp_path):
    """E18: the Bloom-index point-lookup must return EXACTLY the full-scan
    equality result while reading fewer files than the layout holds (the
    range-stats index can't help here: an unclustered hash layout gives
    every file the full key envelope); an absent key prunes everything or
    costs only false-positive file reads that the exact predicate empties;
    no filter row exceeds the BLOOM_M geometry."""
    from frolyk_spark.sources.catalog import (
        BLOOM_M, collect_file_bloom, read_bloom_pruned,
    )

    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    out = str(tmp_path / "orders_bloom")
    # hash-scatter into many files: the worst case for min/max envelopes,
    # the exact case a Bloom index exists for
    ords.repartition(16, "o_custkey").write.parquet(out)
    bloom = collect_file_bloom(spark, out, "o_orderkey")
    n_files = bloom.count()
    assert n_files > 1
    assert all(len(r["bits"]) <= BLOOM_M for r in bloom.collect())

    probe = ords.select("o_orderkey").first()["o_orderkey"]
    hit, files = read_bloom_pruned(spark, out, bloom, "o_orderkey", probe)
    full = spark.read.parquet(out).where(F.col("o_orderkey") == probe)
    assert 0 < len(files) < n_files, "point probe must skip most files"
    assert sorted(tuple(r) for r in hit.collect()) == sorted(
        tuple(r) for r in full.collect()
    )

    # absent key: every surviving read (if any false positive) is empty
    miss, miss_files = read_bloom_pruned(
        spark, out, bloom, "o_orderkey", -987654321
    )
    assert miss.count() == 0
    assert len(miss_files) < n_files


def test_bloom_build_rejects_unrenderable_key_types(spark, sf_dir, tmp_path):
    """E18 (r13 advice): a float/date/bool-keyed index must be rejected AT
    BUILD TIME — the probe-side TypeError alone fired far from the
    misconfiguration, after a silently-desynchronized index was already
    built and stored."""
    import pytest

    from frolyk_spark.sources.catalog import collect_file_bloom

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    out = str(tmp_path / "li_bloom")
    li.write.parquet(out)
    with pytest.raises(TypeError, match="int or string"):
        collect_file_bloom(spark, out, "l_quantity")  # double
    with pytest.raises(TypeError, match="int or string"):
        collect_file_bloom(spark, out, "l_shipdate")  # date
    with pytest.raises(ValueError, match="not found"):
        collect_file_bloom(spark, out, "no_such_col")


def test_shallow_clone_zero_copy_and_independent_evolution(spark, sf_dir, tmp_path):
    """E19: a shallow clone copies NO data bytes (only a manifest), reads
    back the cloned snapshot exactly, evolves independently of the source
    (new commits land under the clone's own data/), and vacuuming the
    clone never deletes source files."""
    import os

    from frolyk_spark.sources.catalog import (
        clone_versioned, committed_txns, read_versioned, vacuum_versioned,
        write_versioned,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    write_versioned(ev.where(F.col("event_id") % 2 == 0), src)
    write_versioned(ev, src)

    v = clone_versioned(src, dst, version=0)
    assert v == 0
    # zero copy: the clone has a manifest but no data files of its own
    assert not os.path.isdir(os.path.join(dst, "data")) or not any(
        n.endswith(".parquet") for n in os.listdir(os.path.join(dst, "data"))
    )
    n_even = ev.where(F.col("event_id") % 2 == 0).count()
    assert read_versioned(spark, dst).count() == n_even
    # provenance rides the txn marker
    assert any(t.startswith("clone:") for t in committed_txns(dst))

    # independent evolution: a commit on the clone doesn't touch the source
    write_versioned(ev.limit(7), dst)
    assert read_versioned(spark, dst).count() == 7
    assert read_versioned(spark, src).count() == ev.count()
    # the cloned snapshot is still time-travelable on the clone
    assert read_versioned(spark, dst, 0).count() == n_even

    # vacuum on the clone (keep only its newest) must not delete ANY
    # source file: the source still reads back in full at every version
    vacuum_versioned(dst, keep_last=1, grace_seconds=0.0)
    assert read_versioned(spark, src).count() == ev.count()
    assert read_versioned(spark, src, 0).count() == n_even
    assert read_versioned(spark, dst).count() == 7


def test_compact_versioned_rewrites_latest_snapshot(spark, sf_dir, tmp_path):
    """E20: compaction commits a new version with identical content in
    fewer files, leaves every retained older version readable from its
    original files, records provenance in the txn marker, and the small
    originals are reclaimed only by a later vacuum."""
    import json
    import os

    from frolyk_spark.sources.catalog import (
        committed_txns, compact_versioned, read_versioned, vacuum_versioned,
        write_versioned,
    )

    out = str(tmp_path / "ctable")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    # simulate a per-batch streaming writer: many-file commits
    write_versioned(ev.where(F.col("event_id") % 2 == 0).repartition(6), out)
    v1 = write_versioned(ev.repartition(8), out)

    def manifest_files(v):
        with open(os.path.join(out, "_manifests", f"v{v}.json")) as f:
            return json.load(f)["files"]

    assert len(manifest_files(v1)) == 8
    v2 = compact_versioned(spark, out, target_files=1)
    assert v2 == v1 + 1
    assert len(manifest_files(v2)) == 1
    # bit-identical content, old versions intact, provenance recorded
    key = lambda df: sorted((r.event_id, r.event_type) for r in df.collect())
    assert key(read_versioned(spark, out, v2)) == key(read_versioned(spark, out, v1))
    assert read_versioned(spark, out, 0).count() == ev.where(
        F.col("event_id") % 2 == 0
    ).count()
    assert committed_txns(out).get(f"compact:v{v1}") == v2
    # vacuum to the compacted version: the 8 small files become orphans
    n_before = len(os.listdir(os.path.join(out, "data")))
    vacuum_versioned(out, keep_last=1, grace_seconds=0.0)
    n_after = len(os.listdir(os.path.join(out, "data")))
    assert n_after < n_before
    assert key(read_versioned(spark, out)) == key(read_versioned(spark, out, v2))


def test_delete_vectors_logical_then_physical_erasure(spark, sf_dir, tmp_path):
    """E22 (r15): row-level deletes via position delete vectors, then
    partition-granular physical purge — the GDPR-erasure lifecycle.
    (1) delete_where tombstones without touching data files and the
    logical read equals the predicate filter immediately; (2) deletes
    COMPOSE (a second overlapping delete adds only the new rows);
    (3) purge_deletes rewrites ONLY the touched partitions (untouched
    partition files keep their names), drops the DV sidecar, and the
    RAW read then equals the logical one; (4) a stale tombstone
    referencing a purged file name is a harmless no-op — the crash-safe
    property the purge ordering relies on."""
    import os
    import shutil

    from frolyk_spark.sources.catalog import (
        DELETES_DIR, delete_where, purge_deletes, read_with_deletes,
        write_partitioned,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    path = str(tmp_path / "docs_e22")
    write_partitioned(docs, path, ["lang"])
    base_count = docs.count()
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert len(langs) >= 3
    victim = sorted(langs)[0]

    # (1) logical delete: one lang's short docs
    n1 = delete_where(spark, path, f"lang = '{victim}' AND length(text) < 200")
    want1 = docs.where(f"NOT (lang = '{victim}' AND length(text) < 200)").count()
    assert n1 > 0
    assert read_with_deletes(spark, path).count() == want1 == base_count - n1
    # data files untouched so far
    assert os.path.isdir(os.path.join(path, DELETES_DIR))
    raw_after_delete = spark.read.parquet(path).count()
    assert raw_after_delete == base_count

    # (2) composition: overlapping predicate adds only the new rows
    n2 = delete_where(spark, path, f"lang = '{victim}'")
    victim_total = docs.where(f"lang = '{victim}'").count()
    assert n1 + n2 == victim_total
    assert read_with_deletes(spark, path).count() == base_count - victim_total

    # snapshot untouched-partition file names before the purge
    keep = sorted(langs)[1]
    keep_files = set(os.listdir(os.path.join(path, f"lang={keep}")))

    # (3) physical purge: only the victim partition rewrites
    n_parts = purge_deletes(spark, path, ["lang"])
    assert n_parts == 1
    assert not os.path.isdir(os.path.join(path, DELETES_DIR))
    assert set(os.listdir(os.path.join(path, f"lang={keep}"))) == keep_files
    assert spark.read.parquet(path).count() == base_count - victim_total
    assert read_with_deletes(spark, path).count() == base_count - victim_total
    # the victim partition is physically empty (dynamic overwrite wrote
    # zero rows for it) or gone entirely
    vdir = os.path.join(path, f"lang={victim}")
    if os.path.isdir(vdir):
        assert spark.read.parquet(path).where(f"lang = '{victim}'").count() == 0

    # (4) stale tombstones (dead file names) are no-ops
    dead = spark.createDataFrame(
        [(os.path.join(path, f"lang={victim}", "part-dead.parquet"), 0)],
        "_file string, _pos bigint",
    )
    ddir = os.path.join(path, DELETES_DIR, "d0")
    dead.write.mode("overwrite").parquet(ddir)
    assert read_with_deletes(spark, path).count() == base_count - victim_total
    shutil.rmtree(os.path.join(path, DELETES_DIR))


def test_delete_vectors_plan_is_distributed(spark, sf_dir, tmp_path):
    """E22 scale shape: the DV-masked read is a distributed anti-join on
    (file, position) — audited by assert_scale_shape, and the delete's
    predicate scan keeps pushdown (PushedFilters on the base columns)."""
    from frolyk_spark.plans.inspect import assert_scale_shape
    from frolyk_spark.sources.catalog import (
        delete_where, read_with_deletes, write_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "ev_e22")
    write_partitioned(ev, path, ["event_type"])
    assert delete_where(spark, path, "value < 10") >= 0
    assert_scale_shape(read_with_deletes(spark, path), forbid_cartesian=True)


def test_delete_vector_slot_publish_is_atomic(spark, sf_dir, tmp_path):
    """r15 review: concurrent delete_where calls must not clobber each
    other's committed tombstones — the DV publishes via private-build +
    rename, and a taken d{n} slot bumps to the next free one."""
    import os

    from frolyk_spark.sources.catalog import (
        DELETES_DIR, delete_where, read_with_deletes, write_partitioned,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = str(tmp_path / "docs_race")
    write_partitioned(docs, path, ["lang"])
    n0 = delete_where(spark, path, "length(text) < 150")
    assert n0 > 0
    # simulate a rival call having already claimed the next slot
    rival = os.path.join(path, DELETES_DIR, "d1")
    os.makedirs(rival)
    with open(os.path.join(rival, "blocker"), "w") as fh:
        fh.write("x")
    n1 = delete_where(spark, path, "length(text) < 300")
    assert os.path.isdir(os.path.join(path, DELETES_DIR, "d2"))
    want = docs.where("length(text) >= 300").count()
    assert read_with_deletes(spark, path).count() == want
    assert n0 + n1 == docs.where("length(text) < 300").count()


def test_purge_deletes_survives_hive_escaped_partition_values(spark, tmp_path):
    """r15 review: partition values containing Hive-escaped characters
    (':' -> %3A in the dir name) and NULLs must round-trip through purge
    — values are derived from the DATA, never parsed from dir segments;
    a mismatch would have classified the partition as fully erased and
    destroyed its surviving rows."""
    from frolyk_spark.sources.catalog import (
        delete_where, purge_deletes, read_with_deletes, write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a:b", 10), (2, "a:b", 200), (3, None, 10), (4, None, 300),
         (5, "plain", 10)],
        "id bigint, src string, v bigint",
    )
    path = str(tmp_path / "esc")
    write_partitioned(df, path, ["src"])
    assert delete_where(spark, path, "v < 100") == 3
    assert purge_deletes(spark, path, ["src"]) == 3
    left = {(r.id, r.src) for r in spark.read.parquet(path).collect()}
    assert left == {(2, "a:b"), (4, None)}
    assert {(r.id, r.src) for r in read_with_deletes(spark, path).collect()} == left


def test_purge_deletes_survives_type_canonicalizing_partition_values(spark, tmp_path):
    """r15 second review (reproduced pre-fix): partition-type inference
    canonicalizes a string dir value ('01' -> int 1), so survivors were
    rewritten into a NEW dir while the stale original kept its files and
    re-emerged after DV cleanup — resurrecting deleted rows AND
    duplicating survivors. Inference is disabled for the purge span."""
    from frolyk_spark.sources.catalog import (
        delete_where, purge_deletes, read_with_deletes, write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "01", 10), (2, "01", 200), (3, "2", 10), (4, "2", 300)],
        "id bigint, src string, v bigint",
    )
    import os

    path = str(tmp_path / "canon")
    write_partitioned(df, path, ["src"])
    assert delete_where(spark, path, "v < 100") == 2
    assert purge_deletes(spark, path, ["src"]) == 2
    # the survivors stayed in their ORIGINAL dirs — no src=1 ghost dir
    dirs = {d for d in os.listdir(path) if d.startswith("src=")}
    assert dirs == {"src=01", "src=2"}
    # read back with inference off so the partition values are the
    # verbatim dir strings (the test's own read must not canonicalize)
    prev = spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    try:
        left = {(r.id, r.src) for r in spark.read.parquet(path).collect()}
        assert left == {(2, "01"), (4, "2")}
        logical = {
            (r.id, r.src) for r in read_with_deletes(spark, path).collect()
        }
        assert logical == left
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", prev
        )
