"""File-backed task.start lifecycle (A11 shape + A14 recovery, no broker):
a running topology consumes file "topics", produced messages land in the
sink exactly once, and a restart resumes from the checkpoint."""

import json
import os
import shutil
import uuid

import pytest

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "filetasks")


@pytest.fixture()
def workdir():
    d = os.path.join(SCRATCH, uuid.uuid4().hex[:8])
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "part int, offset bigint, kind string, amount double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_file_task_lifecycle_exactly_once(spark, workdir):
    from frolyk_spark.tasks.task import Task

    in_dir = os.path.join(workdir, "orders_topic")
    sink = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")

    task = Task(group="file-task")
    src = task.source("orders_topic")

    def setup(assignment):
        def route(message, context):
            v = message["value"]
            if v["kind"] == "big":
                assignment.send(
                    {"topic": "big_orders", "key": str(v["offset"]), "value": {"amount": v["amount"]}}
                )
            return context.abandon

        return route

    task.processor(src, setup)

    _write(spark, in_dir, [(i % 2, i, "big" if i % 3 == 0 else "small", float(i)) for i in range(30)])
    schema = spark.read.parquet(in_dir).schema

    def run():
        queries = task.start_files(
            spark,
            topic_dirs={"orders_topic": in_dir},
            schemas={"orders_topic": schema},
            partition_col="part",
            offset_col="offset",
            checkpoint_root=ckpt,
            sink_dir=sink,
        )
        for q in queries:
            q.awaitTermination()
        task.stop()

    run()
    out1 = spark.read.parquet(sink)
    keys1 = sorted(int(r.key.decode()) for r in out1.collect())
    assert keys1 == [i for i in range(30) if i % 3 == 0]
    assert set(r.topic for r in out1.select("topic").distinct().collect()) == {"big_orders"}
    # payloads survive the wire encoding
    amounts = {int(r.key.decode()): json.loads(r.value.decode())["amount"] for r in out1.collect()}
    assert amounts[27] == 27.0

    # restart with new data: only the new file is processed (committed
    # offsets recovered), nothing is reprocessed or lost
    _write(spark, in_dir, [(i % 2, i, "big", float(i)) for i in range(30, 36)])
    run()
    keys2 = sorted(int(r.key.decode()) for r in spark.read.parquet(sink).collect())
    assert keys2 == sorted([i for i in range(30) if i % 3 == 0] + list(range(30, 36)))


def test_epoch_overwrite_makes_retry_idempotent(spark, workdir):
    """Crash after the sink write but before the epoch commit (a raising
    batch hook), then restart: Spark re-runs the epoch, and the epoch-keyed
    overwrite must leave the sink unchanged — no duplicates, no loss."""
    import pytest

    from frolyk_spark.tasks.task import Task

    in_dir = os.path.join(workdir, "t")
    sink = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")

    task = Task(group="retry-task")
    src = task.source("t")

    def setup(assignment):
        def fwd(message, context):
            assignment.send({"topic": "out", "key": str(message["value"]["offset"]), "value": "x"})
            return context.abandon

        return fwd

    task.processor(src, setup)
    _write(spark, in_dir, [(0, i, "k", 1.0) for i in range(10)])
    schema = spark.read.parquet(in_dir).schema

    def run(hook=None):
        qs = task.start_files(
            spark, topic_dirs={"t": in_dir}, schemas={"t": schema},
            partition_col="part", offset_col="offset",
            checkpoint_root=ckpt, sink_dir=sink, batch_hook=hook,
        )
        for q in qs:
            q.awaitTermination()
        task.stop()

    def crash_once(topic, epoch_id):
        raise RuntimeError("simulated crash between sink write and commit")

    with pytest.raises(Exception, match="simulated crash"):
        run(hook=crash_once)
    # the sink write itself survived the "crash"
    assert sorted(int(r.key.decode()) for r in spark.read.parquet(sink).collect()) == list(range(10))

    run()  # restart: epoch is retried because it never committed
    keys = sorted(int(r.key.decode()) for r in spark.read.parquet(sink).collect())
    assert keys == list(range(10)), "retried epoch must overwrite, not duplicate"


def test_lifecycle_events_order_across_start_stop_restart(spark, workdir):
    """Task lifecycle events (r8 verdict Missing #3), mirroring reference
    task.ts:158-241: 'assignment-receive' then 'session-start' on start;
    a restart while a session is active inserts 'session-stop' between
    them; stop() emits 'stop'; a failing query surfaces 'error'."""
    from frolyk_spark.tasks.task import Task

    in_dir = os.path.join(workdir, "t")
    sink = os.path.join(workdir, "sink")
    ckpt = os.path.join(workdir, "ckpt")

    task = Task(group="events-task")
    src = task.source("t")
    task.processor(src, lambda a: (lambda message, context: context.abandon))

    events = []
    for name in ("assignment-receive", "session-start", "session-stop", "stop", "error"):
        task.events.on(name, lambda *args, _n=name: events.append(_n))
    seqs = []
    task.events.on("session-start", lambda seq: seqs.append(seq))

    _write(spark, in_dir, [(0, i, "small", float(i)) for i in range(5)])
    schema = spark.read.parquet(in_dir).schema
    kwargs = dict(
        topic_dirs={"t": in_dir}, schemas={"t": schema},
        partition_col="part", offset_col="offset",
        checkpoint_root=ckpt, sink_dir=sink,
    )

    task.start_files(spark, **kwargs)
    assert events == ["assignment-receive", "session-start"]
    # restart while the first session is still registered -> session-stop
    # between the new assignment-receive and session-start (task.ts:194)
    task.start_files(spark, **kwargs)
    task.await_queries()
    task.stop()
    assert events == [
        "assignment-receive", "session-start",
        "assignment-receive", "session-stop", "session-start",
        "stop",
    ]
    assert seqs == [1, 2]


def test_failing_query_emits_error(spark, workdir):
    """await_queries surfaces a processor failure as an 'error' event AND
    re-raises (reference processingSession.catch -> events 'error')."""
    from frolyk_spark.tasks.task import Task

    in_dir = os.path.join(workdir, "t")
    task = Task(group="err-events")
    src = task.source("t")

    def setup(assignment):
        def boom(message, context):
            raise RuntimeError("lifecycle poison")

        return boom

    task.processor(src, setup)
    errs = []
    task.events.on("error", lambda e: errs.append(e))

    _write(spark, in_dir, [(0, 0, "x", 1.0)])
    schema = spark.read.parquet(in_dir).schema
    task.start_files(
        spark, topic_dirs={"t": in_dir}, schemas={"t": schema},
        partition_col="part", offset_col="offset",
        checkpoint_root=os.path.join(workdir, "ckpt"),
        sink_dir=os.path.join(workdir, "sink"),
    )
    with pytest.raises(Exception, match="lifecycle poison"):
        task.await_queries()
    assert len(errs) == 1 and "lifecycle poison" in str(errs[0])


def test_streaming_listener_forwards_error(spark, workdir):
    """The StreamingQueryListener hook: a query that dies with an exception
    emits 'error' asynchronously via Spark's listener bus."""
    import time

    from frolyk_spark.tasks.task import Task

    in_dir = os.path.join(workdir, "t")
    task = Task(group="listener-events")
    src = task.source("t")
    task.processor(src, lambda a: (
        lambda message, context: (_ for _ in ()).throw(RuntimeError("listener poison"))
    ))

    errs = []
    task.events.on("error", lambda e: errs.append(e))
    listener = task.attach_listener(spark)
    try:
        _write(spark, in_dir, [(0, 0, "x", 1.0)])
        schema = spark.read.parquet(in_dir).schema
        qs = task.start_files(
            spark, topic_dirs={"t": in_dir}, schemas={"t": schema},
            partition_col="part", offset_col="offset",
            checkpoint_root=os.path.join(workdir, "ckpt"),
            sink_dir=os.path.join(workdir, "sink"),
        )
        with pytest.raises(Exception):
            qs[0].awaitTermination()
        deadline = time.time() + 30
        while not errs and time.time() < deadline:
            time.sleep(0.2)  # listener bus delivers on its own thread
        assert errs and "listener poison" in str(errs[0])
    finally:
        spark.streams.removeListener(listener)
