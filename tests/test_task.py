"""Task topology parity — mirrors reference test/tests/task.ts."""

import json

import pytest

from frolyk_spark.tasks import LogicalOffset, Task, create_task


def test_create_task():
    task = create_task({"group": "test-group"})
    assert task.group == "test-group"
    assert task.sources == []


def test_source_dedupes_by_topic():
    task = Task(group="g")
    a = task.source("topic-a")
    b = task.source("topic-a")
    assert a is b
    assert len(task.sources) == 1


def test_source_offset_reset_default_latest():
    task = Task(group="g")
    s = task.source("t")
    assert s.offset_reset == LogicalOffset.LATEST
    e = task.source("t2", offset_reset="earliest")
    assert e.offset_reset == "earliest"


def test_processor_requires_own_source():
    task = Task(group="g")
    other = Task(group="other")
    foreign = other.source("topic-x")
    with pytest.raises(ValueError):
        task.processor(foreign, lambda a: lambda v, c: v)
    # same topic name registered on this task works
    own = task.source("topic-x")
    task.processor(own, lambda a: lambda v, c: v)
    assert len(own.processors) == 1


def test_start_requires_connection():
    task = Task(group="g")
    task.source("t")
    with pytest.raises(ValueError):
        task.start(spark=None)


def test_inject_single_and_multiple():
    task = Task(group="g")
    src = task.source("t")
    task.processor(src, lambda a: lambda m, c: json.loads(m["value"]))

    single = task.inject({"topic": "t", "partition": 0})
    assert hasattr(single, "inject")

    several = task.inject([{"topic": "t", "partition": 0}, {"topic": "t", "partition": 1}])
    assert isinstance(several, list) and len(several) == 2


def test_inject_unknown_topic_has_no_processors():
    task = Task(group="g")
    ti = task.inject({"topic": "nope", "partition": 0})
    ti.inject({"topic": "nope", "partition": 0, "value": {"x": 1}})
    # no processors: the raw message itself flows through
    assert len(ti.processing_results) == 1
    assert ti.processing_results[0]["topic"] == "nope"


def test_event_emitter_on_once_off():
    """Minimal EventEmitter parity (reference uses Node's: on/once/off)."""
    from frolyk_spark.tasks.events import EventEmitter

    em = EventEmitter()
    got = []
    fn = em.on("a", lambda *args: got.append(("on", args)))
    em.once("a", lambda *args: got.append(("once", args)))
    em.emit("a", 1)
    em.emit("a", 2)
    assert got == [("on", (1,)), ("once", (1,)), ("on", (2,))]
    em.off("a", fn)
    assert not em.emit("a", 3)  # no handlers left -> False
    # off() removes a once-wrapper by its inner fn too
    inner = lambda: got.append("never")  # noqa: E731
    em.once("b", inner)
    em.off("b", inner)
    assert not em.emit("b")
    # Node contract: off removes AT MOST ONE instance — a handler
    # registered twice keeps one listener after a single off()
    twice = lambda: got.append("twice")  # noqa: E731
    em.on("c", twice)
    em.on("c", twice)
    em.off("c", twice)
    em.emit("c")
    assert got[-1] == "twice" and em.listener_count("c") == 1


def test_context_log_forwards_to_task_events():
    """context.log reaches task.events('log') — the reference forwards
    context.log to the task logger (r8 verdict: it was a silent no-op)."""
    task = Task(group="log-group")
    src = task.source("t")

    def setup(assignment):
        def fn(message, context):
            context.log(["info", "custom"], {"offset": message["offset"]})
            return message["value"]

        return fn

    task.processor(src, setup)
    logged = []
    task.events.on("log", lambda tags, payload: logged.append((tags, payload)))
    ti = task.inject({"topic": "t", "partition": 0})
    ti.inject({"value": "x"})
    assert logged == [(["info", "custom"], {"offset": 0})]
