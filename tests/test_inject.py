"""Local assignment-context parity — mirrors reference test/tests/inject.ts
and the processor-chain behaviors of test/tests/processors.ts."""

import json

import pytest

from frolyk_spark.tasks import Task
from frolyk_spark.tasks.local import create_local_assignment_context


def make_interface(processors, **kwargs):
    return create_local_assignment_context(
        assignment={"topic": "test-topic", "partition": 0, "group": "test-group"},
        processors=processors,
        **kwargs,
    )


def test_processes_injected_messages_in_order():
    seen = []

    def setup(assignment):
        assert assignment.topic == "test-topic"
        assert assignment.partition == 0
        assert assignment.group == "test-group"

        def fn(message, context):
            seen.append(json.loads(message["value"]))
            return seen[-1]

        return fn

    ti = make_interface([setup])
    ti.inject({"value": {"n": 1}})
    ti.inject({"value": {"n": 2}})
    assert seen == [{"n": 1}, {"n": 2}]
    assert ti.processing_results == [{"n": 1}, {"n": 2}]
    assert ti.processed_offsets == [0, 1]


def test_values_and_keys_json_encoded_to_bytes():
    got = {}

    def setup(assignment):
        def fn(message, context):
            got["value"] = message["value"]
            got["key"] = message["key"]
            return message

        return fn

    ti = make_interface([setup])
    ti.inject({"value": {"a": 1}, "key": "k1"})
    assert got["value"] == b'{"a": 1}'
    assert got["key"] == b'"k1"'


def test_context_accessors():
    captured = {}

    def setup(assignment):
        def fn(message, context):
            captured["topic"] = context.topic()
            captured["partition"] = context.partition()
            captured["offset"] = context.offset()
            captured["group"] = context.group()
            return message

        return fn

    ti = make_interface([setup])
    ti.inject({"value": 1})
    assert captured == {"topic": "test-topic", "partition": 0, "offset": 0, "group": "test-group"}


def test_processors_chain_and_flatten():
    def setup_a(assignment):
        return [
            lambda m, c: json.loads(m["value"]),
            lambda v, c: v + 1,
        ]

    def setup_b(assignment):
        return lambda v, c: v * 10

    ti = make_interface([setup_a, setup_b])
    ti.inject({"value": 5})
    assert ti.processing_results == [60]


def test_abandon_drops_message_but_offset_still_processed():
    def setup(assignment):
        def fn(message, context):
            value = json.loads(message["value"])
            if value % 2 == 0:
                return context.abandon
            return value

        return fn

    ti = make_interface([setup])
    for n in range(4):
        ti.inject({"value": n})
    assert ti.processing_results == [1, 3]
    assert ti.processed_offsets == [0, 1, 2, 3]


def test_commit_records_offset_plus_one_with_metadata():
    def setup(assignment):
        def fn(message, context):
            context.commit("meta")
            return message

        return fn

    ti = make_interface([setup])
    ti.inject({"value": 1})
    ti.inject({"value": 2})
    assert ti.committed_offsets == [
        {"offset": 1, "metadata": "meta"},
        {"offset": 2, "metadata": "meta"},
    ]
    assert ti.context.committed() == {"offset": 2, "metadata": "meta"}


def test_commit_invalid_offset_raises():
    ti = make_interface([])
    with pytest.raises(ValueError):
        ti.context.commit_offset(-1)


def test_processor_error_propagates_to_processing():
    def setup(assignment):
        def fn(message, context):
            raise RuntimeError("boom")

        return fn

    ti = make_interface([setup])
    ti.inject({"value": 1})
    assert ti.processing.failed
    with pytest.raises(RuntimeError, match="boom"):
        ti.end()


def test_injected_error_propagates():
    ti = make_interface([])
    ti.inject(ValueError("injected"))
    with pytest.raises(ValueError, match="injected"):
        ti.end()


def test_send_loopback_reprocesses_own_topic_partition():
    def setup(assignment):
        def fn(message, context):
            value = json.loads(message["value"])
            if value.get("kind") == "raw":
                assignment.send({"topic": "test-topic", "partition": 0,
                                 "value": {"kind": "derived"}})
            return value

        return fn

    ti = make_interface([setup])
    ti.inject({"value": {"kind": "raw"}})
    kinds = [r["kind"] for r in ti.processing_results]
    assert kinds == ["raw", "derived"]
    assert len(ti.produced_messages) == 1


def test_send_to_other_topic_not_looped_back():
    def setup(assignment):
        def fn(message, context):
            assignment.send({"topic": "elsewhere", "value": {"x": 1}})
            return json.loads(message["value"])

        return fn

    ti = make_interface([setup])
    ti.inject({"value": 1})
    assert ti.processing_results == [1]
    assert ti.produced_messages[0]["topic"] == "elsewhere"


def test_offsets_must_be_monotonic():
    ti = make_interface([])
    ti.inject({"value": 1, "offset": 5})
    with pytest.raises(ValueError):
        ti.inject({"value": 2, "offset": 3})


def test_watermarks_and_is_empty():
    ti = make_interface([])
    assert ti.context.is_empty()
    ti.inject({"value": 1, "offset": 10})
    ti.inject({"value": 2})
    wm = ti.context.watermarks()
    assert wm == {"high_offset": 12, "low_offset": 10}
    assert not ti.context.is_empty()


def test_initial_messages_processed_before_injects():
    def setup(assignment):
        return lambda m, c: json.loads(m["value"])

    ti = make_interface([setup], initial_state={"messages": [{"value": "init"}]})
    assert len(ti.initial_messages) == 1
    ti.inject({"value": "later"})
    assert ti.processing_results == ["init", "later"]


def test_caught_up_tracks_high_watermark():
    def setup(assignment):
        return lambda m, c: m

    ti = make_interface([setup])
    assert not ti.caught_up()
    ti.inject({"value": 1})
    assert ti.caught_up()


def test_seek_replays_messages():
    def setup(assignment):
        return lambda m, c: json.loads(m["value"])

    ti = make_interface([setup])
    for n in range(3):
        ti.inject({"value": n})
    assert ti.processing_results == [0, 1, 2]
    ti.context.seek(1)
    assert ti.processing_results == [0, 1, 2, 1, 2]


def test_seek_earliest_replays_all():
    def setup(assignment):
        return lambda m, c: json.loads(m["value"])

    ti = make_interface([setup])
    for n in range(3):
        ti.inject({"value": n})
    ti.context.seek("earliest")
    assert ti.processing_results == [0, 1, 2, 0, 1, 2]


def test_headers_ride_through_inject_and_send_loopback():
    """NewMessage.headers parity (reference index.ts:37-40; the `...payload`
    spread in local.ts createMessage carries them verbatim): processors see
    injected headers on the message, send() keeps them on the produced
    message, and a loopback send re-delivers them intact."""
    seen = []

    def setup(assignment):
        def fn(message, context):
            seen.append(message["headers"])
            if message["headers"] and message["headers"].get("route") == "loop":
                assignment.send(
                    {
                        "value": "relooped",
                        "headers": {"route": "done", "trace": b"\x01\x02"},
                    }
                )
            return message["value"]

        return fn

    ti = make_interface([setup])
    ti.inject({"value": "plain"})  # no headers -> None, like the reference
    ti.inject({"value": "tagged", "headers": {"route": "loop"}})
    assert seen[0] is None
    assert seen[1] == {"route": "loop"}
    # the loopback message was processed with its own headers
    assert seen[2] == {"route": "done", "trace": b"\x01\x02"}
    assert ti.produced_messages[0]["headers"] == {"route": "done", "trace": b"\x01\x02"}
