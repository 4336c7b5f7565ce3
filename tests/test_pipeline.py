"""Processor-chain unit tests (reference src/processors.ts semantics),
independent of any Spark session: setup flattening, chaining order,
ABANDON short-circuit, commit(+1), and error propagation."""

import pytest

from frolyk_spark.tasks.pipeline import (
    ABANDON, build_processors, is_abandoned, process_message,
)


class FakeAssignment:
    group = "unit-group"

    def __init__(self):
        self.commits = []
        self.logs = []

    def commit_offset(self, offset, metadata=None):
        self.commits.append((offset, metadata))

    def log(self, tags, payload):
        self.logs.append((tags, payload))


def _msg(value, offset=7):
    return {
        "topic": "t",
        "partition": 3,
        "key": None,
        "value": value,
        "offset": offset,
        "timestamp": "123",
        "high_water_offset": offset + 1,
    }


def test_setup_flattening_and_chain_order():
    assignment = FakeAssignment()
    calls = []

    def setup_one(a):
        assert a is assignment
        return lambda m, c: (calls.append("first"), m["value"] + 1)[1]

    def setup_many(a):
        return [
            lambda v, c: (calls.append("second"), v * 10)[1],
            lambda v, c: (calls.append("third"), v - 2)[1],
        ]

    fns = build_processors(assignment, [setup_one, setup_many])
    assert len(fns) == 3
    result, _ = process_message(_msg(4), fns, assignment)
    assert calls == ["first", "second", "third"]
    assert result == (4 + 1) * 10 - 2


def test_abandon_short_circuits():
    assignment = FakeAssignment()
    ran = []

    def setup(a):
        return [
            lambda m, c: c.abandon,
            lambda v, c: ran.append("must not run"),
        ]

    fns = build_processors(assignment, [setup])
    result, _ = process_message(_msg(1), fns, assignment)
    assert is_abandoned(result) and ran == []


def test_context_commit_commits_next_offset():
    assignment = FakeAssignment()

    def setup(a):
        def fn(m, c):
            c.commit("meta")
            return m["value"]

        return fn

    fns = build_processors(assignment, [setup])
    process_message(_msg("v", offset=41), fns, assignment)
    assert assignment.commits == [(42, "meta")]


def test_context_exposes_message_coordinates():
    assignment = FakeAssignment()
    seen = {}

    def setup(a):
        def fn(m, c):
            seen.update(
                topic=c.topic(), partition=c.partition(), offset=c.offset(),
                timestamp=c.timestamp(), group=c.group(),
            )
            return m

        return fn

    process_message(_msg("v", offset=9), build_processors(assignment, [setup]), assignment)
    assert seen == {
        "topic": "t", "partition": 3, "offset": 9,
        "timestamp": "123", "group": "unit-group",
    }


def test_processor_errors_propagate():
    assignment = FakeAssignment()

    def setup(a):
        def boom(m, c):
            raise RuntimeError("processor failure")

        return boom

    fns = build_processors(assignment, [setup])
    with pytest.raises(RuntimeError, match="processor failure"):
        process_message(_msg("v"), fns, assignment)
