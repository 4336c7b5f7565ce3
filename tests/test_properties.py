"""Property-based checks (hypothesis) for the pure-Python layers: the
portable hash model and the local inject harness. No Spark session — each
example runs in microseconds, so hypothesis can explore widely."""

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from frolyk_spark.tasks.task import Task

# --- the portable-hash model -------------------------------------------------
# Spark computes conv(substr(md5(x),1,15),16,10); DuckDB casts the same hex
# slice. Both must equal this Python model (Spark/DuckDB agreement with the
# model is pinned by tests/test_hashing.py on a fixed corpus + documents).


def _model_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_model_hash_is_60bit_nonnegative(s):
    h = _model_hash(s)
    assert 0 <= h < (1 << 60)


@given(st.text(min_size=1, max_size=100))
@settings(max_examples=200, deadline=None)
def test_duckdb_matches_python_model(s):
    import duckdb

    con = duckdb.connect()
    (h,) = con.execute(
        "SELECT cast(concat('0x', substr(md5(?), 1, 15)) as bigint)", [s]
    ).fetchone()
    con.close()
    assert h == _model_hash(s)


# --- local inject harness ----------------------------------------------------


def _make_harness():
    task = Task(group="prop")
    src = task.source("t")

    def setup(assignment):
        def double(message, context):
            v = json.loads(message["value"].decode())
            if v % 3 == 0:
                return context.abandon
            return v * 2

        return double

    task.processor(src, setup)
    return task.inject({"topic": "t", "partition": 0})


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), max_size=40))
@settings(max_examples=100, deadline=None)
def test_inject_results_match_chain_model(values):
    """processing_results == chain applied in order, minus abandoned;
    processed_offsets covers every injected message in order."""
    ctx = _make_harness()
    for v in values:
        ctx.inject({"value": v})
    expected = [v * 2 for v in values if v % 3 != 0]
    assert ctx.processing_results == expected
    assert ctx.processed_offsets == sorted(ctx.processed_offsets)
    assert len(ctx.processed_offsets) == len(values)
    if values:
        assert ctx.caught_up()


@given(
    st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=20),
)
@settings(max_examples=100, deadline=None)
def test_explicit_offsets_must_increase(offsets):
    """The harness enforces the reference's high-watermark rule: an injected
    offset must exceed the current one (local.ts offset checks)."""
    ctx = _make_harness()
    current = -1
    for off in offsets:
        target = current + off  # strictly increasing
        ctx.inject({"value": 1, "offset": target})
        current = target
    assert ctx.processed_offsets == list(
        _running(offsets)
    ), "offsets processed exactly as injected"


def _running(offsets):
    acc = -1
    for off in offsets:
        acc += off
        yield acc
