"""Processor pipeline — parity with reference src/processors.ts.

A *processor setup* is called once per partition assignment with the
assignment context and returns one processor function or a list of them
(``setup(assignment) -> fn | [fn]``, reference src/processors.ts:36-44).
Processor functions chain: each receives the previous result and a
per-message :class:`ProcessingContext`; returning :data:`ABANDON` drops the
message from the rest of the chain (src/processors.ts:80-93). Exceptions
propagate to the assignment's ``processing`` outcome (src/processors.ts:95-98).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

class _Abandon:
    """Sentinel a processor returns to drop the current message (reference
    src/processors.ts:6 ``const abandon = Symbol('abandon')``).

    Detected by attribute, not identity: closures that cross the
    driver→executor boundary get pickled by value, which would duplicate a
    bare ``object()`` sentinel and break ``is`` checks.
    """

    _is_frolyk_abandon = True

    def __repr__(self) -> str:
        return "ABANDON"


ABANDON = _Abandon()


def is_abandoned(result) -> bool:
    return getattr(result, "_is_frolyk_abandon", False) is True


@dataclass
class ProcessingContext:
    """Per-message context handed to each processor function
    (reference src/processors.ts:12-21, 65-78)."""

    abandon: Any
    _assignment: Any
    _offset: int
    _partition: int
    _topic: str
    _timestamp: str
    _high_water_offset: int

    def commit(self, metadata: str | None = None) -> None:
        # commits message offset + 1, like src/processors.ts:68
        self._assignment.commit_offset(self._offset + 1, metadata)

    def group(self) -> str:
        return self._assignment.group

    def offset(self) -> int:
        return self._offset

    def partition(self) -> int:
        return self._partition

    def topic(self) -> str:
        return self._topic

    def timestamp(self) -> str:
        return self._timestamp

    def log(self, tags, payload) -> None:
        self._assignment.log(tags, payload)

    def __str__(self) -> str:
        return (
            f"processor context (o={self._offset} p={self._partition} "
            f"t={self._topic}, ho={self._high_water_offset})"
        )


def build_processors(assignment_context, processor_setups) -> list[Callable]:
    """Run every setup against the assignment context, flattening results
    (reference src/processors.ts:36-44)."""
    fns: list[Callable] = []
    for setup in processor_setups:
        result = setup(assignment_context)
        if isinstance(result, (list, tuple)):
            fns.extend(result)
        else:
            fns.append(result)
    return fns


def process_message(message, fns, assignment_context):
    """Chain ``fns`` over one message; returns (result, context).

    ``result`` is ABANDON if any processor abandoned. The initial value fed
    to the first processor is the full message (src/processors.ts:87).
    """
    ctx = ProcessingContext(
        abandon=ABANDON,
        _assignment=assignment_context,
        _offset=message["offset"],
        _partition=message["partition"],
        _topic=message["topic"],
        _timestamp=message["timestamp"],
        _high_water_offset=message["high_water_offset"],
    )
    result: Any = message
    for fn in fns:
        if is_abandoned(result):
            return ABANDON, ctx
        result = fn(result, ctx)
    return result, ctx
