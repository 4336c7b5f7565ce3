"""Logical offsets — parity with reference src/offsets.ts."""

from __future__ import annotations

from enum import IntEnum


class LogicalOffset(IntEnum):
    LATEST = -1
    EARLIEST = -2


# literal aliases (reference src/offsets.ts:6-17)
_EARLIEST_LITERALS = {"beginning", "earliest", "smallest"}
_LATEST_LITERALS = {"end", "latest", "largest"}


def is_earliest(offset) -> bool:
    return offset == LogicalOffset.EARLIEST or offset in _EARLIEST_LITERALS


def is_latest(offset) -> bool:
    return offset == LogicalOffset.LATEST or offset in _LATEST_LITERALS


def to_starting_offsets(offset) -> str:
    """Map a logical offset to a Spark streaming ``startingOffsets`` value."""
    return "earliest" if is_earliest(offset) else "latest"
