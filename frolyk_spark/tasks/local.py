"""Local (in-memory) assignment context — the test double.

Parity with reference src/assignment-contexts/local.ts: an in-memory
topic-partition log you ``inject()`` messages or errors into, exposing
``committed_offsets``, ``processing_results``, ``processed_offsets``,
``produced_messages``, ``initial_messages``, ``caught_up()``, ``end()``.

The reference is promise-based; here processing is synchronous-on-inject,
which preserves every observable ordering guarantee of the single-partition
stream while keeping tests deterministic.
"""

from __future__ import annotations

import json
import time
from typing import Any

from frolyk_spark.tasks.offsets import LogicalOffset, is_earliest, is_latest
from frolyk_spark.tasks.pipeline import build_processors, is_abandoned, process_message


def _to_bytes(value) -> bytes | None:
    """Non-bytes payloads are JSON-encoded, like local.ts:70-76."""
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    return json.dumps(value).encode()


class ProcessingOutcome:
    """Stand-in for the reference's ``processing`` promise."""

    def __init__(self):
        self._error: BaseException | None = None

    def fail(self, err: BaseException) -> None:
        if self._error is None:
            self._error = err

    def result(self) -> None:
        if self._error is not None:
            raise self._error

    @property
    def failed(self) -> bool:
        return self._error is not None


class LocalAssignmentContext:
    """AssignmentContext (reference src/assignment-contexts/index.ts:11-24)
    over an in-memory partition log."""

    def __init__(self, topic: str, partition: int, group: str,
                 offset_reset=LogicalOffset.LATEST, low_offset: int = 0,
                 on_log=None):
        self.topic = topic
        self.partition = partition
        self.group = group
        self.offset_reset = offset_reset
        self._on_log = on_log

        self._initial_low_offset = low_offset
        self._produced_offset = low_offset - 1
        self._consumed_offset = low_offset - 1
        self._seek_to_offset = -1
        self._committed: dict = {"offset": -1, "metadata": None}

        # FULL commit history — a test-harness affordance (the reference
        # local context keeps it too, local.ts:65). The distributed
        # BatchAssignmentContext deliberately does NOT expose this name:
        # it keeps O(1) commit state as `last_commit` so per-message
        # commits can't grow executor memory; history-reading code fails
        # loudly there rather than seeing a truncated list.
        self.committed_offsets: list[dict] = []
        self.injected_messages: list[dict] = []
        self.produced_messages: list[dict] = []

        self._deliver = None  # set by the test interface

    # --- watermarks (local.ts:114-121) ---
    def high_offset(self) -> int:
        if self.injected_messages:
            return self.injected_messages[-1]["offset"] + 1
        return self._initial_low_offset

    def low_offset(self) -> int:
        if self.injected_messages:
            return self.injected_messages[0]["offset"]
        return self._initial_low_offset

    def watermarks(self) -> dict:
        return {"high_offset": self.high_offset(), "low_offset": self.low_offset()}

    # --- AssignmentContext API ---
    def caught_up(self, offset: int) -> bool:
        return offset + 1 >= self.high_offset()

    def commit_offset(self, new_offset: int, metadata: str | None = None) -> None:
        if new_offset <= -1:
            raise ValueError("Offset must be a valid absolute offset to commit it")
        entry = {"offset": new_offset, "metadata": metadata}
        self._committed = entry
        self.committed_offsets.append(entry)

    def committed(self) -> dict:
        return dict(self._committed)

    def is_empty(self) -> bool:
        return self.high_offset() - self.low_offset() <= 0

    def log(self, tags, payload) -> None:
        """Forward to the task's observability surface when task-created
        (Task.inject wires on_log to task.events 'log'); standalone
        contexts stay silent — the reference forwards to the task logger
        the same way (context.log -> task logging)."""
        if self._on_log is not None:
            self._on_log(tags, payload)

    def seek(self, sought) -> None:
        """Resolve to an injected message and replay from it (local.ts:156-181)."""
        absolute = (
            self.low_offset() if is_earliest(sought)
            else self.high_offset() if is_latest(sought)
            else int(sought)
        )
        out_of_range = absolute < self.low_offset() or absolute >= self.high_offset()
        closest_index = next(
            (i for i, m in enumerate(self.injected_messages) if m["offset"] >= absolute),
            -1,
        )
        if not out_of_range and closest_index > -1:
            self._seek_to_offset = self.injected_messages[closest_index]["offset"]
        elif is_latest(sought) or is_latest(self.offset_reset):
            self._seek_to_offset = self.high_offset()
        elif is_earliest(sought) or is_earliest(self.offset_reset):
            self._seek_to_offset = self.low_offset()

        if self._consumed_offset >= self._seek_to_offset and closest_index > -1:
            for message in self.injected_messages[closest_index:]:
                self._deliver(message)

    def send(self, messages) -> list[dict]:
        """Produce messages; loopback-inject ones addressed to this
        assignment's own topic-partition (local.ts:183-201)."""
        if not isinstance(messages, (list, tuple)):
            messages = [messages]
        out = []
        for payload in messages:
            message = self._create_message(payload)
            self.produced_messages.append(message)
            if message["topic"] == self.topic and message["partition"] == self.partition:
                self._inject_internal(message)
            out.append(
                {
                    "topic_name": message["topic"],
                    "partition": message["partition"],
                    "error_code": 0,
                    "offset": message["offset"],
                    "timestamp": message["timestamp"],
                }
            )
        return out

    # --- internals shared with the test interface ---
    def _create_message(self, payload: dict) -> dict:
        offset = payload.get("offset")
        offset = int(offset) if offset is not None else self._produced_offset + 1
        if offset <= self._produced_offset:
            raise ValueError(
                "Offset of injected message must be at or higher than the current highwatermark"
            )
        self._produced_offset = offset
        # headers ride through VERBATIM ({name: bytes|str}), mirroring the
        # reference's `...payload` spread (local.ts:88-96) and the
        # NewMessage.headers contract (index.ts:37-40) — a processor that
        # routes on headers sees exactly what the producer attached
        return {
            "topic": payload.get("topic", self.topic),
            "partition": payload.get("partition", self.partition),
            "key": _to_bytes(payload.get("key")),
            "value": _to_bytes(payload.get("value")),
            "headers": payload.get("headers"),
            "offset": offset,
            "timestamp": payload.get("timestamp", str(int(time.time() * 1000))),
        }

    def _inject_internal(self, message: dict) -> dict:
        self.injected_messages.append(message)
        self._deliver(message)
        return message


class AssignmentTestInterface:
    """Parity with reference AssignmentTestInterface (local.ts:9-20)."""

    def __init__(self, context: LocalAssignmentContext, processor_setups,
                 initial_messages: list[dict] | None = None):
        self.context = context
        self.processing = ProcessingOutcome()
        self.processing_results: list[Any] = []
        self.processed_offsets: list[int] = []
        self._queue: list[dict] = []
        self._draining = False

        context._deliver = self._deliver
        self._fns = build_processors(context, processor_setups)

        self.initial_messages = [
            context._inject_internal(context._create_message(p))
            for p in (initial_messages or [])
        ]

    # --- delivery path (the "controlled stream": local.ts:219-239) ---
    def _deliver(self, message: dict) -> None:
        """Queue-drained so a mid-processing send() loopback is processed
        after the current message completes, matching the reference's
        stream ordering."""
        self._queue.append(message)
        if self._draining:
            return
        self._draining = True
        try:
            while self._queue:
                self._process_one(self._queue.pop(0))
        finally:
            self._draining = False

    def _process_one(self, message: dict) -> None:
        if self.context._seek_to_offset > -1:
            if message["offset"] != self.context._seek_to_offset:
                return
        self.context._consumed_offset = message["offset"]
        self.context._seek_to_offset = -1

        enriched = dict(message, high_water_offset=self.context.high_offset())
        try:
            result, _ctx = process_message(enriched, self._fns, self.context)
        except Exception as err:  # noqa: BLE001 — error propagation is the contract
            self.processing.fail(err)
            return
        self.processed_offsets.append(message["offset"])
        if not is_abandoned(result):
            self.processing_results.append(result)

    # --- public test API ---
    def inject(self, payload):
        """Inject a message dict or an Exception (local.ts:253-268)."""
        if isinstance(payload, BaseException):
            self.processing.fail(payload)
            return payload
        message = self.context._create_message(payload)
        self.context._inject_internal(message)
        return dict(message, high_water_offset=self.context.high_offset())

    @property
    def committed_offsets(self) -> list[dict]:
        return self.context.committed_offsets

    @property
    def produced_messages(self) -> list[dict]:
        return self.context.produced_messages

    def caught_up(self) -> bool:
        """True once some processed offset reaches the high watermark."""
        return any(self.context.caught_up(o) for o in self.processed_offsets)

    def end(self) -> None:
        """End of stream; re-raises the first processing error, mirroring the
        reference's rejected ``processing`` promise."""
        self.processing.result()


def create_local_assignment_context(
    *, assignment: dict, processors, offset_reset=LogicalOffset.LATEST,
    initial_state: dict | None = None, on_log=None
) -> AssignmentTestInterface:
    """Factory mirroring reference createLocalAssignmentContext (local.ts:40)."""
    initial_state = {"low_offset": 0, "messages": [], **(initial_state or {})}
    context = LocalAssignmentContext(
        topic=assignment["topic"],
        partition=assignment["partition"],
        group=assignment["group"],
        offset_reset=offset_reset,
        low_offset=initial_state["low_offset"],
        on_log=on_log,
    )
    return AssignmentTestInterface(context, processors, initial_state["messages"])
