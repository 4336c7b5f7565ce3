"""Task lifecycle events — parity with the reference's EventEmitter surface.

The reference Task exposes ``task.events`` (Node EventEmitter,
src/task.ts:18,38) and emits 'assignment-receive' (task.ts:169), 'error'
(task.ts:172,241), 'session-stop' (task.ts:194), 'session-start' with the
session sequence number (task.ts:233), and 'stop' (task.ts:165); the
reference tests subscribe with on/once (test/tests/task.ts). This is the
minimal synchronous equivalent: handlers run inline at emit time, in
subscription order, so tests observe a deterministic event order — there is
no event loop to defer to in the Python port.
"""

from __future__ import annotations

from typing import Any, Callable


class EventEmitter:
    """on/once/off/emit over named events, Node-style (no wildcard events).

    A handler that raises aborts the emit and propagates — a broken
    observability hook should be loud, not swallowed (and the reference
    would crash the process on a throwing sync listener too).
    """

    def __init__(self) -> None:
        self._handlers: dict[str, list[Callable[..., Any]]] = {}

    def on(self, event: str, fn: Callable[..., Any]) -> Callable[..., Any]:
        self._handlers.setdefault(event, []).append(fn)
        return fn

    def once(self, event: str, fn: Callable[..., Any]) -> Callable[..., Any]:
        def wrapper(*args: Any) -> Any:
            self.off(event, wrapper)
            return fn(*args)

        wrapper._once_inner = fn  # so off(event, fn) can remove it
        return self.on(event, wrapper)

    def off(self, event: str, fn: Callable[..., Any]) -> None:
        """Remove AT MOST ONE registration of ``fn`` (or of a once-wrapper
        around it), scanning from the end — Node's removeListener contract
        ("will remove, at most, one instance"); code registered twice and
        removed once must keep its remaining listener."""
        fns = self._handlers.get(event, [])
        for i in range(len(fns) - 1, -1, -1):
            f = fns[i]
            if f is fn or getattr(f, "_once_inner", None) is fn:
                del fns[i]
                return

    def emit(self, event: str, *args: Any) -> bool:
        fns = list(self._handlers.get(event, ()))
        for fn in fns:
            fn(*args)
        return bool(fns)

    def listener_count(self, event: str) -> int:
        return len(self._handlers.get(event, ()))
