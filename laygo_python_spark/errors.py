"""Error-handling primitives.

Reference parity: laygo's ``ErrorHandler`` chains chunk-error callbacks
LIFO (laygo/errors.py:25-61, insert-at-front :47) and ``raise_error`` is
the fail-fast default (laygo/errors.py:8-22). Here handlers run on the
*executor* inside the per-batch try/except that ``Transformer.catch``
installs (see transformer.py), so they must be picklable and must not
touch driver state — counters go through ``Context`` accumulators.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

ChunkErrorHandler = Callable[[Any, Exception, dict], None]


class PipelineAbortError(RuntimeError):
    """Raised by ``short_circuit`` to abort the whole run
    (reference: laygo/transformers/transformer.py:537-567)."""


def raise_error(chunk: Any, error: Exception, context: dict) -> None:
    """Fail-fast default: re-raise (reference laygo/errors.py:8-22).
    Spark's native behavior — task failure fails the job."""
    raise error


class ErrorHandler:
    """LIFO chain of chunk-error callbacks (reference laygo/errors.py:25-61)."""

    def __init__(self) -> None:
        self._handlers: list[ChunkErrorHandler] = []

    def on_error(self, handler: ChunkErrorHandler) -> "ErrorHandler":
        # Most-recently-added runs first (reference laygo/errors.py:47).
        self._handlers.insert(0, handler)
        return self

    def handle(self, chunk: Any, error: Exception, context: dict) -> None:
        for h in self._handlers:
            h(chunk, error, context)

    def __len__(self) -> int:
        return len(self._handlers)
