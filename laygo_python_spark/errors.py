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


def quarantine_handler(path: str) -> ChunkErrorHandler:
    """An ``on_error`` handler that writes each failing chunk (a pandas
    DataFrame) to a parquet part-file under ``path``, with the error
    message attached — the dead-letter-queue pattern for poisoned data
    (SURVEY.md §2.7 maps laygo's catch to 'quarantine sink' here).

    Executor-side direct writes: ``path`` must be a filesystem every
    executor can reach (local dir on local[n]; a shared/dist FS on a
    cluster). Re-executed tasks may write duplicate part-files —
    quarantine is for inspection, not exactly-once accounting (use a
    ctx counter for counts)."""
    import os
    import uuid

    def handle(chunk, error: Exception, context: dict) -> None:
        try:
            os.makedirs(path, exist_ok=True)
            out = chunk.copy()
            out["__error"] = f"{type(error).__name__}: {error}"
            out.to_parquet(os.path.join(path, f"part-{uuid.uuid4().hex}.parquet"), index=False)
        except Exception:  # noqa: BLE001 — quarantine must never mask the pipeline
            pass

    return handle


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
