"""Shared pipeline context — the scalable decomposition of laygo's
process-shared mutable dict (reference laygo/context/parallel.py:39-138).

Laygo lets any worker do ``with ctx: ctx["count"] += 1`` through a
multiprocessing.Manager proxy — transactional read-modify-write that
cannot scale past one host. Every context usage in the reference's own
tests is an associative fold (counters, sums, max — e.g.
tests/test_integration.py:85-99, tests/test_parallel_transformer.py:85-117),
so the Spark-native decomposition is lossless in practice:

- **reads from workers** → a broadcast snapshot (``ctx.value(key)`` inside
  a UDF closure captures broadcast data, shipped once per executor);
- **associative writes from workers** → Spark accumulators
  (``ctx.counter(name)``) and ``DataFrame.observe`` metrics;
- **driver-side state** → a plain dict (``ctx[key] = v``).

Non-associative transactional state is documented unsupported
(SURVEY.md §7.4.1).
"""

from __future__ import annotations

from collections.abc import Iterator, MutableMapping
from typing import Any

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import SparkSession


class _MaxAccumulatorParam(AccumulatorParam):
    def zero(self, value: float) -> float:
        return float("-inf")

    def addInPlace(self, v1: float, v2: float) -> float:
        return v1 if v1 >= v2 else v2


class _MinAccumulatorParam(AccumulatorParam):
    def zero(self, value: float) -> float:
        return float("inf")

    def addInPlace(self, v1: float, v2: float) -> float:
        return v1 if v1 <= v2 else v2


class Context(MutableMapping):
    """Dict-like driver state + accumulator registry.

    Supports the reference's ``with ctx:`` lock protocol
    (laygo/context/parallel.py:71-92) as a no-op on the driver — all
    worker-side mutation goes through accumulators, which are
    race-free by construction.
    """

    def __init__(self, initial: dict[str, Any] | None = None, spark: SparkSession | None = None):
        self._data: dict[str, Any] = dict(initial or {})
        self._spark = spark
        self._accumulators: dict[str, Any] = {}
        # Observation objects registered by Transformer.observe — their
        # metrics become available after the first action on the plan.
        self._observations: dict[str, Any] = {}

    # -- dict protocol (driver-side) --------------------------------------
    def __getitem__(self, key: str) -> Any:
        if key in self._accumulators:
            return self._accumulators[key].value
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __delitem__(self, key: str) -> None:
        del self._data[key]

    def __iter__(self) -> Iterator[str]:
        seen = set(self._data)
        yield from self._data
        for k in self._accumulators:
            if k not in seen:
                yield k

    def __len__(self) -> int:
        return len(set(self._data) | set(self._accumulators))

    # -- lock protocol (no-op; parity with laygo/context/parallel.py:71-92)
    def __enter__(self) -> "Context":
        return self

    def __exit__(self, *exc: Any) -> None:
        return None

    # -- worker-writable accumulators --------------------------------------
    def _sc(self):
        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("Context accumulators need an active SparkSession")
        return spark.sparkContext

    def counter(self, name: str, initial: float = 0):
        """A worker-incrementable counter/sum (Spark accumulator).

        Replaces ``with ctx: ctx[name] += x`` from workers
        (reference tests/test_integration.py:85-99).

        CAVEAT (inherited from Spark): accumulator updates inside
        *transformations* re-fire if a stage is re-executed — e.g. an
        ``orderBy`` downstream of a ``tap`` adds a range-partitioning
        sampling pass that runs the tap twice. Count in the terminal
        action path, or use ``Transformer.observe`` (exactly-once) for
        metrics attached to a specific plan node.
        """
        if name not in self._accumulators:
            self._accumulators[name] = self._sc().accumulator(initial)
        return self._accumulators[name]

    def max_tracker(self, name: str):
        if name not in self._accumulators:
            self._accumulators[name] = self._sc().accumulator(float("-inf"), _MaxAccumulatorParam())
        return self._accumulators[name]

    def min_tracker(self, name: str):
        if name not in self._accumulators:
            self._accumulators[name] = self._sc().accumulator(float("inf"), _MinAccumulatorParam())
        return self._accumulators[name]

    # -- broadcast read path ------------------------------------------------
    def broadcast_snapshot(self):
        """Broadcast the plain-dict part for cheap executor-side reads."""
        return self._sc().broadcast(dict(self._data))

    # -- terminal snapshot (parity with laygo/pipeline.py:295) --------------
    def to_dict(self) -> dict[str, Any]:
        out = dict(self._data)
        for k, acc in self._accumulators.items():
            out[k] = acc.value
        for name, obs in self._observations.items():
            if getattr(obs, "_jo", None) is None:
                continue  # never attached to a DataFrame
            # Observation.get BLOCKS until the observing plan's first
            # action — probe the JVM side non-blockingly first so a
            # snapshot taken before that action cannot hang.
            try:
                if obs._jo.getRowOrEmpty().isEmpty():
                    continue  # plan not executed yet
            except Exception:  # noqa: BLE001 — JVM probe failed; don't risk a hang
                continue
            out.update({f"{name}.{k}": v for k, v in obs.get.items()})
        return out


class PipelineContext(dict):
    """DEPRECATED migration shim — parity with the reference's deprecated
    ``PipelineContext`` (reference laygo/helpers.py:9-20, itself marked
    deprecated there in favor of context managers). Exists so reference
    code constructing a ``PipelineContext({...})`` runs unchanged; new
    code should pass a ``Context`` (accumulator-backed, worker-safe).
    ``Pipeline.context(...)`` accepts either."""

    def __init__(self, *args, **kwargs):
        import warnings

        warnings.warn(
            "PipelineContext is deprecated (as in the reference); use Context",
            DeprecationWarning,
            stacklevel=2,
        )
        super().__init__(*args, **kwargs)
