"""Loop-scoped AQE parallelism guard for iterative operators.

The session default (`session.py`) sets
``spark.sql.adaptive.coalescePartitions.parallelismFirst=false`` with a
64 MB advisory size — the right call for one-shot relational queries,
where a small shuffle genuinely belongs on few cores. An ITERATIVE
operator inverts the economics: the loop re-shuffles the same
moderate-sized frame every round, and size-first coalescing collapses
those round shuffles to one or two partitions — serializing 5 rounds of
join+agg onto a single core while 31 idle (measured r10:
pagerank_supplier_part 4.5 s → 3.85 s at sf0.1 just from restoring the
parallelism floor).

``parallelismFirst=true`` is the scale-honest fix, not a local hack: it
makes cluster parallelism the coalescing FLOOR. At 100 TB the round
shuffles exceed the advisory size anyway and the flag changes nothing;
at small scale it keeps every core on the critical path. Scoped with a
set/restore guard so one-shot relational plans keep the session
default.

Runtime-conf note: the flag is read at EXECUTION time, so the guard
must cover the loop's actions (checkpoints / final materialization),
not just plan construction — users either checkpoint their final
round inside the guard (pagerank) or materialize the returned frame
eagerly before the restore (label_propagation). k-core deliberately
does NOT use the guard: its merged peel measured neutral under the
flag and the eager materialization it would need cost more than it
saved (see kcore's docstring).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

# Concurrency: the guard mutates a SESSION-global SQL conf, so two
# overlapping guards on threads sharing a SparkSession would race the
# set/restore — one guard's restore could clobber the other's set.
# Every guard sets the SAME value ("true"), so a refcount fixes it
# exactly: the FIRST entry saves the prior value and sets the flag, the
# LAST exit restores — overlapping guards compose instead of clobbering.
# The refcount is keyed PER SESSION (guards on independent sessions —
# the spark.newSession() isolation pattern — must not share a depth
# counter, or the second session's conf would never be set and the
# restore could land on the wrong session). What the refcount can NOT
# protect is UNRELATED work sharing the same session briefly running
# under parallelism-first coalescing — harmless for correctness,
# performance-only; callers mixing iterative loops with
# latency-critical concurrent queries should scope the loop via
# ``spark.newSession()`` (same SparkContext, independent SQL conf).
_lock = threading.Lock()
_state: dict[int, list] = {}  # id(session) -> [depth, saved_value]


@contextmanager
def loop_parallelism(spark):
    """Within the block, AQE never coalesces below cluster parallelism."""
    sid = id(spark)
    with _lock:
        st = _state.get(sid)
        if st is None:
            try:
                saved = spark.conf.get(_KEY)
            except Exception:  # noqa: BLE001 — unset: nothing to restore
                saved = None
            st = _state[sid] = [0, saved]
        # Set on EVERY entry, not just the first (idempotent and cheap):
        # if anything reset the key between an outer guard's entry and a
        # nested guard's entry, the inner block must still run with
        # parallelism-first coalescing (r11 ADVICE).
        spark.conf.set(_KEY, "true")
        st[0] += 1
    try:
        yield
    finally:
        with _lock:
            st = _state[sid]
            st[0] -= 1
            if st[0] == 0:
                del _state[sid]
                if st[1] is None:
                    try:
                        spark.conf.unset(_KEY)
                    except Exception:  # noqa: BLE001
                        pass
                else:
                    spark.conf.set(_KEY, st[1])
