"""Regenerate tests/plan_baseline.json — the committed plan-shape
baseline that turns PLAN_AUDIT.md from a report into a regression gate
(r10 verdict ask #6).

For every registered query (the same sweep set tests/test_plan_sweep.py
uses), record the (exchanges, broadcasts, python_stages,
single_partition, windows) tuple of its physical plan at sf0.001.
tests/test_plan_sweep.py::test_plan_shape_baseline fails when any
query's tuple WORSENS against this file — a silent new shuffle,
broadcast, Python stage, single-partition funnel, or window now breaks
the suite with a pointer here instead of waiting for a human to re-read
PLAN_AUDIT.md.

Regeneration discipline (r11 verdict ask #6): a wholesale rewrite could
silently absorb a worsened tuple, so the generator first prints a
metric-by-metric diff against the committed file and REFUSES to
overwrite unless --accept is passed. Run after any INTENTIONAL plan
change, read the diff, then commit with the triage in the commit
message:

    python tools/gen_plan_baseline.py            # dry-run: diff only
    python tools/gen_plan_baseline.py --accept   # diff + overwrite
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import audit_one  # noqa: E402

from laygo_python_spark.queries import QUERIES, load_all  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_baseline.json",
)
METRICS = ("exchanges", "broadcasts", "python_stages", "single_partition", "windows")


def diff_baselines(old: dict, new: dict) -> list[str]:
    """Human-readable metric-by-metric diff; empty list = identical."""
    lines: list[str] = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            vals = ", ".join(f"{m}={new[name][m]}" for m in METRICS)
            lines.append(f"+ {name}: NEW ({vals})")
        elif name not in new:
            lines.append(f"- {name}: REMOVED")
        else:
            deltas = [
                f"{m} {old[name][m]} -> {new[name][m]}"
                + (" (WORSE)" if new[name][m] > old[name][m] else "")
                for m in METRICS
                if old[name][m] != new[name][m]
            ]
            if deltas:
                lines.append(f"~ {name}: " + "; ".join(deltas))
    return lines


def main() -> None:
    accept = "--accept" in sys.argv
    load_all()
    # The same exclusion set the sweep tests use: queries whose body
    # drives execution (streaming run-to-completion, fixpoint loops).
    from tests.test_plan_sweep import _EXECUTING

    spark = get_spark("plan_baseline")
    base: dict[str, dict[str, int]] = {}
    for name in sorted(QUERIES):
        if name in _EXECUTING:
            continue
        row = audit_one(name, QUERIES[name], spark)
        if row is None or "error" in row:
            print(f"# skip {name}: {row.get('error') if row else 'no row'}", file=sys.stderr)
            continue
        base[name] = {m: row[m] for m in METRICS}

    old: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
    lines = diff_baselines(old, base)
    if not lines:
        print(f"no change vs committed baseline ({len(base)} queries)")
        return
    print(f"diff vs committed baseline ({len(lines)} entries):")
    for line in lines:
        print("  " + line)
    worse = sum("(WORSE)" in line for line in lines)
    if worse:
        print(f"NOTE: {worse} entr{'y' if worse == 1 else 'ies'} WORSEN a metric — "
              "triage each in the commit message.")
    if not accept:
        print(f"DRY RUN — {OUT} NOT written. Re-run with --accept to overwrite.")
        sys.exit(1)
    with open(OUT, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(base)} queries")


if __name__ == "__main__":
    main()
