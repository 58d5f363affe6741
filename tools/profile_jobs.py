"""Job/stage-level profile of one catalog query via the Spark UI REST API.

Runs the query once on a warmed session (bench.py quiesce protocol),
then lists every job the run scheduled — job id, description, duration,
stage count, task count, executor-run/CPU totals — plus aggregate
totals. This is the instrument for orchestration-bound queries where
per-query wall is job-count x scheduling floor (OPTIMIZATION_r12
stored-index family): wall deltas at sf0.1 are ambient-noisy, job and
stage counts are exact.

Usage:
    python tools/profile_jobs.py name [name ...] [--sf-dir D] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize, quiesce  # noqa: E402
from laygo_python_spark.queries import QUERIES, load_all  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    load_all()
    # The session default disables the UI; the REST API is this tool's
    # entire instrument, so re-enable it here (profiling only — bench.py
    # and the registered queries never see this conf).
    spark = get_spark("profile_jobs", extra_conf={"spark.ui.enabled": "true"})
    materialize(QUERIES["q1_pricing_summary"](spark, args.sf_dir))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    materialize(spark.range(0, 1000, 1, cpus).mapInPandas(lambda it: it, schema="id long"))

    out: dict[str, dict] = {}
    for name in args.names:
        fn = QUERIES[name]
        # warm run so JIT/footers don't inflate the profiled pass
        quiesce(spark, deep=True)
        materialize(fn(spark, args.sf_dir))
        quiesce(spark)
        before = {j["jobId"] for j in _rest(spark, "jobs")}
        materialize(fn(spark, args.sf_dir))
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        stages = {s["stageId"]: s for s in _rest(spark, "stages")}
        rows = []
        tot_run = tot_cpu = tot_stages = tot_tasks = 0
        for j in jobs:
            sids = j.get("stageIds", [])
            srun = sum(stages[s].get("executorRunTime", 0) for s in sids if s in stages)
            scpu = sum(stages[s].get("executorCpuTime", 0) for s in sids if s in stages)
            ntask = sum(stages[s].get("numCompleteTasks", 0) for s in sids if s in stages)
            live = [s for s in sids if s in stages and stages[s].get("numCompleteTasks", 0)]
            tot_run += srun
            tot_cpu += scpu
            tot_stages += len(live)
            tot_tasks += ntask
            rows.append(
                {
                    "job": j["jobId"],
                    "desc": (j.get("description") or j.get("name") or "")[:110],
                    "stages": len(live),
                    "tasks": ntask,
                    "runMs": srun,
                    "cpuMs": scpu // 1_000_000,
                }
            )
        summary = {
            "n_jobs": len(jobs),
            "n_stages": tot_stages,
            "n_tasks": tot_tasks,
            "executorRunMs": tot_run,
            "executorCpuMs": tot_cpu // 1_000_000,
            "jobs": rows,
        }
        out[name] = summary
        print(f"\n== {name}: jobs={len(jobs)} stages={tot_stages} tasks={tot_tasks} "
              f"execRun={tot_run}ms cpu={tot_cpu // 1_000_000}ms")
        for r in rows:
            print(f"  job {r['job']:>4} stages={r['stages']} tasks={r['tasks']:>4} "
                  f"run={r['runMs']:>6}ms cpu={r['cpuMs']:>6}ms  {r['desc']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
