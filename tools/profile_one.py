"""Profile one (or more) catalog queries in isolation: min-of-N noop-sink
timing (bench.py protocol: light quiesce between runs, deep quiesce up
front) plus the formatted physical plan written to plans/r12/.

Usage:
    python tools/profile_one.py name [name ...] [--runs N] [--suffix before]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 by default.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize, quiesce  # noqa: E402
from laygo_python_spark.queries import QUERIES, load_all  # noqa: E402
from laygo_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--suffix", default=None, help="write <plan-dir>/<name>_<suffix>.txt")
    ap.add_argument("--plan-dir", default="plans/r13")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    load_all()
    spark = get_spark("profile_one")
    # session + python-worker warmup (bench.py protocol)
    materialize(QUERIES["q1_pricing_summary"](spark, args.sf_dir))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    materialize(spark.range(0, 1000, 1, cpus).mapInPandas(lambda it: it, schema="id long"))

    for name in args.names:
        fn = QUERIES[name]
        if args.suffix:
            try:
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                os.makedirs(args.plan_dir, exist_ok=True)
                with open(f"{args.plan_dir}/{name}_{args.suffix}.txt", "w") as f:
                    f.write(plan)
            except Exception as exc:  # noqa: BLE001
                print(f"# plan dump failed for {name}: {exc}", file=sys.stderr)
        quiesce(spark, deep=True)
        times = []
        for _ in range(args.runs):
            quiesce(spark)
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf_dir))
            times.append(time.perf_counter() - t0)
        load1 = round(os.getloadavg()[0], 2)
        print(
            f"{name}: min={min(times):.3f} mean={sum(times)/len(times):.3f} "
            f"runs={[round(t, 3) for t in times]} load1={load1}"
        )


if __name__ == "__main__":
    main()
