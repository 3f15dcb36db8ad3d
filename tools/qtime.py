"""Per-query optimization harness (r9): time named queries standalone
and capture their ``explain("formatted")`` plans.

Usage:
  python tools/qtime.py [--reps N] [--explain DIR[:TAG]] name [name ...]

- Timing matches bench.py methodology exactly: ``fn(spark, sf_dir).count()``
  per rep, first rep is the warm-up, median reported (plus min/max so host
  noise is visible).
- ``--explain plans/r09:before`` additionally writes
  ``plans/r09/<name>_before.txt`` with the formatted physical plan.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    reps = 5
    explain_dir = None
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            spec = args[i + 1]
            explain_dir, _, explain_tag = spec.partition(":")
            i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from qrapids_forecast_r_script_spark.lineage import release_stale
    from qrapids_forecast_r_script_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    # warm the JVM + parquet footers like bench.py does
    qs["part_filter_projection"](spark, sf_dir).count()

    for name in names:
        fn = qs[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            suffix = f"_{explain_tag}" if explain_tag else ""
            path = os.path.join(explain_dir, f"{name}{suffix}.txt")
            plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted")
            with open(path, "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        samples = []
        build = []
        for r in range(reps):
            # same hygiene boundary as bench.py (r10): each rep starts
            # with no stale blocks / SQL-cache entries, outside the timer
            release_stale(spark)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            build.append(t1 - t0)
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        # median over ALL reps — bench.py's exact statistic; build =
        # DataFrame construction (py4j + any eager checkpoint jobs),
        # part of the same timed region
        med = statistics.median(samples)
        print(f"{name}: median={med:.3f}s  warm0={samples[0]:.3f}s  "
              f"min={min(samples):.3f}s  max={max(samples):.3f}s  "
              f"build={statistics.median(build):.3f}s  n={reps}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
