"""Instrumented bench run: bench.py's exact methodology (same run list,
same median-of-reps statistic, same construction-inside-timed-region)
plus per-query suite-state sampling, to isolate the r9 suite-state
slowdown (VERDICT r9 item 3: untouched late-suite queries regressed at
32 cores while the same code ran fine at 8).

Per query it logs one JSONL row to $OUT (default /tmp/bench_state.jsonl):
  name, median_sec, samples, n_persistent_rdds, storage_mem_bytes,
  jvm_heap_used, gc_time_ms (cumulative), elapsed_since_start.

NOT in the driver path — bench.py stays the contract surface.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def state_sample(spark) -> dict:
    sc = spark.sparkContext
    jsc = sc._jsc
    jvm = sc._jvm
    n_rdds = jsc.getPersistentRDDs().size()
    mem = 0
    disk = 0
    for info in jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    rt = jvm.java.lang.Runtime.getRuntime()
    heap_used = rt.totalMemory() - rt.freeMemory()
    gc_ms = 0
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        gc_ms += beans.get(i).getCollectionTime()
    # SQL CacheManager entry count (ranked persist accumulation)
    try:
        n_cached = (spark._jsparkSession.sharedState().cacheManager()
                    .numCachedEntries())
    except Exception:
        n_cached = -1
    return {"n_persistent_rdds": n_rdds, "storage_mem": mem,
            "storage_disk": disk, "heap_used": heap_used,
            "gc_time_ms": gc_ms, "n_sql_cached": n_cached}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get("OUT", "/tmp/bench_state.jsonl")
    import bench
    import __spark_entry__ as entrymod
    from qrapids_forecast_r_script_spark.lineage import release_stale
    from qrapids_forecast_r_script_spark.session import get_spark

    spark = get_spark("qrapids-bench-instrumented")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["part_filter_projection"](spark, sf_dir).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    t_start = time.time()
    timings: dict[str, float] = {}
    with open(out_path, "w") as fh:
        for name in bench.run_list(qs):
            fn = qs[name]
            samples = []
            try:
                for _ in range(reps):
                    if os.environ.get("NO_RELEASE") != "1":
                        release_stale(spark)
                    t0 = time.time()
                    fn(spark, sf_dir).count()
                    samples.append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                print(f"SKIP {name}: {exc}", file=sys.stderr)
                continue
            med = round(statistics.median(samples), 3)
            timings[name] = med
            row = {"name": name, "median_sec": med,
                   "samples": [round(s, 3) for s in samples],
                   "elapsed": round(time.time() - t_start, 1)}
            row.update(state_sample(spark))
            fh.write(json.dumps(row) + "\n")
            fh.flush()
    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "instrumented_suite_seconds", "value": total,
                      "n_queries": len(timings), "reps": reps}))


if __name__ == "__main__":
    main()
