"""Decompose the sf0.1 bench totals: per-query wall time vs
scheduler-visible structure (jobs, stages, tasks, summed executor
run/CPU time) under the exact bench harness (cached 4-partition
tables, shuffle.partitions=4, AQE off, fresh plan instance per run).

Purpose (round-6 verdict item 2): establish per-query overhead floors
— wall - (executor_run / slots) is time the DAG scheduler + py4j +
Arrow fetch spend, not execution — to either find a removable cost or
prove the remaining gap vs DuckDB is harness floor.

Usage: python scripts/bench_decompose.py [--locality0] [key ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
import atd_dockless_processing_spark.tables as tables  # noqa: E402

from bench import BENCH_SET  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-decompose")
    if "--locality0" in sys.argv:
        spark.conf.set("spark.locality.wait", "0ms")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    cache: dict[tuple[str, str], object] = {}

    def provider(s, d, name):
        key = (d, name)
        if key not in cache:
            tables.set_table_provider(None)
            try:
                df = tables.load(s, d, name).repartition(4).cache()
                df.count()
                cache[key] = df
            finally:
                tables.set_table_provider(provider)
        return cache[key]

    tables.set_table_provider(provider)
    for t in tables.TABLES:
        provider(spark, sf_dir, t)

    keys = [a for a in sys.argv[1:] if not a.startswith("--")]
    items = [(m, k) for m, k in BENCH_SET.items() if not keys or k in keys or m in keys]

    print(f"{'metric':<20} {'wall_ms':>8} {'jobs':>4} {'stages':>6} {'tasks':>5} "
          f"{'run_ms':>7} {'cpu_ms':>7} {'run/32':>7} {'floor_ms':>8}")
    total_wall = total_floor = 0.0
    for metric, key in items:
        # warm-ups: analysis+codegen, then JIT
        QUERIES[key](spark, sf_dir).toPandas()
        QUERIES[key](spark, sf_dir).toPandas()
        walls = []
        stats = None
        for _ in range(5):
            df = QUERIES[key](spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df.toPandas()
            wall = time.perf_counter() - t0
            walls.append(wall)
            jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in before]
            n_stages = n_tasks = 0
            run_ms = cpu_ms = 0.0
            sids = set()
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji:
                    sids.update(ji.stageIds)
            for s in sids:
                si = tracker.getStageInfo(s)
                if si and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
            # executor run time via the lower-level listener metrics is
            # not exposed in pyspark's tracker; approximate with the
            # app status store through the JVM
            store = sc._jsc.sc().statusStore()
            dflt = [getattr(store, f"stageData$default${i}")() for i in (2, 3, 4, 5)]
            for s in sids:
                try:
                    data = store.stageData(s, *dflt)
                    if data.size() > 0:
                        sd = data.apply(0)
                        run_ms += sd.executorRunTime()
                        cpu_ms += sd.executorCpuTime() / 1e6
                except Exception:
                    pass
            stats = (len(jobs), n_stages, n_tasks, run_ms, cpu_ms)
        wall_ms = statistics.median(walls) * 1000
        jobs, n_stages, n_tasks, run_ms, cpu_ms = stats
        slots = sc.defaultParallelism
        floor = wall_ms - run_ms / slots
        total_wall += wall_ms
        total_floor += floor
        print(f"{metric:<20} {wall_ms:8.1f} {jobs:4d} {n_stages:6d} {n_tasks:5d} "
              f"{run_ms:7.1f} {cpu_ms:7.1f} {run_ms/slots:7.1f} {floor:8.1f}")
    print(f"{'TOTAL':<20} {total_wall:8.1f} {'':4} {'':6} {'':5} {'':7} {'':7} {'':7} {total_floor:8.1f}")


if __name__ == "__main__":
    main()
