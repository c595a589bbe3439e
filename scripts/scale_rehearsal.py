"""Scale-trajectory rehearsal (BASELINE.md "Scale trajectory"):
replicate sf0.1 xN with SHIFTED KEYS (each replica is a self-contained
key space, so join multiplicities stay realistic instead of
exploding), then run the two headline shapes SCAN-BASED on both
engines — Spark with AQE ON (the production config), DuckDB at the
baseline's 4 threads — and print a markdown row per shape.

Usage: python scripts/scale_rehearsal.py [--mult 100] [--runs 3]

The same SQL text (the registry oracles for agg_groupby_q1 /
srt_topk_global) runs on both engines over views of the same
replicated parquet; no caching on either side. Data lands in
.scratch/scale_x{N}/ and is reused if present.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import ORACLES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SHAPES = {
    "Q1 scan+agg": "agg_groupby_q1",
    "Q3 join+agg+topk": "srt_topk_global",
    # the reference's core domain: per-user event sessionization
    # (window + lag + agg); user_id shifts per replica, so each
    # replica is a fresh user cohort with realistic session lengths
    "sessionize window+agg": "evt_sessionize_lag",
}
# (table, [key columns to shift per replica])
REPL = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["user_id"],
}
SPANS = {"l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
         "o_custkey": 10_000_000, "c_custkey": 10_000_000,
         "user_id": 10_000_000}


def build(spark, mult: int) -> Path:
    out = REPO / ".scratch" / f"scale_x{mult}"
    for t, keys in REPL.items():
        if (out / f"{t}.parquet" / "_SUCCESS").exists():
            continue
        df = load(spark, BASE_SF, t).withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("_rep").cast("long") * SPANS[k])
        n_files = 32 if t in ("lineitem", "events") else 8
        (
            df.drop("_rep")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return out


def timed(fn, runs: int) -> float:
    fn()  # warm-up: JIT / OS page cache on both engines
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    mult = int(sys.argv[sys.argv.index("--mult") + 1]) if "--mult" in sys.argv else 100
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    spark = get_spark("scale-rehearsal")
    spark.conf.set("spark.sql.adaptive.enabled", "true")  # production config
    out = build(spark, mult)

    con = duckdb.connect()
    con.execute("SET threads TO 4")  # baseline harness thread count
    for t in REPL:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
        spark.read.parquet(str(out / f"{t}.parquet")).createOrReplaceTempView(t)

    print(f"| query shape | DuckDB 4t x{mult} | Spark local x{mult} (AQE on) | ratio |")
    print("|---|---|---|---|")
    for label, key in SHAPES.items():
        sql = ORACLES[key]

        def duck_run():
            con.execute(sql).fetchall()

        def spark_run():
            spark.sql(sql).toPandas()

        d = timed(duck_run, runs)
        s = timed(spark_run, runs)
        print(f"| {label} | {d:.3f} s | {s:.3f} s | {s / d:.2f}x |")


if __name__ == "__main__":
    main()
