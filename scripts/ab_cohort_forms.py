"""Probe: evt_cohort_retention week-bitmask form vs the registered
collect_set form at x100, plus the DuckDB oracle denominator.

The registered form's per-user distinct-week gather runs as
ObjectHashAggregate collect_set — off whole-stage codegen, array
partials through the exchange. The candidate packs each user's active
weeks into 64-bit bucket masks (guide §2.3 narrower types / §2.4 keep
the plan in codegen): idx = datediff(week, DATE'1970-01-05') / 7 (both
Mondays, so the division is exact for ANY date), bucket = idx >> 6 and
pos = idx & 63 (arithmetic shift / two's-complement mask = exact
floor/pmod semantics, no sign precondition), one codegen
bit_or(1L << pos) agg per (user, bucket), then the weeks explode back
out of the mask via a 64-lambda filter over users x buckets rows (tiny)
and cohort_week = min(active_week) over the user partition. Set
semantics are preserved bit-for-bit: bit_or IS set union on the bucket
domain, and date_add(origin, idx*7) inverts the index exactly.

Usage: python scripts/ab_cohort_forms.py [form ...] where form in
{bits, reg, duck}. Default: value check + all three in-process
(probe only — the registering A/B must be isolated per process,
r14 lesson).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def cohort_bits(ev):
    """Week-bitmask form: codegen bit_or over (user, bucket)."""
    wk = F.date_trunc("week", F.col("ts").cast("timestamp")).cast("date")
    idx = (F.datediff(wk, F.lit("1970-01-05").cast("date")) / 7).cast("int")
    t = ev.select(F.col("user_id"), idx.alias("idx")).select(
        "user_id",
        F.shiftright(F.col("idx"), 6).alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), idx & 63)").alias("bit"),
    )
    b = t.groupBy("user_id", "bucket").agg(F.bit_or("bit").alias("mask"))
    weeks = b.select(
        "user_id",
        F.explode(
            F.expr(
                "transform(filter(sequence(0, 63),"
                " i -> (shiftright(mask, i) & 1) = 1),"
                " i -> date_add(DATE'1970-01-05', (bucket * 64 + i) * 7))"
            )
        ).alias("active_week"),
    )
    w = Window.partitionBy("user_id")
    return (
        weeks.withColumn("cohort_week", F.min("active_week").over(w))
        .groupBy("cohort_week", "active_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def hot(spark, build_df, runs=RUNS) -> float:
    build_df().toPandas()
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    forms = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "bits",
        "reg",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{X100}/events.parquet/*.parquet')"
        )
        sql = ORACLES["evt_cohort_retention"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"bits", "reg"} & set(forms):
        spark = get_spark("ab-cohort")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        ev = lambda: load(spark, sf, "events")  # noqa: E731
        reg = lambda: QUERIES["evt_cohort_retention"](spark, sf)  # noqa: E731
        if "bits" in forms and "reg" in forms:
            pb = (
                cohort_bits(ev())
                .toPandas()
                .sort_values(["cohort_week", "active_week"])
            )
            pr = reg().toPandas().sort_values(["cohort_week", "active_week"])
            same = pb.reset_index(drop=True).equals(pr.reset_index(drop=True))
            print(f"values identical: {same}")
            if not same:
                print(pb)
                print(pr)
        for form in forms:
            if form == "duck":
                continue
            fn = {"bits": lambda: cohort_bits(ev()), "reg": reg}[form]
            t = hot(spark, fn)
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
