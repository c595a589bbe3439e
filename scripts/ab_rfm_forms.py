"""evt_rfm_segments de-weak A/B (round-8 verdict item 3): the three
chained single-partition 150k-row NTILE sorts are ~0.6 s of the 1.38 s
x100 total. Candidate exact forms:

  A  registered: one per-user agg exchange + 3 CHAINED global ntile
     windows (each = Exchange SinglePartition + sort, serial).
  B  branch-join: per_user localCheckpoint barrier, 3 PARALLEL narrow
     ntile branches joined back on user_id (broadcast).
  C  single-gather Arrow scorer: per_user -> ONE single-partition
     gather -> mapInPandas computes all three ntiles with the CLOSED
     FORM (rank r 0-based, q=n//5, rem=n%5: bucket = r//(q+1) if
     r < rem*(q+1) else rem + (r-rem*(q+1))//q; +1) via stable
     np.lexsort (user_id tiebreak) and aggregates segments in-batch.
     Replaces 3 exchanges + 3 JVM sorts with 1 exchange + 1 Arrow
     pass over the small user dimension.
  C2 same as C but coalesce(1) instead of repartition(1) (no second
     exchange; the agg reduce runs single-task).

All forms must produce IDENTICAL rows (asserted). DuckDB runs the
registry oracle at 4 threads on the same x100 views for the ratio.

Usage: python scripts/ab_rfm_forms.py [--runs 5] [--mult 100]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import ORACLES, QUERIES, TABLES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402


def _per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return ev.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("value").alias("monetary"),
    )


def _segment_agg(scored):
    return scored.groupBy(
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")).alias(
            "segment"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("monetary"), 4).alias("segment_value"),
    )


def rfm_branch_join(spark, sf_dir):
    pu = _per_user(spark, sf_dir).localCheckpoint(eager=False)
    r = pu.select(
        "user_id",
        F.ntile(5).over(Window.orderBy("last_seen", "user_id")).alias("r_score"),
    )
    f = pu.select(
        "user_id",
        F.ntile(5).over(Window.orderBy("frequency", "user_id")).alias("f_score"),
    )
    m = pu.select(
        "user_id",
        "monetary",
        F.ntile(5).over(Window.orderBy("monetary", "user_id")).alias("m_score"),
    )
    scored = r.join(f, "user_id").join(m, "user_id")
    return _segment_agg(scored)


_OUT_SCHEMA = "segment string, n_users long, segment_value double"


def _score_batches(it):
    parts = list(it)
    pdf = pd.concat(parts) if parts else None
    if pdf is None or not len(pdf):
        return
    n = len(pdf)
    uid = pdf["user_id"].to_numpy()

    def ntile5(metric):
        idx = np.lexsort((uid, metric))  # primary metric, tiebreak user_id
        rank = np.empty(n, dtype=np.int64)
        rank[idx] = np.arange(n)
        q, rem = divmod(n, 5)
        cut = rem * (q + 1)
        return (
            np.where(rank < cut, rank // (q + 1), rem + (rank - cut) // np.maximum(q, 1))
            + 1
        )

    r = ntile5(pdf["last_seen"].to_numpy().astype("datetime64[us]").astype(np.int64))
    f = ntile5(pdf["frequency"].to_numpy())
    m = ntile5(pdf["monetary"].to_numpy())
    seg = r * 100 + f * 10 + m
    out = (
        pd.DataFrame({"seg": seg, "monetary": pdf["monetary"].to_numpy()})
        .groupby("seg", sort=False)
        .agg(n_users=("monetary", "size"), segment_value=("monetary", "sum"))
        .reset_index()
    )
    out["segment"] = out["seg"].astype(str)
    out["segment_value"] = out["segment_value"].round(4)
    yield out[["segment", "n_users", "segment_value"]]


def rfm_arrow_gather(spark, sf_dir, coalesce=False):
    pu = _per_user(spark, sf_dir)
    one = pu.coalesce(1) if coalesce else pu.repartition(1)
    return one.mapInPandas(_score_batches, _OUT_SCHEMA)


def hot(fn, runs):
    fn().toPandas()
    times = []
    for _ in range(runs):
        df = fn()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 5
    mult = int(sys.argv[sys.argv.index("--mult") + 1]) if "--mult" in sys.argv else 100
    out = str(REPO / ".scratch" / f"scale_x{mult}")
    spark = get_spark("ab-rfm")

    from atd_dockless_processing_spark.operators.pipeline_r3 import (
        _rfm_chained_plan,
    )

    forms = {
        # NOTE (r8): the registered key now dispatches to the Arrow
        # gather below the 50M-event gate, so form A calls the chained
        # plan DIRECTLY to keep the baseline reproducible
        "A chained ntile (pre-r8 registered)": lambda: _rfm_chained_plan(
            _per_user(spark, out)
        ),
        "A2 registered (gate dispatch)": lambda: QUERIES["evt_rfm_segments"](spark, out),
        "B branch-join (ckpt barrier)": lambda: rfm_branch_join(spark, out),
        "C arrow gather (repartition)": lambda: rfm_arrow_gather(spark, out),
        "C2 arrow gather (coalesce 1)": lambda: rfm_arrow_gather(spark, out, True),
    }

    # equality gate first (sorted rows, 4dp values already rounded)
    ref = None
    for name, fn in forms.items():
        got = sorted(map(tuple, fn().collect()))
        if ref is None:
            ref = got
        assert got == ref, f"{name} diverges: {got[:3]} vs {ref[:3]}"
    print(f"# all {len(forms)} forms identical ({len(ref)} segments)")

    for name, fn in forms.items():
        print(f"| {name} | {hot(fn, runs):.3f} s |")

    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in TABLES:
        p = Path(out) / f"{t}.parquet"
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    sql = ORACLES["evt_rfm_segments"]
    con.execute(sql).fetchall()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
    print(f"| DuckDB oracle 4t | {statistics.median(times):.3f} s |")


if __name__ == "__main__":
    main()
