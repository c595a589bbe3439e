"""evt_rfm_segments floor decomposition (r8 VERDICT item 5).

The r8 A/B closed the ntile term (gather form == rfm_agg_only floor);
this script prices the REMAINING 3.0x with a bench_decompose-grade
term table so the SCALE.md row carries a measured decomposition, not
a floor assertion. Terms, each hot-timed on a fresh plan instance
(both engines on the same xN corpus):

  T1 filtered count       — purchase filter over the event_type column
                            only (count() prunes everything else): the
                            minimum possible pass over the table.
  T2 global agg           — max(ts), sum(value), count over the SAME
                            filter: the full 4-column scan + a trivial
                            combinable agg, NO per-user state.
  T3 per-user agg         — rfm_agg_only: adds the per-user hash agg +
                            one exchange (the floor the r8 A/B named).
  T4 full registered key  — adds the single-partition Arrow gather,
                            closed-form ntile x3, segment agg.

The decomposition claim to verify: T4 - T3 ~ 0 (ntile is closed) and
T3 is dominated by T2 (the scan, not the per-user state), i.e. the
residual ratio vs DuckDB is the relative speed of the two engines'
parquet scan + filter kernels on this shape — a constant factor, not
a plan defect.

Usage: python scripts/rfm_decompose.py [--runs 5] [--mult 100]
(the xN corpus must exist: scripts/scale_rehearsal.py builds it)
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

from atd_dockless_processing_spark import ORACLES, QUERIES, TABLES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402


def _ev(spark, sf_dir):
    return load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")


def _per_user(spark, sf_dir):
    return _ev(spark, sf_dir).groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("value").alias("monetary"),
    )


def hot(fn, runs):
    """Median hot wall time; fresh plan instance per execution (no
    shuffle-output reuse), action chosen by the caller inside fn."""
    fn()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 5
    mult = int(sys.argv[sys.argv.index("--mult") + 1]) if "--mult" in sys.argv else 100
    out = str(REPO / ".scratch" / f"scale_x{mult}")
    if not (Path(out) / "events.parquet").exists():
        raise SystemExit(f"{out}/events.parquet missing — run scale_rehearsal.py first")
    spark = get_spark("rfm-decompose")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    terms = {
        "T1 filtered count (1-col scan)": lambda: _ev(spark, out).count(),
        "T2 global agg (4-col scan, no per-user)": lambda: _ev(spark, out)
        .agg(F.max("ts"), F.sum("value"), F.count(F.lit(1)))
        .collect(),
        "T3 per-user agg (rfm_agg_only floor)": lambda: _per_user(spark, out).count(),
        "T4 full registered key": lambda: QUERIES["evt_rfm_segments"](
            spark, out
        ).toPandas(),
    }
    spark_t = {}
    print(f"# corpus: {out}, runs={runs}")
    print("| term | spark | duckdb 4t |")
    print("|---|---|---|")

    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in TABLES:
        p = Path(out) / f"{t}.parquet"
        if not p.exists():
            continue
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    duck_terms = {
        "T1 filtered count (1-col scan)":
            "SELECT COUNT(*) FROM events WHERE event_type = 'purchase'",
        "T2 global agg (4-col scan, no per-user)":
            "SELECT MAX(ts), SUM(value), COUNT(*) FROM events "
            "WHERE event_type = 'purchase'",
        "T3 per-user agg (rfm_agg_only floor)":
            "SELECT COUNT(*) FROM (SELECT user_id, MAX(ts), COUNT(*), "
            "SUM(value) FROM events WHERE event_type = 'purchase' "
            "GROUP BY user_id)",
        "T4 full registered key": ORACLES["evt_rfm_segments"],
    }
    for name in terms:
        spark_t[name] = hot(terms[name], runs)
        sql = duck_terms[name]
        d = hot(lambda: con.execute(sql).fetchall(), runs)
        print(f"| {name} | {spark_t[name]:.3f} s | {d:.3f} s |")
    t1, t2, t3, t4 = (spark_t[k] for k in terms)
    print(
        f"# deltas: 4col-scan-over-count {t2 - t1:+.3f} s, "
        f"per-user-state {t3 - t2:+.3f} s, ntile+segment {t4 - t3:+.3f} s"
    )


if __name__ == "__main__":
    main()
