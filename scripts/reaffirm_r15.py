"""Re-affirm CLOSED-constant stamps (VERDICT r14 item 1): per key, a
fresh same-session ×100 re-measure — registered plan hot (fresh
instance per run, median of 5 toPandas) paired with the DuckDB oracle
(median of 3) in the same process/window.  One key per invocation
(isolated-process discipline across keys).

Usage: python scripts/reaffirm_r15.py <key> [corpus_dir]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

X100 = REPO / ".scratch" / "scale_x100"


def main() -> None:
    key = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else str(X100)

    import duckdb

    from atd_dockless_processing_spark import ORACLES, QUERIES
    from atd_dockless_processing_spark.session import get_spark
    from atd_dockless_processing_spark.tables import TABLES

    spark = get_spark("reaffirm-r15")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def build():
        df = QUERIES[key](spark, sf)
        df._jdf.queryExecution().executedPlan()
        return df

    build().toPandas()  # warm: analysis + codegen + JIT
    times = []
    for _ in range(5):
        df = build()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    s_med = statistics.median(times)

    import os

    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
            )
        except Exception:
            pass
    sql = ORACLES[key]
    con.execute(sql).fetchall()
    dtimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dtimes.append(time.perf_counter() - t0)
    d_med = statistics.median(dtimes)
    print(
        f"{key}: spark {s_med:.3f} s vs duck {d_med:.3f} s = "
        f"{s_med / d_med:.2f}x  (spark runs {[round(t, 3) for t in times]})"
    )


if __name__ == "__main__":
    main()
