"""r14 optimization-round A/Bs at x100 (hot method: fresh plan
instance per run, build outside the timer, AQE off, median of N).

Forms measured:
- agg_percentiles: registered histogram-exact vs percentile() twin
  (and the DuckDB oracle as the ratio denominator)
- txt_token_bpe: registered regexp_count vs size(regexp_extract_all)
  twin (and the oracle)
- txt_pii_mask counts: regexp_count candidate vs registered
  size(regexp_extract_all) (probe only — not registered unless it wins)

Usage: python scripts/ab_r14_opt.py [--runs 3]
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

X100 = REPO / ".scratch" / "scale_x100"
RUNS = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3


def hot(spark, build_df, runs=RUNS) -> float:
    build_df().toPandas()  # warm: codegen + JIT
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def duck(con, sql, runs=RUNS) -> float:
    con.execute(sql).fetchall()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    spark = get_spark("ab-r14")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sf = str(X100)
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in ("orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{X100}/{t}.parquet/*.parquet')"
        )

    from atd_dockless_processing_spark.operators.aggregates import (
        _percentiles_exact_hist,
        _percentiles_plan,
    )

    o = lambda: load(spark, sf, "orders")  # noqa: E731
    d_pctl = duck(con, ORACLES["agg_percentiles"])
    s_hist = hot(spark, lambda: _percentiles_exact_hist(o()))
    s_obj = hot(spark, lambda: _percentiles_plan(o(), exact=True))
    print(
        f"| agg_percentiles | x100 | duck {d_pctl:.3f} s | "
        f"hist(REGISTERED) {s_hist:.3f} s ({s_hist / d_pctl:.2f}x) | "
        f"percentile() twin {s_obj:.3f} s ({s_obj / d_pctl:.2f}x) |",
        flush=True,
    )

    from atd_dockless_processing_spark.operators.text import _BPE_PATTERN

    docs = lambda: load(spark, sf, "documents")  # noqa: E731

    def bpe(nt_col):
        def build():
            d = docs().select("lang", nt_col.alias("nt"))
            return d.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("total_tokens"),
                F.round(F.avg("nt"), 4).alias("avg_tokens"),
            )

        return build

    d_bpe = duck(con, ORACLES["txt_token_bpe"])
    s_cnt = hot(spark, bpe(F.regexp_count("text", F.lit(_BPE_PATTERN))))
    s_arr = hot(
        spark,
        bpe(F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))),
    )
    print(
        f"| txt_token_bpe | x100 | duck {d_bpe:.3f} s | "
        f"regexp_count(REGISTERED) {s_cnt:.3f} s ({s_cnt / d_bpe:.2f}x) | "
        f"extract_all twin {s_arr:.3f} s ({s_arr / d_bpe:.2f}x) |",
        flush=True,
    )

    from atd_dockless_processing_spark.operators.pipeline_r2 import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    t_masked = F.col("text")

    def pii_counts(counter):
        def build():
            return docs().select(
                counter(t_masked, _EMAIL_RE).alias("n_emails"),
                counter(t_masked, _PHONE_RE).alias("n_phones"),
            ).groupBy().agg(
                F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p")
            )

        return build

    size_extract = lambda c, p: F.size(  # noqa: E731
        F.regexp_extract_all(c, F.lit(p), F.lit(0))
    )
    re_count = lambda c, p: F.regexp_count(c, F.lit(p))  # noqa: E731
    s_pii_arr = hot(spark, pii_counts(size_extract))
    s_pii_cnt = hot(spark, pii_counts(re_count))
    print(
        f"| pii count probe | x100 | extract_all {s_pii_arr:.3f} s | "
        f"regexp_count {s_pii_cnt:.3f} s |",
        flush=True,
    )


if __name__ == "__main__":
    main()
