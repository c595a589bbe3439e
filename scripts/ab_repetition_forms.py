"""Probe: txt_repetition_filter sorted run-length form vs the
registered quadratic-HOF form at x100, plus the DuckDB oracle.

The registered form's per-doc mode count —
``array_max(transform(array_distinct(g2), x -> size(filter(g2, ...))))``
— rescans the WHOLE gram array once per distinct gram: O(d·n) string
compares per row, quadratic in document length (the llm_rouge_overlap
disease, per-row instead of per-pair). Both the max multiplicity and
the distinct count fall out of ONE ``array_sort`` + a linear
``aggregate`` run-length walk (equal neighbors extend the run; a new
value starts one): O(n log n) + O(n) per row. The walk's outputs are
the SAME integers (max run length = max multiplicity; number of runs =
distinct count), so dup2_frac / top2_frac / every aggregate are
bit-identical.

Usage: python scripts/ab_repetition_forms.py [form ...] where form in
{sorted, reg, duck}. Default: value check + all three in-process
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
from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


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
        "sorted",
        "reg",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{X100}/documents.parquet/*.parquet')"
        )
        sql = ORACLES["txt_repetition_filter"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"sorted", "reg"} & set(forms):
        from atd_dockless_processing_spark.operators.pipeline_r2 import (
            _repetition_quadratic_twin,
        )

        spark = get_spark("ab-rep")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # sorted = the REGISTERED run-length form (post-r14
        # registration); reg = the pre-r14 quadratic twin.
        srt = lambda: QUERIES["txt_repetition_filter"](spark, sf)  # noqa: E731
        quad = lambda: _repetition_quadratic_twin(spark, sf)  # noqa: E731
        if "sorted" in forms and "reg" in forms:
            ps = srt().toPandas().sort_values("lang")
            pr = quad().toPandas().sort_values("lang")
            same = ps.reset_index(drop=True).equals(pr.reset_index(drop=True))
            print(f"values identical: {same}")
            if not same:
                print(ps)
                print(pr)
        for form in forms:
            if form == "duck":
                continue
            fn = {"sorted": srt, "reg": quad}[form]
            t = hot(spark, fn)
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
