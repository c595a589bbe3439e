"""Probe: llm_rouge_overlap decomposition + sorted-merge scoring form
at x100.

Forms:
  pairsonly - gram build + window pairing, no scoring (decompose)
  reg       - registered quadratic-HOF scoring
  merge     - sorted two-pointer merge scoring (linear per pair)
  duck      - oracle denominator

Usage: python scripts/ab_rouge_forms.py [form ...]
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
from atd_dockless_processing_spark.operators.pipeline_r6f import (  # noqa: E402
    _rouge_quadratic_twin,
)
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def _pairs(spark, sf, sort_grams=False):
    grams = F.when(
        F.size(F.split("text", " ")) >= 2,
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2), "
            "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    if sort_grams:
        grams = F.array_sort(grams)
    g = load(spark, sf, "documents").select(
        "source", "doc_id", grams.alias("gr")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return g.select(
        F.col("doc_id").alias("a_id"),
        F.col("gr").alias("ga"),
        F.lead("doc_id").over(w).alias("b_id"),
        F.lead("gr").over(w).alias("gb"),
    ).where(F.col("b_id").isNotNull())


def rouge_pairsonly(spark, sf):
    return _pairs(spark, sf).select(
        "a_id", "b_id", F.size("ga").alias("n_a"), F.size("gb").alias("n_b")
    )


def rouge_merge(spark, sf):
    """Sorted two-pointer merge: ga/gb sorted ONCE map-side; the
    clipped multiset intersection of two sorted arrays is a linear
    merge (equal -> count+advance both, else advance the smaller)."""
    pairs = _pairs(spark, sf, sort_grams=True)
    scored = pairs.select(
        "a_id",
        "b_id",
        F.size("ga").cast("long").alias("n_a"),
        F.size("gb").cast("long").alias("n_b"),
        F.expr(
            "aggregate(sequence(1, size(ga) + size(gb)), "
            "named_struct('i', 1, 'j', 1, 'ov', 0L), "
            "(acc, _) -> CASE "
            "WHEN acc.i > size(ga) OR acc.j > size(gb) THEN acc "
            "WHEN element_at(ga, acc.i) = element_at(gb, acc.j) "
            "  THEN named_struct('i', acc.i + 1, 'j', acc.j + 1, "
            "                    'ov', acc.ov + 1L) "
            "WHEN element_at(ga, acc.i) < element_at(gb, acc.j) "
            "  THEN named_struct('i', acc.i + 1, 'j', acc.j, 'ov', acc.ov) "
            "ELSE named_struct('i', acc.i, 'j', acc.j + 1, 'ov', acc.ov) "
            "END, acc -> acc.ov)"
        ).alias("ov"),
    )
    return scored.select(
        "a_id",
        "b_id",
        "n_a",
        "n_b",
        "ov",
        F.expr("(1000 * ov) div nullif(n_a, 0)").alias("p_milli"),
        F.expr("(1000 * ov) div nullif(n_b, 0)").alias("r_milli"),
    )


def _sorted_grams(col):
    tok = F.split(col, " ")
    return F.array_sort(
        F.when(
            F.size(tok) >= 2,
            F.expr(
                f"transform(sequence(0, size(split({col}, ' ')) - 2), "
                f"i -> concat(split({col}, ' ')[i], ' ', "
                f"split({col}, ' ')[i + 1]))"
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def rouge_textpair(spark, sf):
    """Ship TEXT through the pairing window (≈half the serialized
    bytes of the gram array), build both sides' sorted grams
    post-pairing, then the linear merge scoring."""
    d = load(spark, sf, "documents").select("source", "doc_id", "text")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = d.select(
        F.col("doc_id").alias("a_id"),
        F.col("text").alias("ta"),
        F.lead("doc_id").over(w).alias("b_id"),
        F.lead("text").over(w).alias("tb"),
    ).where(F.col("b_id").isNotNull())
    pairs = pairs.select(
        "a_id",
        "b_id",
        _sorted_grams("ta").alias("ga"),
        _sorted_grams("tb").alias("gb"),
    )
    scored = pairs.select(
        "a_id",
        "b_id",
        F.size("ga").cast("long").alias("n_a"),
        F.size("gb").cast("long").alias("n_b"),
        F.expr(
            "aggregate(sequence(1, size(ga) + size(gb)), "
            "named_struct('i', 1, 'j', 1, 'ov', 0L), "
            "(acc, _) -> CASE "
            "WHEN acc.i > size(ga) OR acc.j > size(gb) THEN acc "
            "WHEN element_at(ga, acc.i) = element_at(gb, acc.j) "
            "  THEN named_struct('i', acc.i + 1, 'j', acc.j + 1, "
            "                    'ov', acc.ov + 1L) "
            "WHEN element_at(ga, acc.i) < element_at(gb, acc.j) "
            "  THEN named_struct('i', acc.i + 1, 'j', acc.j, 'ov', acc.ov) "
            "ELSE named_struct('i', acc.i, 'j', acc.j + 1, 'ov', acc.ov) "
            "END, acc -> acc.ov)"
        ).alias("ov"),
    )
    return scored.select(
        "a_id",
        "b_id",
        "n_a",
        "n_b",
        "ov",
        F.expr("(1000 * ov) div nullif(n_a, 0)").alias("p_milli"),
        F.expr("(1000 * ov) div nullif(n_b, 0)").alias("r_milli"),
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
        "pairsonly",
        "merge",
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
        sql = ORACLES["llm_rouge_overlap"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    spark_forms = {"pairsonly", "merge", "reg", "textpair"} & set(forms)
    if spark_forms:
        spark = get_spark("ab-rouge")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        if {"merge", "reg"} <= set(forms):
            pm = (
                rouge_merge(spark, sf)
                .toPandas()
                .sort_values(["a_id", "b_id"])
                .reset_index(drop=True)
            )
            pr = (
                _rouge_quadratic_twin(spark, sf)
                .toPandas()
                .sort_values(["a_id", "b_id"])
                .reset_index(drop=True)
            )
            same = pm.equals(pr)
            print(f"values identical: {same}")
            if not same:
                import pandas as pd

                diff = (pm != pr).any(axis=1)
                print(pm[diff].head())
                print(pr[diff].head())
        for form in forms:
            if form == "duck":
                continue
            fn = {
                "pairsonly": rouge_pairsonly,
                "textpair": rouge_textpair,
                "merge": rouge_merge,
                "reg": _rouge_quadratic_twin,
            }[form]
            t = hot(spark, lambda: fn(spark, sf))
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
