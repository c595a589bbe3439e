"""Probe: is `split(text, ' ')` re-evaluated PER ELEMENT inside the
bigram transform lambda (HOFs are interpreted, no cross-iteration
subexpression elimination)?  If so, hoisting the split into a prior
projection cuts O(n_tokens * len) char work to O(len) per doc in the
gram build shared by llm_rouge_overlap / txt_repetition_filter /
txt_ngram_topk.

Forms (each timed with the noop sink, guide §1.4):
  lam    - current form: split inside the lambda (3 evals per gram)
  hoist  - tok = split(text) projected first, lambda references tok
  duck   - DuckDB building the same grams (list_transform over tok)

Usage: python scripts/ab_gram_hoist.py [lam|hoist|duck ...]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def grams_lambda(spark, sf):
    g = F.when(
        F.size(F.split("text", " ")) >= 2,
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2), "
            "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return load(spark, sf, "documents").select(
        "doc_id", F.array_sort(g).alias("gr")
    )


def grams_hoist(spark, sf):
    d = load(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("tok")
    )
    g = F.when(
        F.size("tok") >= 2,
        F.expr(
            "transform(sequence(0, size(tok) - 2), "
            "i -> concat(tok[i], ' ', tok[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.array_sort(g).alias("gr"))


def hot(build_df, runs=RUNS) -> float:
    build_df().write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    forms = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "lam",
        "hoist",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{X100}/documents.parquet/*.parquet')"
        )
        sql = """
        WITH t AS (SELECT doc_id, string_split(text,' ') AS tok FROM documents)
        SELECT MAX(len(gr)) FROM (
          SELECT CASE WHEN len(tok) >= 2
                 THEN list_sort(list_transform(generate_series(1, len(tok)-1),
                                i -> tok[i] || ' ' || tok[i+1]))
                 ELSE [] END AS gr
          FROM t)
        """
        con.execute(sql).fetchall()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    spark_forms = {"lam", "hoist"} & set(forms)
    if spark_forms:
        spark = get_spark("ab-gram-hoist")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        if spark_forms == {"lam", "hoist"}:
            a = grams_lambda(spark, sf).selectExpr(
                "sum(hash(doc_id, gr))").collect()[0][0]
            b = grams_hoist(spark, sf).selectExpr(
                "sum(hash(doc_id, gr))").collect()[0][0]
            print(f"values identical: {a == b} ({a})")
        for form in forms:
            if form == "duck":
                continue
            fn = {"lam": grams_lambda, "hoist": grams_hoist}[form]
            t = hot(lambda: fn(spark, sf))
            print(f"{form} {t:.3f} s")
            if form == "hoist":
                # confirm the projection survived CollapseProject
                plan = (
                    fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
                )
                n_split = plan.count("split(text")
                print(f"  split(text occurrences in hoist plan: {n_split}")


if __name__ == "__main__":
    main()
