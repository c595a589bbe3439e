"""Probe: the char-3-gram build `substring(text, i, 3)` inside the
transform lambda walks O(i) bytes per call (UTF8String.substring
counts code points from the start), so the gram build is O(len^2)
bytes per document.  A `split(text, '')` code-point array projected
once makes each gram a 3-element concat — O(len) total.

Semantics: split('') yields per-CODE-POINT strings (Java regex treats
surrogate pairs atomically) and UTF8String.substring counts code
points, so concat(c[j], c[j+1], c[j+2]) == substring(text, j+1, 3)
for any unicode text; the <3-char guard reproduces the registered
form's greatest(len-2, 1) edge ([text] for short docs, [""] for
empty).

Forms (gram-set build only, noop sink):
  sub    - current: substring inside the lambda
  chars  - hoisted code-point array + concat lambda
  duck   - DuckDB building the same gram sets
  check  - value identity over the corpus

Usage: python scripts/ab_chargram_hoist.py <form> [corpus_dir]
  default corpus: .scratch/scale_llm_lowdens_x100
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

DEFAULT = REPO / ".scratch" / "scale_llm_lowdens_x100"
RUNS = 5
N = 3  # _NGRAM_N


def grams_sub(spark, sf):
    from atd_dockless_processing_spark.tables import load

    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(text) - {N - 1}, 1)),"
            f" i -> substring(text, i, {N}))"
        )
    )
    return load(spark, sf, "documents").select(
        "doc_id", "lang", grams.alias("grams")
    )


def grams_chars(spark, sf):
    from atd_dockless_processing_spark.tables import load

    d = load(spark, sf, "documents").select(
        "doc_id", "lang", "text", F.split("text", "").alias("c")
    )
    grams = F.array_distinct(
        F.expr(
            f"IF(size(c) < {N}, array(text),"
            f" transform(sequence(0, size(c) - {N}),"
            f" j -> concat(c[j], c[j + 1], c[j + 2])))"
        )
    )
    return d.select("doc_id", "lang", grams.alias("grams"))


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
    form = sys.argv[1] if len(sys.argv) > 1 else "check"
    sf = sys.argv[2] if len(sys.argv) > 2 else str(DEFAULT)
    if form == "duck":
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        sql = f"""
        SELECT MAX(len(grams)) FROM (
          SELECT list_distinct(list_transform(
            generate_series(1, greatest(length(text) - {N - 1}, 1)),
            i -> substr(text, CAST(i AS INTEGER), {N}))) AS grams
          FROM documents)
        """
        con.execute(sql).fetchall()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
        return

    from atd_dockless_processing_spark.session import get_spark

    spark = get_spark("ab-chargram")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if form == "check":
        # both builds emit grams in position order, so array_distinct
        # keeps identical first-occurrence order: compare the arrays
        # EXACTLY (stronger than the set comparison downstream needs)
        a = grams_sub(spark, sf).selectExpr(
            "sum(hash(doc_id, grams))").collect()[0][0]
        b = grams_chars(spark, sf).selectExpr(
            "sum(hash(doc_id, grams))").collect()[0][0]
        print(f"values identical: {a == b} ({a})")
        return
    fn = {"sub": grams_sub, "chars": grams_chars}[form]
    t = hot(lambda: fn(spark, sf))
    print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
