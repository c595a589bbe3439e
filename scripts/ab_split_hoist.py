"""Isolated-process x100 A/B for the r15 split-hoist rewrites
(llm_rouge_overlap, txt_repetition_filter): the r14 forms re-ran
`split(text, ' ')` once PER ELEMENT inside the interpreted gram-build
lambda; r15 projects the token array once and the lambda reads a
bound reference.  Direction probe: scripts/ab_gram_hoist.py (gram
build alone: inline 29.2 s vs hoisted 2.49 s vs DuckDB 2.28 s).

Run each form in its OWN process (isolated-process protocol,
OPTIMIZATION_r14.md):
  python scripts/ab_split_hoist.py check        # value identity, both keys
  python scripts/ab_split_hoist.py rouge_reg    # registered (hoisted)
  python scripts/ab_split_hoist.py rouge_inline # r14 form (inline split)
  python scripts/ab_split_hoist.py rouge_duck
  python scripts/ab_split_hoist.py rep_reg | rep_inline | rep_duck
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5

_MERGE = (
    "aggregate(sequence(1, size(ga) + size(gb)), "
    "named_struct('i', 1, 'j', 1, 'ov', 0L), "
    "(acc, _) -> CASE "
    "WHEN acc.i > size(ga) OR acc.j > size(gb) THEN acc "
    "WHEN element_at(ga, acc.i) = element_at(gb, acc.j) "
    "  THEN named_struct('i', acc.i + 1, 'j', acc.j + 1, 'ov', acc.ov + 1L) "
    "WHEN element_at(ga, acc.i) < element_at(gb, acc.j) "
    "  THEN named_struct('i', acc.i + 1, 'j', acc.j, 'ov', acc.ov) "
    "ELSE named_struct('i', acc.i, 'j', acc.j + 1, 'ov', acc.ov) "
    "END, acc -> acc.ov)"
)


def rouge_inline(spark, sf):
    """The r14 registered form: merge scoring over INLINE-built grams
    (split re-evaluated per element)."""
    from atd_dockless_processing_spark.operators.pipeline_r6f import _bigrams
    from atd_dockless_processing_spark.tables import load

    g = load(spark, sf, "documents").select(
        "source", "doc_id", F.array_sort(_bigrams("text")).alias("gr")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = g.select(
        F.col("doc_id").alias("a_id"),
        F.col("gr").alias("ga"),
        F.lead("doc_id").over(w).alias("b_id"),
        F.lead("gr").over(w).alias("gb"),
    ).where(F.col("b_id").isNotNull())
    scored = pairs.select(
        "a_id",
        "b_id",
        F.size("ga").cast("long").alias("n_a"),
        F.size("gb").cast("long").alias("n_b"),
        F.expr(_MERGE).alias("ov"),
    )
    return scored.select(
        "a_id", "b_id", "n_a", "n_b", "ov",
        F.expr("(1000 * ov) div nullif(n_a, 0)").alias("p_milli"),
        F.expr("(1000 * ov) div nullif(n_b, 0)").alias("r_milli"),
    )


def rep_inline(spark, sf):
    """The r14 registered form: sorted run-length walk over
    INLINE-built grams."""
    from atd_dockless_processing_spark.operators.pipeline_r2 import (
        _repetition_g2,
        _repetition_tail,
    )
    from atd_dockless_processing_spark.tables import load

    d = load(spark, sf, "documents").select("lang", _repetition_g2())
    rl = F.expr(
        "aggregate(array_sort(g2),"
        " struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best,"
        "        0L AS nd),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(x <=> a.prev, a.run + 1, 1L),"
        "   'best', GREATEST(a.best, IF(x <=> a.prev, a.run + 1, 1L)),"
        "   'nd', a.nd + IF(x <=> a.prev, 0L, 1L)),"
        " a -> struct(a.best AS best, a.nd AS nd))"
    )
    w = d.select("lang", F.size("g2").cast("double").alias("n_g"), rl.alias("rl"))
    ng = F.nullif(F.col("n_g"), F.lit(0.0))
    dup2 = (F.col("n_g") - F.col("rl.nd").cast("double")) / ng
    top2 = F.col("rl.best").cast("double") / ng
    m = w.select("lang", dup2.alias("dup2_frac"), top2.alias("top2_frac"))
    return _repetition_tail(m)


def hot(build_df, runs=RUNS) -> float:
    build_df().toPandas()
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def duck(key: str) -> None:
    import duckdb

    from atd_dockless_processing_spark import ORACLES

    con = duckdb.connect()
    con.execute("SET threads TO 4")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{X100}/documents.parquet/*.parquet')"
    )
    sql = ORACLES[key]
    con.execute(sql).fetchall()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
    print(f"duck[{key}] {statistics.median(times):.3f} s")


def main() -> None:
    form = sys.argv[1] if len(sys.argv) > 1 else "check"
    sf = str(X100)
    if form == "rouge_duck":
        duck("llm_rouge_overlap")
        return
    if form == "rep_duck":
        duck("txt_repetition_filter")
        return

    from atd_dockless_processing_spark import QUERIES
    from atd_dockless_processing_spark.session import get_spark

    spark = get_spark("ab-split-hoist")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if form == "check":
        for key, old in (
            ("llm_rouge_overlap", rouge_inline),
            ("txt_repetition_filter", rep_inline),
        ):
            sort_cols = ["a_id", "b_id"] if key.startswith("llm") else ["lang"]
            a = (
                QUERIES[key](spark, sf).toPandas()
                .sort_values(sort_cols).reset_index(drop=True)
            )
            b = old(spark, sf).toPandas().sort_values(sort_cols).reset_index(drop=True)
            print(f"{key} values identical: {a.equals(b)}")
        return
    fn = {
        "rouge_reg": lambda s, d: QUERIES["llm_rouge_overlap"](s, d),
        "rouge_inline": rouge_inline,
        "rep_reg": lambda s, d: QUERIES["txt_repetition_filter"](s, d),
        "rep_inline": rep_inline,
    }[form]
    t = hot(lambda: fn(spark, sf))
    print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
