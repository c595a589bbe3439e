"""Round-8 operators — SURVEY.md §2.28.

Training-data-pipeline additions past the r7 surface. House
exactness discipline: integer counts everywhere (no cross-engine
double accumulation), deterministic tie-breaks on every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_BPE_TOPK = 10


@query(
    "llm_bpe_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents, unnest(string_split(text, ' ')) t(w)
      WHERE length(w) >= 2
      GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substr(word, CAST(i AS INTEGER), 2)))
               AS pair,
             c
      FROM words
    ), agg AS (
      SELECT pair, CAST(SUM(c) AS BIGINT) AS n_pairs FROM pairs GROUP BY pair
    )
    SELECT pair, n_pairs, CAST(rnk AS INTEGER) AS rnk FROM (
      SELECT pair, n_pairs,
             ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair) AS rnk
      FROM agg
    ) WHERE rnk <= {_BPE_TOPK}
    """,
)
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration over the corpus — the inner loop of
    tokenizer vocabulary induction (Sennrich'16), distributed: count
    every adjacent character pair inside every word occurrence and
    rank; the rank-1 pair is this iteration's merge (applying it is a
    map-side replace, and the next iteration re-runs this plan over
    the re-tokenized corpus).

    Scale shape — the reason BPE training survives 100 TB: BOTH agg
    exchanges collapse to VOCABULARY size map-side, never corpus
    size. The word count's partial agg reduces the token stream to
    distinct words per partition before the shuffle; the pair count
    then runs over the (word, count) summary — at any corpus size
    the shuffled bytes are O(|vocab|), and pair application is
    embarrassingly parallel. Integer counts end-to-end, ties broken
    lexicographically — cross-engine exact with no float hazard.

    Words shorter than 2 symbols carry no pair (both engines filter
    them BEFORE pair generation — Spark's sequence(1, 0) would
    otherwise produce a DESCENDING [1, 0] range, hazard: never feed
    sequence() an empty-range request)."""
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "c",
    )
    agg = pairs.groupBy("pair").agg(F.sum("c").cast("long").alias("n_pairs"))
    w = Window.orderBy(F.desc("n_pairs"), "pair")
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _BPE_TOPK)
        .select("pair", "n_pairs", "rnk")
    )
