"""Probe VERDICT r14 item 5: does llm_contamination_ngram throw on
docs with tokens < _CONTAM_N?  Synthesizes a corpus with 1-, 2-, 3-
and 4-token docs (incl. doc_id % 97 == 0 eval rows) and runs both the
registered plan and the DuckDB oracle."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("probe-contam-short")
    rows = [
        (0, "alpha", "en"),                      # eval row (0 % 97 == 0), 1 token
        (97, "alpha beta", "en"),                # eval row, 2 tokens
        (1, "x", "en"),                          # train, 1 token
        (2, "x y", "en"),                        # train, 2 tokens
        (3, "x y z", "en"),                      # train, 3 tokens
        (4, "a b c d", "en"),                    # train, exactly n tokens
        (194, "a b c d e", "en"),                # eval row, 5 tokens
        (5, "a b c d e f", "en"),                # train sharing 4-grams with 194
        (6, "", "en"),                           # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tmp = tempfile.mkdtemp(prefix="contam_short_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    out = QUERIES["llm_contamination_ngram"](spark, tmp)
    rows_out = sorted([tuple(r) for r in out.collect()])
    print("SPARK OK:", rows_out)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    oracle = sorted([tuple(r) for r in con.execute(
        ORACLES["llm_contamination_ngram"]).fetchall()])
    print("ORACLE OK:", oracle)
    print("MATCH:", rows_out == oracle)


if __name__ == "__main__":
    main()
