"""Dump .explain("formatted") for a key set to plans/r15/<key>_<tag>.txt.

Round-15 optimization-round evidence: the judge checks plan claims in
OPTIMIZATION_r15.md against these files. Plans are captured under
driver-real conditions (session.py get_spark + tune, sf0.1).

Usage: python scripts/dump_plans_r15.py <tag> [key ...]
  tag: "before" or "after"
  default key set: the 12 bench queries + the keys touched this round.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402

BENCH_KEYS = [
    "agg_groupby_q1", "srt_topk_global", "join_multiway_5",
    "win_topk_per_group", "agg_distinct_count", "fn_json_extract",
    "evt_tumbling_hour", "evt_sessionize_lag", "llm_dedup_exact",
    "llm_token_stats", "llm_cosine_topk", "agg_grouping_sets",
]
TOUCHED_KEYS = ["llm_rouge_overlap", "txt_repetition_filter", "agg_corr_cov"]


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:] or (BENCH_KEYS + TOUCHED_KEYS)
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plans-r15")
    sf_dir = "/root/testdata/sf0.1"
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{key}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {key}_{tag}.txt ({len(buf.getvalue())} bytes)", flush=True)


if __name__ == "__main__":
    main()
