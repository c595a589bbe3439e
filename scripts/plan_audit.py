"""Regenerate the PLANS.md audit table: per-operator physical-plan
stats (shuffles, broadcasts, scans, pushdown, pruning) at sf0.1.

Usage: python scripts/plan_audit.py [key ...]   (default: headline set)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_groupby_q1", "srt_topk_global", "join_multiway_5",
    "win_topk_per_group", "fn_json_extract", "evt_tumbling_hour",
    "llm_dedup_exact", "llm_token_stats", "llm_cosine_topk",
    "llm_dedup_near_minhash", "llm_dedup_simhash", "flt_range",
    "agg_distinct_count", "evt_sessionize_lag", "txt_fingerprint",
    "llm_ann_ivf", "join_asof", "snk_upsert_merge",
    "agg_grouping_sets", "geo_bbox_join",
    "geo_point_in_polygon_table", "geo_od_matrix", "dq_profile_table",
    "mm_decode_wav", "agg_hll_deterministic", "src_binary_files",
    "mm_frame_sample", "dq_psi_drift", "agg_cms_heavy_hitters",
]


def audit(spark, sf_dir: str, key: str) -> str:
    df = QUERIES[key](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    n_bcast = plan.count("BroadcastExchange")
    topk = "TakeOrderedAndProject" in plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    f = buf.getvalue()
    pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", f) if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", f)
    widest = max((len(s.split(",")) for s in schemas), default=0)
    return (
        f"| `{key}` | {n_exch} | {n_bcast} | {len(schemas)} | {len(pushed)}"
        f" | {widest} |{' topk' if topk else ''} |"
    )


def main() -> None:
    keys = sys.argv[1:] or HEADLINE
    spark = get_spark("plan-audit")
    sf_dir = "/root/testdata/sf0.1"
    print("| key | shuffles | bcast | scans | pushed | max cols read | note |")
    print("|---|---|---|---|---|---|---|")
    for key in keys:
        print(audit(spark, sf_dir, key))


if __name__ == "__main__":
    main()
