"""SCALE.md ledger discipline (VERDICT r8 item 3).

Every key the round verdicts carry on the ">2x at its honest scale
row" weak list must have a machine-checkable status token — CLOSED
(measured floor, nothing left to compress) or DELIBERATE (the slowness
IS the declared surface, priced) — so the ledger is uniformly
auditable. The list is curated rather than regex-derived because the
"honest scale row" classification is editorial: SCALE.md also records
historical ratios ("was 4.69x"), oracle-advantage ratios ("4.2x
faster"), pruning factors, and sub-second ×10 dispatch-floor sweeps
that are priced collectively by the orchestration-floor bound
(BASELINE.md FORMAL BOUND), none of which need a per-row stamp.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The r8 verdict's weak list ("Performance vs baseline", count: 10) —
# grow this set whenever a round verdict adds a row.
WEAK_LIST = [
    "evt_rfm_segments",
    "txt_dedup_paragraphs",
    "snk_manifest_publish",
    "join_skew_salted",
    # sql_correlated_subquery left the weak list in r10: the window
    # form was PROMOTED to the registered plan (1.08-1.26x envelope)
    "llm_ann_ivf",
    "agg_percentiles",
    "llm_pack_sequences",
    "evt_sliding_window",
    "stm_sliding_watermark",
    "stm_transform_with_state",
    # r11 weak-burn (VERDICT r10 items 2/4): the rows that stayed >2x
    # after the measured rewrites/decompositions carry CLOSED stamps.
    # llm_term_topk / txt_lang_id / agg_collect_sorted were on the r10
    # VERDICT's prose weak list (never on this curated test list) and
    # left it by measurement (0.86x / 1.75x / 1.32x at x100), so they
    # need no stamp here.
    "fn_from_json_struct",
    "fn_variant_json",
    "txt_token_bpe",
    "fn_base64_roundtrip",
    # r11 x100 re-measure exposed + fixed the map-scan scale bug
    # (34.4x -> 4.70x); the residual is the explicit bloom surface,
    # stamped DELIBERATE with the bloom-free twin decomposition
    "join_bloom_prefilter",
    # r11 floor sweep: map-typed Jackson parse is the declared
    # dynamic-schema surface (fn_from_json_struct family)
    "fn_map_ops",
]

STATUS = re.compile(r"\bCLOSED\b|\bDELIBERATE\b")


def _rows() -> dict[str, str]:
    rows = {}
    for line in (REPO / "SCALE.md").read_text().splitlines():
        m = re.match(r"- `([a-z0-9_]+)`: (.*)", line)
        if m:
            rows[m.group(1)] = m.group(2)
    return rows


def test_weak_list_rows_carry_status_stamp():
    rows = _rows()
    missing = [k for k in WEAK_LIST if k not in rows]
    assert not missing, f"weak-list keys absent from SCALE.md: {missing}"
    unstamped = [k for k in WEAK_LIST if not STATUS.search(rows[k])]
    assert not unstamped, (
        f"weak-list rows lacking a CLOSED/DELIBERATE status token: {unstamped}"
    )


def test_scale_ledger_covers_every_registry_key():
    """Mirror of `scripts/scale_index.py --check`, cheap enough to run
    in the suite: every registered key has an evidence line and no
    line reads MISSING."""
    import sys

    sys.path.insert(0, str(REPO))
    from atd_dockless_processing_spark import QUERIES

    rows = _rows()
    absent = sorted(set(QUERIES) - set(rows))
    assert not absent, f"keys with no SCALE.md line: {absent}"
    placeholder = sorted(k for k, v in rows.items() if v.strip() == "MISSING")
    assert not placeholder, f"MISSING placeholder rows: {placeholder}"


RATIO = re.compile(r"\d+(?:\.\d+)?\s*[x×]")
# a cell that is NOTHING BUT two-or-more space-separated ratio tokens
# is a per-10x step-factor list, not a vs-oracle ratio
STEP_ONLY = re.compile(
    r"^(?:\*\*)?\d+(?:\.\d+)?[x×](?:\*\*)?(?:\s+\d+(?:\.\d+)?[x×])+$"
)
MEASURED_EXEMPT = re.compile(
    r"\bCLOSED\b|\bDELIBERATE\b|\bEXCLUDED\b|\bSURFACE\b|\bFLOOR\b|\bfloor\b|\babs\b"
)


def test_measured_rows_carry_a_comparator_ratio():
    """VERDICT r9 item 3: a measured SCALE.md table row (two or more
    timing cells) must carry a vs-oracle ratio — a step-factor-only
    cell like '1.1x 10.4x' (growth per 10x data) or a bare timing
    column does not price the row against the baseline. Status-stamped
    and floor-regime rows are audited by the stamp test above."""
    offenders = []
    for line in (REPO / "SCALE.md").read_text().splitlines():
        m = re.match(r"- `([a-z0-9_]+)`: (\|.*)", line)
        if not m:
            continue  # prose/pointer rows carry their own evidence text
        key, row = m.groups()
        cells = [c.strip() for c in row.strip("|").split("|") if c.strip()]
        timing_cells = [c for c in cells if re.match(r"^[\d.,/ →*]+ ?s\b", c)]
        if len(timing_cells) < 2:
            continue
        ratio_cells = [
            c for c in cells if RATIO.search(c) and not STEP_ONLY.match(c)
        ]
        if not ratio_cells and not MEASURED_EXEMPT.search(row):
            offenders.append(key)
    assert not offenders, (
        f"measured SCALE.md rows without a vs-oracle ratio: {offenders}"
    )
