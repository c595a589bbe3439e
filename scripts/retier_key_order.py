"""Recompute __spark_entry__._KEY_ORDER from CORRECTNESS_r*.json evidence.

Standing per-round contract (VERDICT r3 item 2 / r4 item 7 / r5 item 1):
the driver sweeps queries() in dict order under a ~50-key budget, so

  1. every key WITHOUT green latest driver evidence (new, never swept,
     stale-error, or check-type changed) sorts FIRST, and
  2. the ever-green tail rotates OLDEST-EVIDENCE-FIRST (round number of
     each key's latest green row, ascending; stable by prior order).

Prints the formatted python list literal; with --write, splices it into
__spark_entry__.py between the _KEY_ORDER = [ ... ] brackets.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def compute_order() -> tuple[list[str], list[str]]:
    from atd_dockless_processing_spark import ORACLES, QUERIES
    import __spark_entry__ as entry

    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        for key, row in json.loads(path.read_text()).items():
            latest[key] = (rnd, row)

    def is_green(key: str, row: dict) -> bool:
        if row.get("err") == "no_oracle":
            return key not in ORACLES and (row.get("spark_rows") or 0) > 0
        return row.get("err") is None and bool(row.get("hash_match"))

    prior = {k: i for i, k in enumerate(entry._KEY_ORDER)}
    needy = [k for k in QUERIES if k not in latest or not is_green(k, latest[k][1])]
    green = [k for k in QUERIES if k in latest and is_green(k, latest[k][1])]
    # The driver sweep budget is EXACTLY 50 keys/round (every
    # CORRECTNESS_r*.json has 50 rows). When the needy block exceeds
    # it, which keys slip to next round matters: keys named by a
    # standing VERDICT done-condition ("Done = green CORRECTNESS
    # row") must never slip, and the designated carry keys are ones
    # whose semantics are redundantly pinned by independent-python
    # invariant tests and well-evidenced oracle families.
    sweep_first = {
        "evt_state_intervals", "etl_publish_funnel",  # VERDICT r5 items 5/6
        "agg_quantile_sketch", "llm_semdedup",
        "agg_bloom_membership", "snk_zorder_layout",
    }
    carry_ok = {"agg_weighted_avg", "fn_base64_roundtrip", "evt_interarrival_hist"}
    # needy: verdict-mandated first, designated carries last; within a
    # band, brand-new keys (no prior rank) first, then prior order
    needy.sort(
        key=lambda k: (
            (0 if k in sweep_first else 2 if k in carry_ok else 1),
            k in prior,
            prior.get(k, 0),
            k,
        )
    )
    # green: oldest evidence round first, stable by prior order
    green.sort(key=lambda k: (latest[k][0], prior.get(k, 10**9), k))
    return needy, green


def fmt(needy: list[str], green: list[str]) -> str:
    lines = [
        "    # --- evidence-needed block (no green latest driver row):",
        "    # new keys first, then previously-ranked ones ---",
    ]

    def emit(keys: list[str]) -> None:
        row: list[str] = []
        width = 0
        for k in keys:
            tok = f'"{k}",'
            if width + len(tok) + 1 > 74 and row:
                lines.append("    " + " ".join(row))
                row, width = [], 0
            row.append(tok)
            width += len(tok) + 1
        if row:
            lines.append("    " + " ".join(row))

    emit(needy)
    lines.append("    # --- ever-green tail, oldest evidence first ---")
    emit(green)
    return "\n".join(lines)


def main() -> None:
    needy, green = compute_order()
    body = fmt(needy, green)
    print(f"# needy={len(needy)} green={len(green)}")
    if "--write" in sys.argv:
        path = REPO / "__spark_entry__.py"
        src = path.read_text()
        new = re.sub(
            r"(_KEY_ORDER = \[\n).*?(\n\])",
            lambda m: m.group(1) + body + m.group(2),
            src,
            count=1,
            flags=re.S,
        )
        assert new != src or body in src, "splice failed"
        path.write_text(new)
        print("wrote __spark_entry__.py")
    else:
        print(body)


if __name__ == "__main__":
    main()
