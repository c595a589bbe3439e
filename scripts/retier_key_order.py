"""Refresh __spark_entry__._KEY_ORDER_BASE from CORRECTNESS_r*.json.

Since round 9 the EFFECTIVE sweep order is recomputed at import time by
``atd_dockless_processing_spark/retier.py`` — a post-commit evidence
drop can no longer leave the order stale (VERDICT r8 item 1). This
script is now a cosmetic refresh: it bakes the current computed order
into the static ``_KEY_ORDER_BASE`` literal so the file stays readable
and the git diff shows the round's rotation. Run with --write after a
new CORRECTNESS file lands; prints the list literal otherwise.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def compute_order() -> list[str]:
    from atd_dockless_processing_spark import ORACLES, QUERIES
    from atd_dockless_processing_spark.retier import (
        is_green,
        latest_evidence,
        retier,
    )
    import __spark_entry__ as entry

    evidence = latest_evidence(REPO)
    order = retier(entry._KEY_ORDER_BASE, QUERIES, ORACLES, evidence)
    needy = sum(
        1 for k in QUERIES
        if k not in evidence
        or not is_green(k, evidence[k][1], ORACLES, evidence[k][0])
    )
    print(f"# needy={needy} green={len(order) - needy}")
    return order


def fmt(order: list[str]) -> str:
    lines: list[str] = []
    row: list[str] = []
    width = 0
    for k in order:
        tok = f'"{k}",'
        if width + len(tok) + 1 > 74 and row:
            lines.append("    " + " ".join(row))
            row, width = [], 0
        row.append(tok)
        width += len(tok) + 1
    if row:
        lines.append("    " + " ".join(row))
    return "\n".join(lines)


def main() -> None:
    body = fmt(compute_order())
    if "--write" in sys.argv:
        path = REPO / "__spark_entry__.py"
        src = path.read_text()
        new = re.sub(
            r"(_KEY_ORDER_BASE = \[\n).*?(\n\])",
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
