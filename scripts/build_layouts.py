"""Pre-build every session-persistent physical layout for a corpus dir.

Layouts are one-time amortizers: pay the build once per corpus, and
every subsequent SESSION re-attaches them for free (bucketed layouts:
DDL-only CREATE TABLE over the surviving files; µs-staged layout:
plain path probe). This script is the documented ops step a deployment
runs after ingesting/regenerating a corpus — the registered query keys
only PROBE layouts, they never build them (LAYOUTS.md).

Usage: python scripts/build_layouts.py [sf_dir ...]
       (default: /root/testdata/sf0.01 — the driver's sweep dir)

Idempotent: a valid existing layout is re-attached/verified, not
rebuilt; a stale one (source parquet changed since the freshness
marker was written) is rebuilt; unstatable sources and active table
providers are declined by the layout machinery itself.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atd_dockless_processing_spark.operators.events import (  # noqa: E402
    _tumbling_us_available,
    ensure_tumbling_us_layout,
)
from atd_dockless_processing_spark.operators.joins import (  # noqa: E402
    _CK_BUCKETS,
    _Q5_BUCKETS,
    _ck_layout_available,
    _q5_layout_available,
    ensure_custkey_bucketed_layout,
    ensure_q5_bucketed_layout,
)
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dirs = argv or ["/root/testdata/sf0.01"]
    spark = get_spark("build_layouts")
    ok = True
    for sf_dir in sf_dirs:
        print(f"== {sf_dir}")
        for label, ensure, probe in (
            (
                f"q5 bucketed-orderkey (x{_Q5_BUCKETS})",
                lambda s, d: ensure_q5_bucketed_layout(s, d),
                lambda s, d: _q5_layout_available(s, d),
            ),
            (
                f"custkey bucketed (x{_CK_BUCKETS})",
                lambda s, d: ensure_custkey_bucketed_layout(s, d),
                lambda s, d: _ck_layout_available(s, d),
            ),
            (
                "tumbling µs-staged events",
                lambda s, d: ensure_tumbling_us_layout(s, d),
                lambda s, d: _tumbling_us_available(d),
            ),
        ):
            t0 = time.monotonic()
            ensure(spark, sf_dir)
            live = probe(spark, sf_dir)
            ok &= live
            print(
                f"  {label}: {'LIVE' if live else 'DECLINED'} "
                f"({time.monotonic() - t0:.1f}s)"
            )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
