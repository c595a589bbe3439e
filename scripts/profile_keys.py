"""Per-key profiler: run every registered query end-to-end (build +
collect via toPandas-like collect()) at a given sf dir, report wall
time per key and flag complex-typed (array/map/struct) output columns
that pandas-based comparison harnesses cannot hash.

Usage: python scripts/profile_keys.py [--sf DIR] [key ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import types as T  # noqa: E402

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf]
    keys = args or sorted(QUERIES)
    spark = get_spark()
    # warm the JVM so key 1 isn't charged for session startup
    spark.range(10).count()
    rows = []
    for k in keys:
        t0 = time.monotonic()
        try:
            df = QUERIES[k](spark, sf)
            n = df.count()
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            ]
            dtsec = time.monotonic() - t0
            rows.append((dtsec, k, n, complex_cols, None))
        except Exception as e:  # noqa: BLE001
            dtsec = time.monotonic() - t0
            rows.append((dtsec, k, -1, [], repr(e)[:200]))
        print(
            f"{rows[-1][0]:7.2f}s  {k:28s} rows={rows[-1][2]:<8} "
            f"complex={rows[-1][3]} err={rows[-1][4]}",
            flush=True,
        )
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\nTOTAL {total:.1f}s over {len(rows)} keys; slowest 15:")
    for dtsec, k, n, cc, err in rows[:15]:
        print(f"  {dtsec:7.2f}s  {k}")
    bad = [(k, cc) for _, k, _, cc, _ in rows if cc]
    print(f"\ncomplex-typed outputs: {json.dumps(dict(bad))}")
    errs = [(k, e) for _, k, _, _, e in rows if e]
    print(f"errors: {json.dumps(dict(errs))}")


if __name__ == "__main__":
    main()
