"""TWS-family state-store knob A/B (VERDICT r14 item 6): price the
declared per-(key, batch) state-server surface under different
HARNESS knobs without touching the registered plan.  Each config runs
in its OWN process (isolated-process protocol).

Configs:
  base       - as registered (RocksDB provider, session defaults:
               shuffle.partitions=32 under the house session)
  hdfs       - HDFSBackedStateStoreProvider instead of RocksDB
               (overrides the operator's provider context by pre-set;
               NOTE the operator re-sets RocksDB itself, so this
               config instead patches the context manager's target)
  parts8     - spark.sql.shuffle.partitions=8 during the stream
               (8 state-store instances + tasks per micro-batch
               instead of 32)
  parts200   - 200 (the driver-real plain-session default)
  arrow64k   - spark.sql.execution.arrow.maxRecordsPerBatch=65536
  maint60    - stateStore.maintenanceInterval=60s (fewer background
               maintenance wakeups inside the timed drain)

Usage: python scripts/ab_tws_knobs.py <config> [key ...]
  default key: stm_transform_with_state
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 3


def main() -> None:
    config = sys.argv[1] if len(sys.argv) > 1 else "base"
    keys = sys.argv[2:] or ["stm_transform_with_state"]

    from atd_dockless_processing_spark import QUERIES
    from atd_dockless_processing_spark.session import get_spark
    import atd_dockless_processing_spark.streaming.stream_queries as sq

    spark = get_spark("ab-tws-knobs")
    if config == "hdfs":
        # neutralize the operator's RocksDB context manager so the
        # default HDFS-backed provider stays in effect
        class _noop:
            def __init__(self, *_a, **_k):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        sq._rocksdb_provider = _noop
    elif config == "parts8":
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    elif config == "parts200":
        spark.conf.set("spark.sql.shuffle.partitions", "200")
    elif config == "arrow64k":
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    elif config == "maint60":
        spark.conf.set(
            "spark.sql.streaming.stateStore.maintenanceInterval", "60s"
        )

    sf = str(X100)
    for key in keys:
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            n = QUERIES[key](spark, sf).count()
            times.append(time.perf_counter() - t0)
        print(
            f"{config} {key} median {statistics.median(times):.1f} s "
            f"runs {[round(t, 1) for t in times]} rows {n}"
        )


if __name__ == "__main__":
    main()
