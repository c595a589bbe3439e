"""Self-check loop (SURVEY.md §5.2 item 4): run every registered
query on Spark AND its DuckDB oracle at sf0.01; compare row count,
column names, and order-insensitive values — a strictly-stricter
local mirror of the driver's correctness gate.

Usage: python scripts/selfcheck.py [key ...] [--sf DIR]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from atd_dockless_processing_spark import ORACLES, QUERIES, TABLES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


def _norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact compare after the query's own rounding; normalize -0.0
        return repr(v + 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return repr(v)


def norm_result(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c.lower() for c in cols), out


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def diff_preview(a, b, n=4):
    sa, sb = set(a), set(b)
    only_a = list(sa - sb)[:n]
    only_b = list(sb - sa)[:n]
    return f"spark-only={only_a} oracle-only={only_b}"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    keys = args or sorted(QUERIES)
    spark = get_spark("selfcheck")
    con = duck_con(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    t_all = time.time()
    for key in keys:
        if key not in QUERIES:
            print(f"?? {key}: unknown key")
            continue
        t0 = time.time()
        try:
            df = QUERIES[key](spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {key}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if key not in ORACLES:
            print(f"ok   {key}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(ORACLES[key])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {key}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sr = norm_result(s_cols, s_rows)
        oc, orr = norm_result(o_cols, o_rows)
        if sc != oc:
            print(f"FAIL {key}: columns {sc} != {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(
                f"FAIL {key}: rowcount {len(sr)} != {len(orr)}; {diff_preview(sr, orr)}"
            )
            n_fail += 1
        elif sr != orr:
            print(f"FAIL {key}: values differ; {diff_preview(sr, orr)}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(sr)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
        f" / {len(keys)} keys in {time.time()-t_all:.0f}s"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
