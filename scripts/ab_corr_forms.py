"""Probe: agg_corr_cov long-unit split-sum form vs the pre-r14
decimal power-sum form at x100, plus the DuckDB oracle denominator.

The decimal form computes six EXACT decimal sums (n, Σx, Σy, Σx²,
Σy², Σxy with x, y lifted to decimal(18,4)); the per-row cost is
decimal(37,8) multiplies and decimal(38,8)/(28,4) accumulation —
BigDecimal-backed once a partial exceeds the long range. The
long-unit form (REGISTERED on this A/B's evidence) computes the SAME exact integers in pure long arithmetic (guide §2.3
narrower types): unit lift ux = floor(x·1e4 + 0.5) (the exact.py
idiom — recovers the unscaled value of CAST(x AS DECIMAL(18,4)) on the
same IEEE double), per-row long products, and hi/lo split sums at 2^32
so no partial can wrap; the exact decimal values are reconstructed
post-agg over the ≤3 surviving groups and fed to the identical double
expressions, so every output bit matches by integer identity.

Overflow bounds at x100 (60M lineitem rows, qty ≤ 50 → ux ≤ 5e5,
price ≤ 105k → uy ≤ 1.05e9): per-row pyy = uy² ≤ 1.11e18 (8.4x long
margin); Σlo < 60M·2^32 = 2.6e17 (35x); Σhi ≤ 60M·2.6e8 = 1.6e16
(fits decimal(17,0) with 6x margin); Σuy ≤ 6.3e16 (decimal(17,0)).
Reconstruction stays ≤ precision 38 throughout, so Spark's
precision-loss adjustment never fires and every decimal step is exact.

Usage: python scripts/ab_corr_forms.py [form ...] where form in
{reg, units, duck}. Default: value check + all three in-process
(probe only — the registering A/B must be isolated per process,
r14 lesson). After registration, ``units`` resolves to the REGISTERED
QUERIES["agg_corr_cov"] and ``reg`` to ``_corr_cov_decimal_twin`` —
the same two physical forms the pre-registration A/B measured.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402


from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402


X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def hot(spark, build_df, runs=RUNS) -> float:
    build_df().toPandas()
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    forms = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "units",
        "reg",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{X100}/lineitem.parquet/*.parquet')"
        )
        sql = ORACLES["agg_corr_cov"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"units", "reg"} & set(forms):
        from atd_dockless_processing_spark.operators.pipeline_r4 import (
            _corr_cov_decimal_twin,
        )

        spark = get_spark("ab-corr")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # units = the REGISTERED long-unit form (post-r14 registration);
        # reg = the pre-r14 decimal power-sum form, kept as the twin.
        units = lambda: QUERIES["agg_corr_cov"](spark, sf)  # noqa: E731
        dec = lambda: _corr_cov_decimal_twin(spark, sf)  # noqa: E731
        if "units" in forms and "reg" in forms:
            pu = units().toPandas().sort_values("l_returnflag")
            pr = dec().toPandas().sort_values("l_returnflag")
            same = pu.reset_index(drop=True).equals(pr.reset_index(drop=True))
            print(f"values identical: {same}")
            if not same:
                print(pu)
                print(pr)
        for form in forms:
            if form == "duck":
                continue
            fn = {"units": units, "reg": dec}[form]
            t = hot(spark, fn)
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
