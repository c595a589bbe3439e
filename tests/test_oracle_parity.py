"""Oracle-differential tests (SURVEY.md §5.2): every registered
query vs its DuckDB oracle at sf0.001 (fast smoke scale; the full
sf0.01 driver-scale sweep is scripts/selfcheck.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from selfcheck import norm_pdf  # noqa: E402

from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402

ALL_KEYS = sorted(QUERIES)
HASH_KEYS = [k for k in ALL_KEYS if k in ORACLES]
ROWS_ONLY_KEYS = [k for k in ALL_KEYS if k not in ORACLES]


def test_inventory_complete():
    # SURVEY §2: 117+ operators; exactly these rows-only (mm_frame_
    # sample, mm_decode_wav, and mm_decode_stub were all upgraded to
    # hash-checked in r5 — the two left have genuinely engine-specific
    # semantics: HLL implementations differ, watermark drop timing
    # is engine-defined)
    assert len(ALL_KEYS) >= 117
    assert set(ROWS_ONLY_KEYS) <= {
        "agg_approx_distinct",
        "stm_late_data_drop",
    }


@pytest.mark.parametrize("key", HASH_KEYS)
def test_hash_parity(key, spark, sf_dir, duck):
    # both sides go THROUGH PANDAS, dtype-sensitively — the driver's
    # canonicalizer hashes pandas frames, so an int64-vs-float64
    # divergence (e.g. DuckDB HUGEINT from an un-cast SUM) must fail
    # here exactly as it fails the driver (round-4 fn_url_parse bug)
    df = QUERIES[key](spark, sf_dir)
    s_cols, s_rows = norm_pdf(df.toPandas())
    o_cols, o_rows = norm_pdf(duck.execute(ORACLES[key]).df())
    assert s_cols == o_cols, f"{key}: column names differ"
    assert len(s_rows) == len(o_rows), f"{key}: row counts differ"
    assert s_rows == o_rows, f"{key}: values differ"


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
