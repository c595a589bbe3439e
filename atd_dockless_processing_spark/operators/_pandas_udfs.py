"""Pandas UDF factories.

Kept in a module WITHOUT ``from __future__ import annotations``: the
pandas-UDF eval-type inference reads real (non-string) type hints.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def zscore_cols(s: pd.Series, mu: pd.Series, sd: pd.Series) -> pd.Series:
    """Vectorized z-score with the global moments flowing IN THE PLAN
    (columns from a broadcast 1-row aggregate) instead of closed-over
    driver literals — one job, no separate collect() pass."""
    return ((s - mu) / sd).round(4)
