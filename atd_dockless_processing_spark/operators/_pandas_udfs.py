"""Pandas UDF factories.

Kept in a module WITHOUT ``from __future__ import annotations``: the
pandas-UDF eval-type inference reads real (non-string) type hints.
"""

import pandas as pd

from pyspark.sql import functions as F


def make_zscore(mu: float, sd: float):
    @F.pandas_udf("double")
    def zscore(s: pd.Series) -> pd.Series:
        return ((s - mu) / sd).round(4)

    return zscore
