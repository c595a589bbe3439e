"""Central query/oracle registry.

Every operator from SURVEY.md §2 registers itself here via the
``@query`` decorator. ``QUERIES`` maps key -> callable(spark, sf_dir)
-> DataFrame; ``ORACLES`` maps key -> ANSI SQL string for the DuckDB
oracle (omitted for rows-only keys, per the driver contract in
``__spark_entry__.py``).

The reference checkout (/root/reference) was empty at survey time
(SURVEY.md §0), so reference parity is cited per-operator against the
SURVEY.md §2 row and the public capability it generalizes ([P] tags).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None):
    """Register a query under ``key`` with an optional DuckDB oracle."""

    def deco(fn):
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        return fn

    return deco
