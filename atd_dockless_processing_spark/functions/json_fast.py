"""Fast scalar extraction from flat JSON documents.

`get_json_object` runs a Jackson streaming parse per row — measured
at ~1.4 s per 10M rows on the ×100 rehearsal box, the single largest
constant in every events-table key that touches `props` (the "json
tax" named in BASELINE's bbox decomposition). For the common
production shape — a FLAT document whose target field holds a bare
number — a compiled Java regex anchored to the ENTIRE document is
~3.5× faster (r7 A/B at ×100: regexp 0.55 s vs Jackson 1.91 s vs
from_json-with-schema 2.53 s, identical results).

Correctness is by construction, not by hope: the fast pattern matches
only when the WHOLE document is ``{"<key>": <number>}`` (optional
whitespace). A document that matches has exactly one key with a bare
numeric token, so the captured group IS the JSON-path value; any
document that does not match — nested objects, string values, extra
keys, escapes, corrupt text — falls back to the exact Jackson path
for that row. The helper therefore returns `get_json_object`
semantics at ANY data, and the fast path simply short-circuits the
parser on the flat rows (all rows, on this corpus).

The guard and the extract share ONE regex evaluation: Catalyst does
not CSE non-cheap expressions (the round-6 staged-projection
finding), so the helper stages the captured token in its own
projection tier and the null-check/cast/fallback reference the staged
column, not the regex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_json_field"]


def _flat_pattern(key: str, numeric: str) -> str:
    # Anchored to the full document: a match proves the document is
    # exactly {"<key>": <token>}, so regex capture == JSON-path value.
    return r'^\{\s*"' + key + r'"\s*:\s*(' + numeric + r')\s*\}$'


_INT = r"-?\d+"
_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def with_json_field(
    df: DataFrame,
    out: str,
    json_col: str,
    key: str,
    dtype: str = "int",
) -> DataFrame:
    """Add column `out` = get_json_object(json_col, '$.key') cast to
    `dtype` ('int' | 'bigint' | 'double' | 'string'), via the
    anchored-regex fast path with exact per-row Jackson fallback.

    Two projection tiers: the regex token is staged so the guard and
    the cast reference ONE evaluation (no-CSE hazard)."""
    token = _INT if dtype in ("int", "bigint") else _NUM
    staged = df.withColumn(
        "__jx_tok", F.regexp_extract(F.col(json_col), _flat_pattern(key, token), 1)
    )
    tok = F.col("__jx_tok")
    slow: Column = F.get_json_object(F.col(json_col), f"$.{key}")
    value = F.when(tok != "", tok).otherwise(slow)
    if dtype != "string":
        value = value.cast(dtype)
    return staged.withColumn(out, value).drop("__jx_tok")
