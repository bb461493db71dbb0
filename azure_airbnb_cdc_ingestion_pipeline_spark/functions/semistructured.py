"""Semi-structured (JSON) column functions.

Charter extension: the `events.props` column carries JSON documents as
strings; these helpers extract typed values declaratively so Catalyst
keeps pushdown/codegen (no Python).

At 100 TB prefer parsing ONCE into a struct column (`from_json` at the
bronze→silver hop) over repeated `get_json_object` calls — each
get_json_object re-parses the string per expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get(col: str | Column, path: str, cast: str | None = None) -> Column:
    """Extract a JSON path (`$.k` style) as string, optionally cast."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.get_json_object(c, path)
    return out.cast(cast) if cast else out


def parse_json(df: DataFrame, col: str, schema: T.StructType, out: str | None = None) -> DataFrame:
    """One-shot parse of a JSON string column into a typed struct column —
    the scale-correct pattern (single parse, then cheap struct access)."""
    return df.withColumn(out or f"{col}_parsed", F.from_json(F.col(col), schema))
