"""Select / rename / column pruning — the reference's ``select(mapColumn(...))``.

Reference: /root/reference/dataflow/BookingDataTransformation.json:122-155 —
maps a post-join two-namespace row down to the 16-column sink schema with
first-wins duplicate collapse (skipDuplicateMapInputs/Outputs).

Spark-first: a plain aliased projection. Column pruning then reaches the
scans for free (Catalyst prunes unused join inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_map(df: DataFrame, mapping: dict[str, str | Column]) -> DataFrame:
    """Project ``df`` to exactly ``mapping``'s targets: target_name →
    source column name or Column expression. First-wins on duplicate
    targets (dict keys are unique by construction, matching the
    skipDuplicateMapOutputs collapse)."""
    cols = []
    for target, source in mapping.items():
        col = F.col(source) if isinstance(source, str) else source
        cols.append(col.alias(target))
    return df.select(*cols)
