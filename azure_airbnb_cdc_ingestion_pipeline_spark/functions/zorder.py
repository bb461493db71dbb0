"""Z-order (Morton) clustering for multi-dimensional data-skipping.

Charter extension: the layout operator behind Delta/Iceberg `OPTIMIZE
ZORDER BY` — interleave the bits of two quantized dimensions so rows
close in (x, y) land in the same file/bucket, letting min/max stats
prune scans on EITHER dimension. At 100 TB this is what turns a
two-dimensional filter into a 1/N file scan instead of a full pass.

Pure JVM expression (16 shift/mask/add terms per dimension — no UDF);
the identical arithmetic is SQL-expressible in DuckDB via
``list_sum(list_transform(range(16), b -> ...))``, so layouts are
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # 16 bits per dimension -> 32-bit z-value


def zvalue(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave two non-negative integer columns (low `bits`
    bits each; callers quantize/cap first). x occupies odd bit
    positions, y even — disjoint, so the terms sum without carries."""
    x = x.cast("long")
    y = y.cast("long")
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(1), 2 * b + 1))
        terms.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(1), 2 * b))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(x_expr: str, y_expr: str, bits: int = BITS) -> str:
    """The DuckDB-SQL twin of :func:`zvalue` (same bit layout)."""
    # CAST: DuckDB's list_sum widens to HUGEINT — narrow back so the
    # driver's dtype comparison sees int64 on both sides.
    return (
        f"CAST(list_sum(list_transform(range({bits}), b -> "
        f"((({x_expr} >> b) & 1) << (2*b + 1)) + "
        f"((({y_expr} >> b) & 1) << (2*b)))) AS BIGINT)"
    )
