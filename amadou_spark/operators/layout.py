"""Data-layout operators: z-order (Morton) clustering for multi-column
file pruning.

A parquet scan prunes files/row-groups by min-max statistics. Sorting
by one column makes ITS ranges tight but leaves every other column's
ranges spanning the full domain. Interleaving the bits of several
columns into one z-value and range-partitioning + sorting by it keeps
EVERY participating column's per-file range narrow, so predicates on
any of them skip most files — the layout trick behind Delta/Iceberg
`OPTIMIZE ZORDER BY`, built here from plain Spark primitives:
`repartitionByRange(zvalue)` + `sortWithinPartitions`.

The z-value itself is pure bit arithmetic (shift/mask/or), fully
inside whole-stage codegen, and identical in any engine — the query
wrapper is DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each column (values must be
    pre-scaled to [0, 2^bits); use ``grid_cell`` for that). With two
    columns and bits=8 the result is a 16-bit Morton code: bit b of
    column d lands at position b*ndim + d."""
    ndim = len(cols)
    out: Column | None = None
    for d, c in enumerate(cols):
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
                b * ndim + d,
            )
            out = term if out is None else out.bitwiseOR(term)
    assert out is not None
    return out


def grid_cell(c: Column, lo: Column | int, hi: Column | int, bits: int = 8) -> Column:
    """Scale a numeric column onto the z-grid: [lo, hi] → [0, 2^bits).
    lo/hi are BOUNDS, not data aggregates — pass domain constants (or
    precomputed min/max) so the expression stays a pure projection."""
    lo_c = F.lit(lo) if isinstance(lo, (int, float)) else lo
    hi_c = F.lit(hi) if isinstance(hi, (int, float)) else hi
    cells = (1 << bits) - 1
    scaled = F.floor((c - lo_c) * cells / (hi_c - lo_c))
    return F.greatest(F.lit(0), F.least(F.lit(cells), scaled)).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int = 32,
) -> None:
    """Cluster ``df`` into ``n_files`` files by z-value: range-partition
    (contiguous z-ranges per file) then sort within each partition so
    row-group stats are tight too. One range-exchange; no global sort."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
