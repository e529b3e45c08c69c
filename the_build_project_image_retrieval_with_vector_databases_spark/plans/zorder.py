"""Z-order (Morton-curve) multi-column clustering layout.

A single-column sort gives parquet min/max row-group pruning on one
predicate column only; queries filtering on BOTH (a, b) still scan
everything when sorted by a alone. Interleaving the bits of the two
columns into one Morton key and range-partition-sorting by it co-locates
rows that are close in BOTH dimensions, so every file/row-group covers a
small (a, b) rectangle and two-sided predicates prune most of them —
the standard lakehouse `OPTIMIZE ZORDER BY` technique, built here from
plain Spark primitives (no table format required).

The z-value is pure integer bit arithmetic (shift/mask/or), identical in
Spark and DuckDB — so unlike engine-private layout features, the key
itself is oracle-checkable.

Scale shape: one `repartitionByRange` shuffle on the z-key (range
boundaries from a sample), sort within partitions, write. Reads stay
plain parquet scans; the benefit arrives through row-group statistics,
invisible to the plan but measured empirically in tests/test_zorder.py
(per-file bounding boxes shrink from ~full-domain to ~1/files of the
domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_interleave(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    integer columns — bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Monotone in each argument within fixed other-bits, which is
    what gives the locality property."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("long")
    b = b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def duckdb_z_interleave(a: str, b: str, bits: int = 16) -> str:
    """DuckDB SQL mirror of :func:`z_interleave` (same shift/mask/or
    arithmetic, bigint throughout)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    files: int = 16,
    bits: int = 16,
) -> None:
    """Materialize ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition into ``files`` output files and sort within each, so
    parquet column chunks carry tight min/max rectangles over BOTH
    columns."""
    keyed = df.withColumn("__z", z_interleave(col_a, col_b, bits=bits))
    (
        keyed.repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
