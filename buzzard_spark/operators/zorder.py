"""Z-order (Morton) spatial clustering — the write-side layout operator.

A production deployment of this engine writes the pages table CLUSTERED
on a space-filling curve so that (a) per-file cell/tile min-max spans are
tight (manifest-level file skipping in ``sources.snapshot_table`` prunes
reads), and (b) per-(region, tile) aggregations see few distinct groups
per task (map-side combine output stays O(groups) — the measured
round-2 scaling fix assumed this layout; see BASELINE.md). This module
makes that layout an OPERATOR instead of an assumption: interleave the
bits of the two tile/cell coordinates into one BIGINT Z-value and
range-partition + sort on it.

The Z-value is a pure integer Catalyst expression (shift/mask/or —
whole-stage codegen, no Python, no UDF), generated identically for
DuckDB so the driver oracle value-checks the curve arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['zvalue_sql', 'cluster_by_zorder']


def zvalue_sql(x_col: str, y_col: str, bits: int,
               dialect: str = 'spark') -> str:
    """SQL: Morton interleave of two non-negative ints of ``bits`` bits
    each → one BIGINT (x in even bit positions, y in odd).

    The expression is an unrolled OR of 2·bits constant-shift terms —
    constant-folded into straight-line integer ops by both engines
    (``bits`` ≤ 31; the result needs 2·bits ≤ 62 bits, inside BIGINT).

    The inputs are cast to BIGINT INSIDE the expression: with 32-bit INT
    columns, Spark's ``shiftleft`` stays INT and Java shift semantics
    wrap the shift amount mod 32 (DuckDB INT32 shifts misbehave the same
    way), so any ``bits`` ≥ 16 would silently produce garbage Z-values.
    The inner cast makes the documented ``bits ≤ 31`` range safe for any
    integer column type (ADVICE r4).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f'bits must be in [1, 31], got {bits}')
    xb = f'CAST({x_col} AS BIGINT)'
    yb = f'CAST({y_col} AS BIGINT)'
    terms = []
    for i in range(bits):
        if dialect == 'duckdb':
            terms.append(f'((({xb} >> {i}) & 1) << {2 * i})')
            terms.append(f'((({yb} >> {i}) & 1) << {2 * i + 1})')
        else:
            terms.append(
                f'(shiftleft(shiftright({xb}, {i}) & 1, {2 * i}))')
            terms.append(
                f'(shiftleft(shiftright({yb}, {i}) & 1, {2 * i + 1}))')
    return 'CAST((' + ' | '.join(terms) + ') AS BIGINT)'


def cluster_by_zorder(df: DataFrame, x_col: str, y_col: str, bits: int,
                      n_partitions: int | None = None,
                      z_col: str = 'zval') -> DataFrame:
    """Range-partition + sort ``df`` by the Morton Z-value of
    (``x_col``, ``y_col``) — the write-path clustering step: each output
    partition (→ data file, via ``SnapshotTable.append``) covers a
    contiguous Z-range, so its x/y min-max box is tight and downstream
    manifest pruning / per-task group locality hold.

    One range shuffle (sampled boundaries — Spark's RangePartitioner) +
    an intra-partition sort; nothing driver-side. The Z column is kept
    (drop it after writing if unwanted) so tests and manifests can assert
    the range contiguity.
    """
    out = df.withColumn(z_col, F.expr(zvalue_sql(x_col, y_col, bits)))
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(n_partitions, F.col(z_col))
            .sortWithinPartitions(z_col))
