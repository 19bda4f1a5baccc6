"""Multi-dimensional data layout (Z-order clustering) for scan skipping.

Hive-style ``partitionBy`` (S3 in SURVEY.md §2.1) prunes on ONE column
hierarchy. When queries filter on several independent columns (user AND
time, brand AND price), the 100 TB answer is to cluster the rows so each
parquet file covers a small hyper-rectangle of the filter space: the
engine (Spark's parquet reader, or Delta/Iceberg data skipping) then drops
whole files/row-groups from their min/max footers.

``zorder_write`` computes a Z-value — the bit-interleave of each cluster
column quantized to ``bits`` buckets — then ``repartitionByRange`` +
``sortWithinPartitions`` on it, so consecutive Z-ranges land in separate
files and every file's min/max range on EVERY cluster column is narrow.
All arithmetic is built-in integer expressions (whole-stage codegen);
quantile boundaries come from one tiny ``approxQuantile`` pass.

Scale path: ``approxQuantile`` is a single aggregate over a sampled scan;
the range partition does one skew-free shuffle (ranges are equi-frequency
because quantization is rank-based, not value-based). No driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "_z"


def _quantize(col: Column, bounds: list, bits: int) -> Column:
    """Map a value to its quantile bucket in [0, 2^bits) via the
    precomputed boundary list (equi-frequency, so buckets are balanced
    even for skewed value distributions). Comparison is the column's
    native ordering — numeric or lexicographic alike."""
    n = (1 << bits) - 1
    expr: Column = F.lit(0)
    for b in bounds:
        expr = expr + F.when(col > F.lit(b), 1).otherwise(0)
    return F.least(expr, F.lit(n))


_NUMERIC_DTYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def z_value(df: DataFrame, cols: Sequence[str], bits: int = 6) -> Column:
    """Bit-interleaved Z-value over ``cols`` (each quantized to ``bits``
    rank-buckets). Interleaving gives every column equal weight in the
    sort order — the locality property plain multi-column sort lacks
    (a lexicographic sort clusters only its leading column).

    Numeric columns take their boundaries from one ``approxQuantile``
    pass. Non-numeric orderable columns (strings, dates) take
    rank-based boundaries from a bounded uniform sample —
    ``orderBy(rand).limit(n)`` compiles to a per-partition partial
    top-k (TakeOrdered), never a full shuffle, and clustering is
    already a rewrite-scale maintenance op.

    ``bits`` defaults to 6 (64 buckets/column): the quantize expression is
    a chain of 2^bits-1 comparisons, so keeping it small keeps the codegen
    method compact; 64 buckets already far exceeds typical file counts.
    """
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    dtypes = dict(df.dtypes)
    quantized = []
    for c in cols:
        dt = dtypes.get(c, "")
        if dt in _NUMERIC_DTYPES or dt.startswith("decimal"):
            bounds = df.approxQuantile(c, qs, 0.001)
            quantized.append(
                _quantize(F.col(c).cast("double"), bounds, bits)
            )
        else:
            sample = sorted(
                r[0]
                for r in df.select(c)
                .where(F.col(c).isNotNull())
                .orderBy(F.rand(7))
                .limit(16 * n_buckets)
                .collect()
            )
            bounds = (
                [
                    sample[min(int(q * len(sample)), len(sample) - 1)]
                    for q in qs
                ]
                if sample
                else []
            )
            quantized.append(_quantize(F.col(c), bounds, bits))
    z: Column = F.lit(0)
    for bit in range(bits - 1, -1, -1):  # MSB first
        for q in quantized:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(q, bit).bitwiseAND(F.lit(1))
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 6,
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``.

    Every output file then spans ≈ 1/n_files of the Z-range, i.e. a small
    min/max window on each cluster column simultaneously — a point or
    range predicate on ANY of them skips most files (verified from parquet
    footers in tests). Re-run after incremental appends the way
    ``compact_table`` is run: clustering, like compaction, is a
    maintenance operation, not a per-write invariant.
    """
    z = z_value(df, cols, bits)
    (
        df.withColumn(Z_COL, z)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_spans(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file [min, max] of each column from parquet footers — the exact
    metadata a skipping reader consults. Used by tests/benchmarks to show
    the clustering worked; never part of a query plan."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        spans: dict = {"file": os.path.basename(f)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col_md = row_group.column(ci)
                    if col_md.path_in_schema != c:
                        continue
                    st = col_md.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            spans[c] = (lo, hi)
        out.append(spans)
    return out


def skip_fraction(
    spans: list[dict], col: str, value: float
) -> float:
    """Fraction of files a min/max-pruning reader skips for an equality
    predicate ``col = value``."""
    hit = sum(
        1
        for s in spans
        if s[col][0] is not None and s[col][0] <= value <= s[col][1]
    )
    return 1.0 - hit / len(spans) if spans else 0.0
