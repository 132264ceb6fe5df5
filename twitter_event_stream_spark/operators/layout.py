"""Data-layout operators — Z-order clustering for scan pruning at scale.

At 100 TB the cheapest query is the one that never reads the file: parquet
footers carry per-column min/max, and Spark's scan skips row groups whose
stats exclude the predicate. Sorting clusters one column only; Z-ordering
interleaves the bits of several columns' bucket ranks so *every* Z-ordered
column gets tight per-file min/max ranges. This is the standard
lakehouse-table layout strategy (Delta/Iceberg `OPTIMIZE ZORDER BY`),
implemented here on plain parquet with pure JVM expressions:

1. per column: min/max agg (one cheap job) → `width_bucket` into 2^bits
   ranks — no global sort, no driver data;
2. interleave rank bits into one Z-value (bit arithmetic, codegen'd);
3. `repartitionByRange(z)` + `sortWithinPartitions(z)` → each output file
   covers a compact Z-range, i.e. a small hyper-rectangle of the key space.

Caveat (documented, standard): width_bucket ranks assume roughly uniform
value distributions; heavily skewed columns should be bucketed on
approx-quantile cutpoints instead (same pipeline, different rank expr).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__tes_zval"


def zorder_value(df: DataFrame, cols: list[str], bits: int = 10) -> Column:
    """Z-value column: interleaved bits of each column's width_bucket rank.

    ``bits`` per column (default 10 → 1024 buckets); total Z-value width is
    ``bits * len(cols)`` — keep ≤ 62 for LongType.
    """
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit long")
    stats = df.agg(
        *[F.min(c).alias(f"{c}_min") for c in cols],
        *[F.max(c).alias(f"{c}_max") for c in cols],
    ).collect()[0]
    ranks = []
    for c in cols:
        lo, hi = stats[f"{c}_min"], stats[f"{c}_max"]
        if hi == lo:
            ranks.append(F.lit(0).cast("long"))
            continue
        # width_bucket returns 1..n+1; clamp into 0..2^bits-1.
        r = F.width_bucket(
            F.col(c).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi)),
            F.lit(2**bits),
        )
        ranks.append(
            F.least(F.greatest(r - 1, F.lit(0)), F.lit(2**bits - 1)).cast("long")
        )
    # Interleave: output bit (i*len(cols) + j) = bit i of column j's rank.
    terms = [
        F.shiftleft(F.shiftright(rank, i).bitwiseAND(F.lit(1)), i * len(cols) + j)
        for j, rank in enumerate(ranks)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by Z-order over ``cols``.

    repartitionByRange on the Z-value gives each output file a contiguous
    Z-range (a compact hyper-rectangle in key space) so parquet min/max
    stats prune on every Z-ordered column; sortWithinPartitions tightens
    row-group stats inside each file."""
    z = df.withColumn(Z_COL, zorder_value(df, cols, bits))
    (
        z.repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode(mode)
        .parquet(path)
    )
