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


def compact_write(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    json_to_parquet_ratio: float = 4.0,
) -> int:
    """Write ``df`` as parquet in ~``target_mb``-sized files; returns the
    size-derived GLOBAL file-count estimate. For an unpartitioned write
    that estimate is also the plan (``repartition(n_files)``); with
    ``partition_by`` the actual layout is per-partition-value —
    ``repartition(cols)`` × the ``maxRecordsPerFile`` bound — so the
    return value is only the overall size estimate, not a per-directory
    file count.

    The small-files problem is the quiet killer of 100 TB tables: a
    pipeline stage that ends on 2000 reducers writes 2000 files per run,
    and a year of hourly runs makes every downstream scan pay millions of
    footer reads. The fix is sizing output files to the scan-optimal range
    (~128 MB-1 GB) at write time:

    1. ONE extra pass estimates row count and bytes/row together:
       ``count(*)`` plus ``avg(octet_length(to_json(struct(*))))`` — UTF-8
       *bytes*, not characters, so multibyte text doesn't undercount — over
       a deterministic ~1%% hash sample of rows, in a single aggregate (no
       separate count job, no full-sample second scan). The sampling hash
       covers only hash()-able columns (maps are not), falling back to
       ``monotonically_increasing_id`` when no column qualifies;
    2. JSON text runs ~2-8x larger than encoded+compressed parquet, so the
       raw estimate is divided by ``json_to_parquet_ratio`` (default 4) —
       without the correction the writer plans 4-8x too many files and
       recreates the small-files problem it exists to solve;
    3. ``repartition(n_files)`` — one round-robin exchange — plus
       ``maxRecordsPerFile`` (from the same corrected estimate) as the
       straggler cap; with ``partition_by`` the repartition is on the
       partition columns instead, so each Hive partition's rows land in
       few tasks -> few files per directory.
    """
    def _hashable(dt) -> bool:
        # F.hash rejects MapType at any nesting depth (unordered keys).
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        return True

    hash_cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
    sample_key = (
        F.hash(*[F.col(c) for c in hash_cols])
        if hash_cols
        else F.monotonically_increasing_id()
    )
    est = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(
            F.when(
                F.abs(sample_key % 100) == 0,
                F.octet_length(F.to_json(F.struct(*df.columns))),
            )
        ).alias("b"),
    ).collect()[0]
    n = est["n"]
    writer_base = df.write.mode(mode)
    if n == 0:
        if partition_by:
            writer_base.partitionBy(*partition_by).parquet(path)
        else:
            writer_base.parquet(path)
        return 1
    row_bytes = max(1.0, (est["b"] or 1.0) / json_to_parquet_ratio)
    target_bytes = target_mb * 1024 * 1024
    n_files = max(1, int(n * row_bytes // target_bytes) + 1)
    max_records = max(1, int(target_bytes / row_bytes))
    if partition_by:
        out = df.repartition(*[F.col(c) for c in partition_by])
        writer = (
            out.write.mode(mode)
            .option("maxRecordsPerFile", max_records)
            .partitionBy(*partition_by)
        )
    else:
        out = df.repartition(n_files)
        writer = out.write.mode(mode).option("maxRecordsPerFile", max_records)
    writer.parquet(path)
    return n_files
