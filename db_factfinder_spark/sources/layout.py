"""Z-order (Morton) data layout — multi-dimensional clustering for
data skipping.

At 100 TB the cheapest query is the one that never reads the file:
Parquet scans prune on per-file/row-group min-max statistics, but a
layout sorted on one column leaves every *other* column's ranges
covering the whole domain.  Interleaving the bits of several columns
into one Morton code and range-partitioning + sorting on it keeps
files tight in EVERY interleaved dimension at once — the same layout
Delta/Iceberg ``OPTIMIZE ZORDER BY`` produces, expressed as plain
Spark: one column expression, one range repartition, one local sort.

``zvalue`` is a pure JVM-side expression (shift/and/or inside
whole-stage codegen — no UDF); ``zorder_write`` is the writer.
Inputs to ``zvalue`` must already be non-negative integers below
2^bits — quantize arbitrary columns first (``quantize_minmax`` does a
two-pass affine map; heavily skewed columns want a rank-based
quantization instead, at the price of one extra window sort).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column
    (column i contributes bit b to output position b·k+i).  A pure
    shift/mask/or expression — engine-portable and codegen-friendly."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    # positions ≥63 would hit the long sign bit / wrap the shift
    # amount mod 64, silently colliding different columns' bits
    if bits * k > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * k} exceeds 63 — reduce bits "
            f"(e.g. bits={63 // k}) so the Morton code fits a long"
        )
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * k + i
        )
        for b in range(bits)
        for i, c in enumerate(cs)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def quantize_minmax(df: DataFrame, cols: Sequence[str], bits: int = 16):
    """Affine-map each column into [0, 2^bits) using its global
    min/max (one small agg, broadcast back — no collect).  Returns the
    frame with ``__q_<col>`` columns appended."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = (hi - lo).cast("double")
        q = F.when(
            span > 0,
            F.floor((F.col(c) - lo).cast("double") * top / span),
        ).otherwise(F.lit(0))
        out = out.withColumn(f"__q_{c}", q.cast("long"))
    return out.drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    num_files: int = 32,
    bits: int = 16,
    quantize: bool = True,
) -> None:
    """Write ``df`` as Parquet clustered on the Morton code of
    ``cols``: range-repartition on the z-value (contiguous z-ranges
    per file → tight min-max bounds) and sort within each partition
    (tight bounds per row group too).  ``num_files`` sizes the output
    — at scale pick it from bytes/file, not row counts."""
    if quantize:
        qdf = quantize_minmax(df, cols, bits)
        z = zvalue([f"__q_{c}" for c in cols], bits)
        staged = qdf.withColumn("__z", z).drop(*[f"__q_{c}" for c in cols])
    else:
        staged = df.withColumn("__z", zvalue(list(cols), bits))
    (
        staged.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files
    near ``target_file_bytes``.  The long-running-pipeline hygiene op:
    streaming sinks and per-partition appends produce thousands of
    KB-scale files whose open/footer overhead dominates scans at
    scale; compaction sizes output from the MEASURED input bytes (not
    a guessed partition count).  Returns the file count written.

    Uses coalesce (no shuffle — pure file merge) when shrinking; a
    shuffleless coalesce of N→M only narrows, which is exactly the
    compaction case.  Ordering within files is preserved per input
    split; use ``zorder_write`` instead when clustering also needs
    re-sorting."""
    import glob
    import os

    in_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(src_path, "**", "*.parquet"),
                           recursive=True)
    )
    n_files = max(1, (in_bytes + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(src_path)
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(dst_path)
    return len(glob.glob(os.path.join(dst_path, "*.parquet")))
