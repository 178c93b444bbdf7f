"""Table-maintenance operators: small-file compaction, clustered rewrite.

A 100 TB pipeline's silent killer is file-count rot: streaming sinks and
fine-grained partitions leave millions of KB-sized parquet files, and scan
cost becomes per-file overhead (footer reads, task scheduling) instead of
bytes. The reference sidesteps this by being a row-stream publisher; a
Spark-native engine must own it — compaction is the moral equivalent of
its checkpoint-and-batch discipline applied to the storage layer
(SURVEY.md §4.3).

Sizing uses the cluster filesystem via the JVM Hadoop FileSystem API, so
the same code paths work on HDFS/S3A/local. No data collects: only file
status metadata touches the driver.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via Hadoop FS (works on any scheme)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def zorder_key(cols: Sequence[str], mins: dict, maxs: dict, bits: int = 8):
    """Morton (Z-curve) key: uniform-bucket each column to 2^bits cells,
    then interleave the bits — one integer whose ordering preserves
    locality in EVERY listed dimension at once.

    Bucketing uses width_bucket over the column's (min, max) — two scalars
    per column collected driver-side, the same bounded-model contract as
    the PQ/IVF trainers. Bit interleaving is a plain integer expression:
    whole-stage codegen, no UDF.
    """
    from pyspark.sql import functions as F

    parts = []
    for i, c in enumerate(cols):
        lo, hi = float(mins[c]), float(maxs[c])
        cell = (
            F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(1 << bits))
            - 1
        ).cast("bigint")
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + i,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_rewrite(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cols: Sequence[str],
    bits: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite parquet Z-ordered on ``cols``: every file covers a small
    min/max box in EVERY clustered dimension, so predicates on ANY of
    them skip files — where plain range-clustering (compact_parquet's
    order_by) only serves its leading column.

    The Delta OPTIMIZE ZORDER analog on bare parquet: one pass to collect
    per-column (min, max), one shuffle (repartitionByRange on the Morton
    key), in-file sort by the key, key dropped before write.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_dir)
    col_list = list(cols)
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in col_list],
        *[F.max(c).alias(f"max_{c}") for c in col_list],
    ).collect()[0]
    mins = {c: stats[f"min_{c}"] for c in col_list}
    maxs = {c: stats[f"max_{c}"] for c in col_list}
    n_files = max(1, math.ceil(_dir_bytes(spark, src_dir) / target_file_bytes))
    keyed = df.withColumn("__z", zorder_key(col_list, mins, maxs, bits))
    out = (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Rewrite a parquet directory into ~target-sized files; return the
    compacted DataFrame (reading from ``dst_dir``).

    File count = ceil(current bytes / target). Plain ``repartition``
    (round-robin, no skew) unless ``order_by`` is given, in which case
    ``repartitionByRange`` + in-file sort produces range-clustered files
    whose min/max column statistics enable scan skipping on those keys —
    the poor man's Z-order, and the right default when one predicate
    column dominates the workload.
    """
    df = spark.read.parquet(src_dir)
    n_files = max(1, math.ceil(_dir_bytes(spark, src_dir) / target_file_bytes))
    if order_by:
        cols = list(order_by)
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
