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
