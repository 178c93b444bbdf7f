"""maintenance.compact_parquet: fewer files, same bytes of truth."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from better_cdc_spark.io import load_table
from better_cdc_spark.maintenance import compact_parquet
from tests.conftest import SF_SMOKE


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/*.parquet")


def test_compaction_reduces_files_preserves_rows(spark):
    src = tempfile.mkdtemp(prefix="bcs_frag_")
    dst = tempfile.mkdtemp(prefix="bcs_compact_")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.repartition(32).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 32
    back = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert len(_parquet_files(dst)) == 1  # tiny table, one target file
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey"), F.count("*")).collect()
    b = back.agg(F.sum("o_orderkey"), F.count("*")).collect()
    assert a == b


def test_compaction_range_clusters(spark):
    """order_by produces disjoint per-file key ranges (min/max skipping)."""
    src = tempfile.mkdtemp(prefix="bcs_frag2_")
    dst = tempfile.mkdtemp(prefix="bcs_compact2_")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.repartition(16).write.mode("overwrite").parquet(src)
    total = _dir_size(src)
    # force ~4 output files, range-clustered on o_orderkey
    back = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4), order_by=("o_orderkey",)
    )
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 2
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint ranges => file-level skipping works


def _dir_size(path: str) -> int:
    import os

    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
    )
