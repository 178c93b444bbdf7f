"""End-to-end CDC load test — the reference's ops/sec rig, re-expressed.

The reference's only published performance artifact is
`scripts/e2e-load-test.sh` (/root/reference): TOTAL_OPS operations in a
60% INSERT / 30% UPDATE / 10% DELETE mix, ~67% against `orders` and the
rest `accounts`, pushed Postgres → CDC → NATS, reporting wall-clock
ops/sec. This tool is the same experiment against this engine's pipeline:
synthesize the identical op mix as wal2json-v2 JSON lines, drive
CDCStreamPipeline (decode → allowlist → commit-boundary assembly →
effectively-once envelope sink) to completion, report ops/sec.

Usage: PYTHONPATH=/root/repo python tools/e2e_load.py [n_ops] [n_batches]
Prints one JSON line: {"metric": "cdc_e2e_ops_per_sec", ...}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from better_cdc_spark.session import get_spark
from better_cdc_spark.streaming.pipeline import CDCStreamPipeline

TX_MOD = 997
LSN_BASE = 1 << 20


def synthetic_ops(spark: SparkSession, n_ops: int):
    """n_ops wal2json-v2 rows in the reference mix, plus B/C tx markers.

    Mix per e2e-load-test.sh: 60/30/10 I/U/D, ~67% orders / 33% accounts.
    Deterministic throughout (keys, lsns, timestamps derive from the op
    ordinal) so reruns measure the same workload.
    """
    base = spark.range(n_ops).select(
        F.col("id").alias("okey"),
        (F.col("id") % TX_MOD).alias("xid"),
        F.when(F.col("id") % 3 < 2, "orders").otherwise("accounts").alias("table"),
        F.when(F.col("id") % 10 < 6, "I")
        .when(F.col("id") % 10 < 9, "U")
        .otherwise("D")
        .alias("action"),
    )
    lsn = F.concat(F.lit("0/"), F.format_string("%x", F.col("xid") * 16 + F.lit(LSN_BASE)))
    col_entry = lambda name, typ, val: F.struct(  # noqa: E731
        F.lit(name).alias("name"), F.lit(typ).alias("type"), val.alias("value")
    )
    new_cols = F.array(
        col_entry("id", "bigint", F.col("okey").cast("string")),
        col_entry("balance_cents", "bigint", (F.col("okey") * 7 % 1000000).cast("string")),
    )
    key_cols = F.array(col_entry("id", "bigint", F.col("okey").cast("string")))
    data_rows = base.select(
        (F.col("okey") * 10).alias("ingest_seq"),
        lsn.alias("lsn"),
        F.col("action"),
        F.col("xid"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit("public").alias("schema"),
        F.col("table"),
        F.when(F.col("action").isin("I", "U"), new_cols).alias("columns"),
        F.when(F.col("action").isin("U", "D"), key_cols).alias("identity"),
    )
    tx = base.groupBy("xid").agg(
        F.min("okey").alias("min_okey"), F.max("okey").alias("max_okey")
    )
    def marker(seq_col, act):
        return tx.select(
            seq_col.alias("ingest_seq"),
            F.concat(
                F.lit("0/"), F.format_string("%x", F.col("xid") * 16 + F.lit(LSN_BASE))
            ).alias("lsn"),
            F.lit(act).alias("action"),
            F.col("xid"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("xid")).alias("timestamp"),
            F.lit(None).cast("string").alias("schema"),
            F.lit(None).cast("string").alias("table"),
            F.lit(None).cast(data_rows.schema["columns"].dataType).alias("columns"),
            F.lit(None).cast(data_rows.schema["identity"].dataType).alias("identity"),
        )

    begin = marker(F.col("min_okey") * 10 - 1, "B")
    commit = marker(F.col("max_okey") * 10 + 1, "C")
    return data_rows.unionByName(begin).unionByName(commit)


def run_load(spark: SparkSession, n_ops: int, n_batches: int = 4) -> dict:
    """Drive the full pipeline over the reference op mix; return the metric
    row (shared by the CLI below and bench.py's cdc_e2e entry). The
    synthetic WAL + sink dirs are removed on the way out — at 1M ops the
    source alone is ~200 MB, and per-bench leaks had accumulated ~1 GB
    in /tmp (round-13 cleanup, same advisory class as the sf1 probe)."""
    src = tempfile.mkdtemp(prefix="bcs_e2e_src_")
    work = tempfile.mkdtemp(prefix="bcs_e2e_work_")
    shutil.rmtree(src, ignore_errors=True)
    try:
        return _run_load_at(spark, n_ops, n_batches, src, work)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


def _run_load_at(
    spark: SparkSession, n_ops: int, n_batches: int, src: str, work: str
) -> dict:
    # Range-partition on the ingest ordinal: the wal2json contract is an
    # ORDERED stream (a tx's data rows precede its commit marker), so each
    # micro-batch's files must hold contiguous ingest_seq ranges — a plain
    # repartition scatters rows and commits overtake their data. Each
    # micro-batch is split across FILES_PER_TRIGGER files (the WAL arrives
    # as many small segments, not one blob per flush) so the JSON decode
    # inside an epoch parallelizes instead of being throttled by the
    # openCostInBytes floor on a single 16 MB file.
    files_per_trigger = 8
    synthetic_ops(spark, n_ops).repartitionByRange(
        n_batches * files_per_trigger, "ingest_seq"
    ).sortWithinPartitions("ingest_seq").write.json(src)
    # Ordered ADMISSION, not just ordered content: the file source breaks
    # mtime ties arbitrarily, and a fast write lands all parts in the same
    # second — letting the commit-marker-heavy tail file jump the queue,
    # which violates the pipeline's ordered-delivery contract (commits
    # must not precede their data; see CDCStreamPipeline docstring).
    # Stamp strictly increasing mtimes in range order, like the WAL would.
    from better_cdc_spark.streaming.core import stamp_ordered_mtimes

    stamp_ordered_mtimes(src)

    pipe = CDCStreamPipeline(
        spark,
        src,
        work,
        allowlist=["public.orders", "public.accounts"],
        max_files_per_trigger=files_per_trigger,  # one WAL-segment group per
        # micro-batch, like the reference's batch mode: n_batches flushes
        # through the commit path (files admitted oldest-mtime-first, so
        # each epoch still holds a contiguous ingest range)
    )
    # R21 SLO histograms ride the same run: the listener folds each
    # micro-batch's progress into the reference's latency buckets, so the
    # load rig reports real p50/p99 batch latency alongside ops/sec
    # (prometheus.go:134-139; callbacks are async — poll briefly).
    from better_cdc_spark.metrics import CDCMetricsListener

    listener = CDCMetricsListener()
    spark.streams.addListener(listener)
    try:
        t0 = time.perf_counter()
        pipe.run_available()
        dt = time.perf_counter() - t0
        n_events = pipe.sink().count()
        deadline = time.time() + 5.0
        while listener.batches_total < n_batches and time.time() < deadline:
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)
    return {
        "metric": "cdc_e2e_ops_per_sec",
        "value": round(n_ops / dt, 1),
        "unit": "ops/sec",
        "n_ops": n_ops,
        "n_batches": n_batches,
        "wall_sec": round(dt, 2),
        "sink_events": n_events,
        # measured micro-batch walls from the listener; the SLO
        # histogram's p50/p99 clamp at the reference's top bucket
        # (100 ms) because Spark micro-batches at this scale run in
        # SECONDS — the bucket layout is reference parity, the ms
        # figures below are the informative per-batch numbers here
        "batch_duration_ms_avg": round(
            listener.total_batch_duration_ms / max(listener.batches_total, 1), 1
        ),
        "batch_duration_ms_last": listener.last_batch_duration_ms,
        "batch_latency_us_p99": listener.batch_latency_us.quantile(0.99),
    }


def _rss_sampler(stop_event, out: dict) -> None:
    """1 Hz peak-RSS sampling of this python driver and its Spark JVM
    child (local-mode: the JVM is the 'driver' that holds executor
    threads), so a scale run reports memory alongside ops/sec. Reads
    /proc — Linux-only; silently absent elsewhere."""
    import os
    import threading  # noqa: F401  (documents the daemon-thread contract)

    me = os.getpid()

    def rss_kib(pid: int) -> int:
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    def jvm_child() -> int:
        try:
            for pid in os.listdir("/proc"):
                if not pid.isdigit():
                    continue
                try:
                    with open(f"/proc/{pid}/stat") as f:
                        parts = f.read().split()
                    if parts[1] == "(java)" and int(parts[3]) == me:
                        return int(pid)
                except (OSError, IndexError, ValueError):
                    continue
        except OSError:
            pass
        return 0

    jvm = 0
    while not stop_event.wait(1.0):
        out["peak_python_rss_mib"] = max(
            out.get("peak_python_rss_mib", 0), rss_kib(me) // 1024
        )
        jvm = jvm or jvm_child()
        if jvm:
            out["peak_jvm_rss_mib"] = max(
                out.get("peak_jvm_rss_mib", 0), rss_kib(jvm) // 1024
            )


def main() -> int:
    import threading

    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("e2e-load", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    rss: dict = {}
    stop = threading.Event()
    sampler = threading.Thread(target=_rss_sampler, args=(stop, rss), daemon=True)
    sampler.start()
    try:
        result = run_load(spark, n_ops, n_batches)
    finally:
        stop.set()
        sampler.join(timeout=3)
    result.update(rss)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
