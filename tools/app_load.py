"""App-mode load benchmark (r13 verdict item 5): drive the SAME corpus as
tools/e2e_load.py through the COMMITTED entrypoint — `python -m
better_cdc_spark SRC --once` in a subprocess, with the streaming listener
and health surface attached — and report ops/sec + peak RSS, proving the
composed service holds the rig's throughput (done-bar: within ~10%).

Differences from the rig, held equal here: identical synthetic wal2json
corpus, partitioning, and mtime stamping; pipeline knobs passed the way an
OPERATOR would pass them (env vars -> EngineConfig): TABLE_FILTER for the
allowlist, MAX_FILES_PER_TRIGGER=8, FAILURE_POLICY=crash (the rig's
decode policy). Wall is the app's own logged drain_sec (processAllAvailable
only — the same segment the rig times); process startup/corpus gen are
excluded from ops/sec exactly as in the rig.

Usage: PYTHONPATH=/root/repo python tools/app_load.py [n_ops] [n_batches]
Prints one JSON line: {"metric": "cdc_app_ops_per_sec", ...}. Run SOLO.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FILES_PER_TRIGGER = 8


def _rss_sampler(stop_event, app_pid: int, out: dict) -> None:
    """1 Hz peak-RSS of the app subprocess and its Spark JVM child."""

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
                    if parts[1] == "(java)" and int(parts[3]) == app_pid:
                        return int(pid)
                except (OSError, IndexError, ValueError):
                    continue
        except OSError:
            pass
        return 0

    jvm = 0
    while not stop_event.wait(1.0):
        out["peak_python_rss_mib"] = max(
            out.get("peak_python_rss_mib", 0), rss_kib(app_pid) // 1024
        )
        jvm = jvm or jvm_child()
        if jvm:
            out["peak_jvm_rss_mib"] = max(
                out.get("peak_jvm_rss_mib", 0), rss_kib(jvm) // 1024
            )


def main() -> int:
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tmp = Path(tempfile.mkdtemp(prefix="bcs_app_load_"))
    try:
        src, work = str(tmp / "src"), str(tmp / "work")
        gen = subprocess.run(
            [sys.executable, "-c",
             "import sys\n"
             "from better_cdc_spark.session import get_spark\n"
             "from better_cdc_spark.streaming.core import stamp_ordered_mtimes\n"
             "from tools.e2e_load import synthetic_ops\n"
             "spark = get_spark('app-load-gen', cpus=32)\n"
             "spark.sparkContext.setLogLevel('ERROR')\n"
             "n_parts = int(sys.argv[3]) * int(sys.argv[4])\n"
             "(synthetic_ops(spark, int(sys.argv[2]))\n"
             " .repartitionByRange(n_parts, 'ingest_seq')\n"
             " .sortWithinPartitions('ingest_seq').write.json(sys.argv[1]))\n"
             "stamp_ordered_mtimes(sys.argv[1])\n",
             src, str(n_ops), str(n_batches), str(FILES_PER_TRIGGER)],
            env={**os.environ, "PYTHONPATH": str(REPO)}, cwd=str(REPO),
            timeout=1200,
        )
        if gen.returncode != 0:
            return gen.returncode

        env = {**os.environ, "PYTHONPATH": str(REPO)}
        env.update({
            "HEALTH_ADDR": "127.0.0.1:0",
            "TABLE_FILTER": "public.orders,public.accounts",
            "MAX_FILES_PER_TRIGGER": str(FILES_PER_TRIGGER),
            "FAILURE_POLICY": "crash",
        })
        rss: dict = {}
        t0 = time.perf_counter()
        proc = subprocess.Popen(
            [sys.executable, "-m", "better_cdc_spark", src, "--once",
             "--work-dir", work],
            cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        stop = threading.Event()
        sampler = threading.Thread(
            target=_rss_sampler, args=(stop, proc.pid, rss), daemon=True
        )
        sampler.start()
        try:
            out, _ = proc.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            # kill the app (and its JVM) BEFORE the tmp cleanup below —
            # otherwise rmtree deletes src/work under a live stream and
            # an orphaned 32g-heap JVM keeps squatting on the bench host
            proc.kill()
            proc.communicate()
            raise
        finally:
            stop.set()
            sampler.join(timeout=3)
        total_wall = time.perf_counter() - t0
        m = re.search(r"drained source in ([0-9.]+)s; sink holds (\d+) events",
                      out)
        if proc.returncode != 0 or m is None:
            sys.stderr.write(out[-3000:])
            return 1
        drain_s, sink_events = float(m.group(1)), int(m.group(2))
        result = {
            "metric": "cdc_app_ops_per_sec",
            "value": round(n_ops / drain_s, 1),
            "unit": "ops/sec",
            "n_ops": n_ops,
            "n_batches": n_batches,
            "wall_sec": round(drain_s, 2),
            "process_wall_sec": round(total_wall, 2),
            "sink_events": sink_events,
            **rss,
        }
        print(json.dumps(result))
        return 0 if sink_events == n_ops else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
