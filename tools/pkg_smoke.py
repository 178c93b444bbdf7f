"""Packaging smoke (reference build.yml parity): prove a FRESH venv can
`pip install` this repo and that the installed console script —
`better-cdc-spark SRC --once` — drains a synthetic changelog corpus,
without the checkout on PYTHONPATH.

Exit 0 iff: install succeeds, the script exits 0, and its log reports the
full corpus drained. Run via `make pkg-smoke`.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N_OPS = 500


def _ensure_wheel(venv_py: str) -> None:
    """setuptools < 70.1 needs the `wheel` package for bdist_wheel; the
    sandbox image has no network, so fall back to the stdlib test-data
    wheel if `import wheel` fails in the venv."""
    if subprocess.run([venv_py, "-c", "import wheel"],
                      capture_output=True).returncode == 0:
        return
    # sibling pyenv versions ship one in their stdlib test data
    candidates = sorted(
        Path(sys.base_prefix).parent.glob(
            "*/lib/python3.*/test/wheeldata/wheel-*.whl"
        )
    )
    if not candidates:
        print("pkg_smoke: no `wheel` available and no bundled fallback; "
              "install wheel and re-run", file=sys.stderr)
        raise SystemExit(2)
    subprocess.run(
        [venv_py, "-m", "pip", "install", "-q", "--no-index",
         str(candidates[-1])],
        check=True, timeout=120,
    )


def main() -> int:
    tmp = Path(tempfile.mkdtemp(prefix="bcs_pkg_smoke_"))
    try:
        venv = tmp / "venv"
        # --system-site-packages: pyspark/pyarrow come from the host env
        # (no network in the sandbox); the PACKAGE still installs fresh.
        # every subprocess is bounded: this runs as a CI rung (make
        # pkg-smoke), and an unbounded pip/venv/Spark hang would burn the
        # whole runner allotment with no diagnostic
        subprocess.run(
            [sys.executable, "-m", "venv", "--system-site-packages",
             str(venv)],
            check=True, timeout=120,
        )
        venv_py = str(venv / "bin" / "python")
        _ensure_wheel(venv_py)
        subprocess.run(
            [venv_py, "-m", "pip", "install", "-q", "--no-build-isolation",
             "--no-index", str(REPO)],
            check=True, timeout=300,
        )

        src = tmp / "src"
        gen = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, sys.argv[1])\n"
             "from better_cdc_spark.session import get_spark\n"
             "from better_cdc_spark.streaming.core import stamp_ordered_mtimes\n"
             "from tools.e2e_load import synthetic_ops\n"
             "spark = get_spark('pkg-smoke-gen', cpus=4)\n"
             "(synthetic_ops(spark, int(sys.argv[3]))\n"
             " .repartitionByRange(2, 'ingest_seq')\n"
             " .sortWithinPartitions('ingest_seq').write.json(sys.argv[2]))\n"
             "stamp_ordered_mtimes(sys.argv[2])\n",
             str(REPO), str(src), str(N_OPS)],
            env={**os.environ, "PYTHONPATH": str(REPO)},
            timeout=600,
        )
        if gen.returncode != 0:
            return gen.returncode

        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["HEALTH_ADDR"] = "127.0.0.1:0"
        run = subprocess.run(
            [str(venv / "bin" / "better-cdc-spark"), str(src), "--once",
             "--work-dir", str(tmp / "work")],
            cwd=str(tmp), env=env, capture_output=True, text=True,
            timeout=600,
        )
        drained = f"sink holds {N_OPS} events" in (run.stdout + run.stderr)
        print(f"pkg_smoke: exit={run.returncode} drained={drained}")
        if run.returncode != 0 or not drained:
            sys.stderr.write(run.stdout[-2000:] + run.stderr[-2000:])
            return 1
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
