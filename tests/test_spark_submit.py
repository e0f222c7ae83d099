"""The north rule's submission path, actually exercised: package the
engine as a zip, run the extraction job via ``spark-submit --py-files``
from a directory that does NOT contain the package — so every import on
both driver and executors must resolve through the zip, exactly as on a
real cluster. Slow (~1 min JVM+job); marked for the full suite only."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)
def test_extract_job_via_spark_submit(tmp_path):
    # 1. package the engine exactly as the job docstrings instruct
    zip_path = tmp_path / "sax_wasm_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "sax_wasm_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    # 2. stage the job script OUTSIDE the repo so the package can only
    #    come from --py-files (the job's own sys.path fallback points at
    #    tmp_path, which has no package)
    jobs_dir = tmp_path / "jobs"
    jobs_dir.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), jobs_dir)

    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(jobs_dir / "extract_job.py"),
            "--synth", "400",
            "--num-shards", "4",
            "--output", str(out),
            "--run-id", "submit-smoke",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    # the job prints one JSON stats line
    stats_line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    stats = json.loads(stats_line)
    assert stats["processed_shards"] == 4
    assert (out / "lineage").exists() and (out / "extracted").exists()
