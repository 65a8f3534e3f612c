"""spark-submit --py-files packaging smoke: the zipped package must run
the pipeline end-to-end in a fresh JVM with NO repo on sys.path —
proving executors need only the zip (north-rule launch shape)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "graphiti_spark.zip"))
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = str(tmp_path / "graph")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # executors must rely on --py-files only
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(ROOT, "scripts", "run_pipeline.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — only the zip provides the package
        env=env,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["extract.n_triples"] == 999.0
    assert metrics["edges.n_invalidated"] == 390.0
    assert os.path.isdir(os.path.join(out_dir, "edges"))
