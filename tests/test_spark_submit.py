"""Production-path integration test: spark-submit --py-files.

The north rule's deployment shape is ``spark-submit --py-files pvs.zip``
on a multi-executor cluster. Every other test imports the package from
the repo checkout; this one proves the engine runs when the package is
shipped ONLY as a zip through --py-files — the job script is copied to a
temp dir, PYTHONPATH is scrubbed from the subprocess env, and the repo
dir is never on the submitted job's import path, so both driver-side
imports AND Python-worker imports (the mapInPandas Gorilla codec inside
run_pipeline) must resolve from the zip Spark distributes.

Skipped when spark-submit is not on PATH (it is in this container and on
any real cluster edge node).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_pipeline(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scale_bench import make_zip

    from python_vegindex_spark.sources.synth import synth_turns

    turns_path = str(tmp_path / "turns")
    synth_turns(spark, n_convs=60, seed=11).coalesce(4).write.parquet(turns_path)
    n_in = spark.read.parquet(turns_path).count()

    zip_path = str(tmp_path / "pvs.zip")
    make_zip(zip_path)
    # the job script runs from OUTSIDE the repo so its own
    # dirname-based sys.path insert cannot reach the checkout
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), job)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONSTARTUP")
    }
    out = subprocess.run(
        [
            shutil.which("spark-submit"),
            "--master",
            "local[4]",
            "--driver-memory",
            "2g",
            "--conf",
            f"spark.local.dir={tmp_path}/spark-local",
            "--py-files",
            zip_path,
            job,
            "--turns",
            turns_path,
            "--out",
            str(tmp_path / "rollups"),
            "--cores",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    metrics = None
    for line in out.stdout.splitlines():
        if line.startswith("PIPELINE_METRICS "):
            metrics = json.loads(line[len("PIPELINE_METRICS "):])
    assert metrics is not None, (
        "no PIPELINE_METRICS line:\n" + out.stdout[-2000:] + out.stderr[-3000:]
    )
    assert metrics["n_turns"] == n_in
    # all three tiers produced rows and the chunk encode stage (the
    # worker-side pandas-UDF path that NEEDS the zip) actually ran
    for stage in ("gold_hourly", "gold_daily", "gold_weekly", "chunks_daily"):
        assert metrics["stages"][stage]["rows"] > 0, (stage, metrics)

    # the gold output written by the submitted job is readable back here
    hourly = spark.read.parquet(str(tmp_path / "rollups" / "gold_hourly"))
    assert hourly.count() == metrics["stages"]["gold_hourly"]["rows"]
