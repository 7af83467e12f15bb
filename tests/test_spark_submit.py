"""The north rule's deployment face, driven for real: `spark-submit
--py-files dist/go_cdc_chunkers_spark.zip jobs/pipeline.py` from OUTSIDE
the repo, so every import resolves through the packaged zip exactly as it
would on a cluster (tools/package.py; reference deploy shape has no
analogue -- the Go library links statically, cmd/cdc/main.go).

Catches the class of bug in-process tests cannot: zip-unsafe resource
access, sys.path assumptions, and get_spark() overriding the
spark-submit-provided master (session.py respects spark.master when the
launcher set one -- pinned here by submitting with --master local[2] and
asserting the session saw it).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


pytestmark = pytest.mark.skipif(
    not os.path.exists(SUBMIT), reason="spark-submit not on this machine"
)


def _build_zip() -> str:
    subprocess.run([sys.executable, os.path.join(ROOT, "tools", "package.py")],
                   check=True, capture_output=True)
    return os.path.join(ROOT, "dist", "go_cdc_chunkers_spark.zip")


def test_spark_submit_pipeline_from_zip(tmp_path):
    zip_path = _build_zip()
    # Run from a scratch dir with a COPIED job script: the only route to
    # the library is the --py-files zip (jobs/pipeline.py's repo-root
    # sys.path fallback points at tmp_path, which holds nothing).
    job = tmp_path / "pipeline.py"
    shutil.copyfile(os.path.join(ROOT, "jobs", "pipeline.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [SUBMIT, "--master", "local[2]",
         "--py-files", zip_path,
         str(job), "--synthetic", "8",
         "--workdir", str(tmp_path / "wd"), "--cpus", "2"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["clips"] > 8  # synthetic corpus expands base clips
    assert out["components"] > 0
    assert out["seconds"] > 0
    assert out["master"] == "local[2]"  # submit's master respected
    # Deterministic synthetic corpus: same label relation as an in-process
    # run of the same config (catches packaged-vs-repo drift, not just
    # "it didn't crash").
    sys.path.insert(0, ROOT)
    from go_cdc_chunkers_spark.plans.pipeline import Pipeline, PipelineConfig
    from go_cdc_chunkers_spark.session import get_spark
    from go_cdc_chunkers_spark.sources import clips as clips_src

    spark = get_spark(app="submit-parity", cpus=2, shuffle_partitions=8)
    clips, _ = clips_src.generate_clips_df(spark, n_base=8)
    comps = Pipeline(spark, str(tmp_path / "wd2"), PipelineConfig()).run(clips)
    assert comps.count() == out["clips"]
    assert comps.select("component_id").distinct().count() == out["components"]
