"""north_rule launch shape: `spark-submit --py-files er_pipeline.zip
main.py` runs the staged pipeline end-to-end in a fresh JVM."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "er_pipeline.zip")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "main.py"), "--make-zip", zip_path],
        check=True, capture_output=True, cwd=ROOT,
    )
    wh = str(tmp_path / "wh")
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(ROOT, "main.py"), "--stage", "all",
         "--n-pages", "200", "--warehouse", wh],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["stage"] == "all" and rec["rows_out"] > 0
    assert set(rec["stage_sec"]) == {
        "extract", "mention", "block", "pairs", "score", "cluster"
    }
