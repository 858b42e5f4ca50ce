"""The north rule's literal deployment: `spark-submit --py-files
<package zip> scripts/run_extract.py` as a REAL subprocess — the code
path a cluster runs, not an in-process stand-in. Verifies the zip
shipment (workers import openocr_spark from --py-files, not cwd), the
manifest-gated extraction, and exact resume (a second submit processes
zero buckets but the output is unchanged)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def test_spark_submit_py_files_deploy(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, ROOT)
    from openocr_spark.session import package_zip

    zip_path = package_zip()
    out = tmp_path / "extractions"
    manifest = tmp_path / "manifest"

    def run(run_id: str) -> dict:
        env = dict(os.environ)
        # the driver process must NOT find the repo via cwd — prove the
        # zip carries the package (workers AND driver)
        proc = subprocess.run(
            [
                submit,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(ROOT, "scripts", "run_extract.py"),
                "--synthetic", "60",
                "--output", str(out),
                "--manifest", str(manifest),
                "--buckets", "4",
                "--run-id", run_id,
            ],
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)

    first = run("submit-a")
    assert first["docs_total"] == 60
    assert first["buckets_processed"] == [0, 1, 2, 3]

    # exact resume: identical command, nothing left to do, same output
    second = run("submit-b")
    assert second["buckets_processed"] == []
    assert second["docs_total"] == 60
