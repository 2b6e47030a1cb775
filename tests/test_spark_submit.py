"""North rule: "run via spark-submit --py-files on a multi-executor
cluster". This test does the real thing — zips the package, writes a
small corpus, and launches `spark-submit --py-files pkg.zip
resolve_job.py` as a subprocess FROM A CWD OUTSIDE THE REPO, so the
import genuinely resolves from the shipped zip, the session genuinely
comes from spark-submit's conf, and the job writes/readbacks parquet."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> None:
    pkg = os.path.join(REPO, "gpu_entity_resolver_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(spark, tmp_path):
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(submit):
        import pytest

        pytest.skip("spark-submit launcher not shipped with this pyspark")

    from gpu_entity_resolver_spark.sources.webgen import (
        INPUT_COLUMNS,
        generate_documents,
    )

    work = str(tmp_path)
    pages = os.path.join(work, "pages")
    generate_documents(spark, "/root/testdata/sf0.001").select(
        *INPUT_COLUMNS
    ).limit(200).write.mode("overwrite").parquet(pages)
    pkg_zip = os.path.join(work, "pkg.zip")
    _zip_package(pkg_zip)
    shutil.copy(os.path.join(REPO, "resolve_job.py"), work)

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    proc = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--py-files", pkg_zip,
            os.path.join(work, "resolve_job.py"),
            "--input", pages,
            "--output", os.path.join(work, "resolved"),
            "--checkpoint-dir", os.path.join(work, "ckpt"),
            "--shuffle-partitions", "8",
            "--summary",
        ],
        cwd=work,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(
        next(l for l in reversed(proc.stdout.splitlines()) if l.startswith("{"))
    )
    assert summary["rows"] == 200
    assert 0 < summary["clusters"] <= 200
    # the resumable stage tables + lineage landed under the checkpoint dir
    assert os.path.exists(os.path.join(work, "ckpt", "_lineage"))
