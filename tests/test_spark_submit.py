"""End-to-end ``spark-submit --py-files`` packaging proof.

The north rule requires the engine to be "packaged for spark-submit
--py-files execution on multi-executor clusters". This test builds the
zip with ``make_pyfiles_zip``, then runs a real ``spark-submit`` from a
scratch directory with PYTHONPATH scrubbed, so the driver (and the
pandas-UDF executors it ships work to) can only import
``polars_genson_spark`` from the submitted zip. The driver script
asserts the import did NOT leak from the repo checkout, generates a
corpus, and runs the full validate chain.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from polars_genson_spark.jobs import make_pyfiles_zip

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession

    import polars_genson_spark
    from polars_genson_spark.jobs import run_validation
    from polars_genson_spark.sources.corpus import (
        allowed_sources_df, generate_corpus,
    )

    repo_root, out_dir = sys.argv[1], sys.argv[2]
    origin = polars_genson_spark.__file__ or ""
    assert repo_root not in origin, f"engine leaked from repo: {origin}"

    spark = SparkSession.builder.appName("pgs-submit-e2e").getOrCreate()
    corpus = generate_corpus(spark, n_rows=5000, seed=7)
    result = run_validation(
        spark, corpus, allowed_sources_df(spark), out_dir
    )
    print("PGS_SUBMIT_RESULT " + json.dumps({
        "all_passed": result["all_passed"],
        "validated": len(result["validated"]),
        "partitions": len(result["partitions"]),
    }))
    spark.stop()
    """
)


def _find_spark_submit() -> str | None:
    import pyspark

    cand = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if os.access(cand, os.X_OK):
        return cand
    import shutil

    return shutil.which("spark-submit")


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this host")

    zip_path = make_pyfiles_zip(str(tmp_path / "pgs.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    out_dir = tmp_path / "out"

    # Scrub any path that could resolve the package outside the zip:
    # the subprocess cwd is tmp_path and PYTHONPATH is dropped, so the
    # only source of polars_genson_spark is --py-files.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            str(driver), REPO_ROOT, str(out_dir),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    marker = [
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("PGS_SUBMIT_RESULT ")
    ]
    assert marker, proc.stdout[-4000:]
    import json

    result = json.loads(marker[0].split(" ", 1)[1])
    # generate_corpus plants violations at fixed rates, so the run must
    # complete, cover every source partition, and report the planted
    # failures (not a vacuous pass).
    assert result["partitions"] == 20
    assert result["validated"] == 20
    assert result["all_passed"] is False
    # outputs written through the submitted engine
    assert (out_dir / "manifest.json").exists()
    assert (out_dir / "violations.parquet").exists()
