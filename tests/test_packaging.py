"""spark-submit --py-files packaging smoke test: build the zip, run the
encode CLI through a real spark-submit with ONLY the zip on the python
path, then verify bit-identity through the CLI."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_pyfiles_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles
    out = make_pyfiles.build(str(tmp_path / "cvx.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "compressed_vec_spark/nibblepack.py" in names
    assert "compressed_vec_spark/spark/encode_job.py" in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.slow
def test_spark_submit_encode_verify(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles
    zip_path = make_pyfiles.build(str(tmp_path / "cvx.zip"))
    out_dir = str(tmp_path / "enc")
    src_dir = str(tmp_path / "src")

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    # cwd=tmp_path ensures the job can ONLY import via --py-files
    run = lambda *args: subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "spark_job.py"), *args],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env)

    r = run("encode", "--synthetic", "2000", "--output", out_dir,
            "--partitions", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["ratio"] > 1.0

    # write the same synthetic table for the verify step
    sys.path.insert(0, REPO)
    from compressed_vec_spark.spark.session import get_spark
    from compressed_vec_spark.spark import webtable
    spark = get_spark("pkg-test", cores=4)
    try:
        webtable.webpages(spark, 2000).write.mode("overwrite").parquet(src_dir)
    finally:
        spark.stop()

    r = run("verify", "--source", src_dir, "--encoded", out_dir)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert all(v == 0 for v in res["mismatches"].values())
