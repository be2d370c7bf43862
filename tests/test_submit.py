"""The north rule's deployment shape, end to end: spark-submit --py-files
with the package shipped as a zip — executors AND the Spark 4 client-mode
driver import pgsql2osm_spark from the shipped archive (tools/submit_job.py
injects --py-files into the driver's sys.path after session creation)."""

import os
import subprocess

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from pgsql2osm_spark.session import make_pyfiles_zip
    from pgsql2osm_spark.sources import fixtures as FX

    lon, lat = FX.gen_points_slice(0, 5000)
    pts = str(tmp_path / "pts")
    spark.createDataFrame(
        pd.DataFrame({"image_id": [str(i) for i in range(5000)], "lon": lon, "lat": lat})
    ).write.parquet(pts)
    zip_path = make_pyfiles_zip()
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
            "--conf", "spark.ui.showConsoleProgress=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", pts, "--bbox=-20,30,30,55", "--out", out, "--zoom", "8",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = spark.read.parquet(f"{out}/tiles")
    rows = got.count()
    # the bbox rectangle is the boundary: every surviving point is inside it
    pdf = got.select("lon", "lat").toPandas()
    assert rows > 0
    assert ((pdf["lon"] >= -20) & (pdf["lon"] <= 30)).all()
    assert ((pdf["lat"] >= 30) & (pdf["lat"] <= 55)).all()
    exp = int(np.sum((lon >= -20) & (lon <= 30) & (lat >= 30) & (lat <= 55)))
    assert rows == exp
