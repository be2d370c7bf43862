"""CLI end-to-end in-process: bbox + geojson boundaries, resume idempotency,
iso error path (reference entry-point surface, SURVEY.md §3)."""

import json

import numpy as np
import pandas as pd
import pytest

from pgsql2osm_spark import cli
from pgsql2osm_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def pts_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "pts")
    lon, lat = FX.gen_points_slice(0, 20000)
    spark.createDataFrame(
        pd.DataFrame({"image_id": [str(i) for i in range(20000)], "lon": lon, "lat": lat})
    ).write.parquet(p)
    return p


def test_cli_bbox_and_resume(spark, pts_path, tmp_path, capsys):
    out = str(tmp_path / "out")
    args = ["--input", pts_path, "--bbox=-20,30,30,55", "--out", out, "--zoom", "10"]
    assert cli.main(args, spark=spark) == 0
    rows1 = spark.read.parquet(f"{out}/tiles").count()
    assert rows1 > 100
    # resume: second run adds nothing (manifest anti-join)
    assert cli.main(args, spark=spark) == 0
    assert spark.read.parquet(f"{out}/tiles").count() == rows1
    progress = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert progress["rows"] == rows1


def test_cli_geojson(spark, pts_path, tmp_path):
    gj = tmp_path / "poly.geojson"
    gj.write_text(
        json.dumps(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 40], [20, 40], [20, 55], [0, 55], [0, 40]]],
                },
            }
        )
    )
    out = str(tmp_path / "outg")
    assert cli.main(
        ["--input", pts_path, "--geojson", str(gj), "--out", out, "--zoom", "8"],
        spark=spark,
    ) == 0
    got = spark.read.parquet(f"{out}/tiles")
    rows = got.select("lon", "lat").collect()
    assert len(rows) > 50
    assert all(0 <= r["lon"] <= 20 and 40 <= r["lat"] <= 55 for r in rows)


def test_cli_bad_iso_exit_code(spark, pts_path, tmp_path):
    rc = cli.main(
        ["--input", pts_path, "--iso", "xx-99", "--out", str(tmp_path / "o")],
        spark=spark,
    )
    assert rc == 2
