"""Whole-stage-codegen health of the headline pipeline.

The bench stage (generator + morton encode + explode + broadcast join +
agg) sits AT janino's 64KB processNext() limit: r4 measured that adding a
single predicate pushes it into `ERROR CodeGenerator: Failed to compile`
-> SILENT interpreted fallback, 1.5-10x slower with no exception
(BENCH/PLANS.md r4). This guard runs the pipeline in a subprocess and
fails if that ERROR ever appears, so an innocent-looking expression added
to the hot path cannot silently de-optimize the benchmark again."""

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pgsql2osm_spark.session import get_spark
from bench import headline_pipeline

spark = get_spark(
    app="codegen_health", master="local[4]", shuffle_partitions=8,
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
n = headline_pipeline(spark, 1_000_000, 4).count()
assert n > 0
spark.stop()
print("ROWS_OK", n)
"""


def test_headline_pipeline_compiles_whole_stage():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ROWS_OK" in proc.stdout
    assert "Failed to compile" not in proc.stderr, (
        "headline stage fell back to interpreted execution:\n"
        + proc.stderr[-2000:]
    )


_CANARY = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pgsql2osm_spark.session import get_spark
from pgsql2osm_spark.functions import cells as C
from pgsql2osm_spark.functions import geometry as G
from pgsql2osm_spark.operators import spatial_join as SJ
from pgsql2osm_spark.sources import fixtures as FX

spark = get_spark(
    app="codegen_canary", master="local[4]", shuffle_partitions=8,
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
pts = FX.points_jvm_df(spark, 1_000_000, parts=4)
pts, names = C.with_cell_columns(pts, "lon", "lat", (7, 8, 9, 10, 11))
out = SJ.pip_join(
    spark, pts, FX.gen_admin_polygons(12),
    keep_cols=["image_id", "lon", "lat", "h3_7"],
    cell_cols=dict(zip((7, 8, 9, 10, 11), names)),
    coarse_prefilter=True,
)
x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
n = out.withColumn("tx", x).withColumn("ty", y).groupBy(
    "region_id", "tx", "ty"
).agg(F.count(F.lit(1)).alias("n")).count()
assert n > 0
spark.stop()
print("ROWS_OK", n)
"""


def test_prefilter_on_generator_source_still_trips_the_64kb_cliff():
    """CANARY pinning the r4 finding: coarse_prefilter on a GENERATOR-shaped
    source pushes the fused stage past janino's 64KB method limit (results
    stay correct — Spark falls back to interpreted). If this test ever
    FAILS because the error disappeared, Spark's codegen learned to split
    the stage — flip coarse_prefilter on for the bench headline and delete
    this canary."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _CANARY.format(repo=repo)],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ROWS_OK" in proc.stdout  # correctness unaffected by the fallback
    assert "Failed to compile" in proc.stderr, (
        "the 64KB cliff is GONE — enable coarse_prefilter for the bench "
        "headline (BENCH/PLANS.md r4) and remove this canary"
    )


_SCAN_PREFILTER = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import __spark_entry__ as E
from pgsql2osm_spark.operators import spatial_join as SJ
from pgsql2osm_spark.session import get_spark

spark = get_spark(
    app="codegen_scan_prefilter", master="local[4]", shuffle_partitions=8,
    extra_conf={{"spark.ui.showConsoleProgress": "false"}},
)
spark.sparkContext.setLogLevel("ERROR")
# pip_convex: the registry query whose source is a REAL parquet scan, with
# coarse_prefilter=True live in the plan (not folded)
rows = sorted(r["id"] for r in
              E.queries()["pip_convex"](spark, "/root/testdata/sf0.001").collect())
# same join, prefilter OFF, directly on the same scan
p = E._points(spark, "/root/testdata/sf0.001")
region = [{{"region_id": 1, "rings": [np.asarray(E._HEX, dtype=np.float64)]}}]
base = SJ.pip_join(spark, p, region, keep_cols=["id"], coarse_prefilter=False)
rows_base = sorted(r["id"] for r in base.collect())
assert rows == rows_base and len(rows) > 0, (rows[:3], rows_base[:3])
spark.stop()
print("ROWS_OK", len(rows))
"""


def test_scan_shaped_prefilter_compiles_whole_stage():
    """VERDICT r4 #4 positive half: on a SCAN-shaped source (a real parquet
    scan, not the fused bench generator) the coarse-ancestor InSet
    prefilter stays inside whole-stage codegen — no 'Failed to compile' —
    and the output equals the same join with the prefilter off."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCAN_PREFILTER.format(repo=repo)],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ROWS_OK" in proc.stdout
    assert "Failed to compile" not in proc.stderr, (
        "scan-shaped prefilter stage fell back to interpreted execution:\n"
        + proc.stderr[-2000:]
    )
