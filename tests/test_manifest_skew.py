"""Checkpoint manifest resume + skew mitigation behavior."""

import pandas as pd
from pyspark.sql import functions as F

from pgsql2osm_spark.functions import cells as C
from pgsql2osm_spark.operators import skew as SK
from pgsql2osm_spark.plans import manifest as M
from pgsql2osm_spark.sources import fixtures as FX


def _pts(spark, n):
    lon, lat = FX.gen_points_slice(0, n)
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"img{i:012d}" for i in range(n)], "lon": lon, "lat": lat})
    )
    return df.withColumn("cell", C.cell_expr(F.col("lon"), F.col("lat"), 4))


def test_manifest_write_and_resume(spark, tmp_path):
    out = str(tmp_path / "job")
    df = _pts(spark, 2000)
    M.write_stage_with_manifest(spark, df, out, job_id="j1", stage="tiles", bucket_col="cell")
    m1 = M.read_manifest(spark, out)
    n_buckets = m1.count()
    assert n_buckets > 0
    assert m1.agg(F.sum("row_count")).collect()[0][0] == 2000
    # resume: everything done -> no remaining buckets, second write is a no-op
    rem = M.remaining_buckets(spark, df.select(F.col("cell").alias("bucket")).distinct(), out, "j1", "tiles")
    assert rem.count() == 0
    M.write_stage_with_manifest(spark, df, out, job_id="j1", stage="tiles", bucket_col="cell")
    assert M.read_manifest(spark, out).count() == n_buckets  # no duplicate manifest rows
    # written data matches input
    data = spark.read.parquet(f"{out}/tiles")
    assert data.count() == 2000
    # progress telemetry view
    prog = M.job_progress(spark, out, "j1").collect()
    assert prog[0]["rows"] == 2000


def test_manifest_partial_resume(spark, tmp_path):
    out = str(tmp_path / "job2")
    df = _pts(spark, 1000)
    cells = [r["cell"] for r in df.select("cell").distinct().collect()]
    half = cells[: len(cells) // 2]
    M.write_stage_with_manifest(
        spark, df.where(F.col("cell").isin(half)), out, job_id="j2", stage="s", bucket_col="cell"
    )
    rem = M.remaining_buckets(spark, df.select(F.col("cell").alias("bucket")).distinct(), out, "j2", "s")
    rem_set = {r["bucket"] for r in rem.collect()}
    assert rem_set == set(cells) - set(half)
    # finish the rest; total rows across both writes == input
    M.write_stage_with_manifest(spark, df, out, job_id="j2", stage="s", bucket_col="cell")
    assert spark.read.parquet(f"{out}/s").count() == 1000


def test_salted_repartition_spreads_hot_cell(spark):
    df = _pts(spark, 4000)
    salted = SK.salted_repartition(df, "cell", n_salts=8, n_parts=16)
    # rows within one hot cell land in multiple partitions
    hot = df.groupBy("cell").count().orderBy(F.desc("count")).first()["cell"]
    parts = (
        salted.where(F.col("cell") == hot)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1
    assert salted.count() == 4000  # no row loss


def test_split_hot_cells(spark):
    df = _pts(spark, 4000)
    out = SK.split_hot_cells(df, cell_col="cell", res=4, hot_threshold=100)
    assert out.count() == 4000
    # hot rows got finer cells (res 5), cold rows kept res 4
    res_of = out.select(
        F.col("cell"), F.col("cell_split"), (F.shiftright("cell_split", 56)).alias("r")
    )
    rs = {r["r"] for r in res_of.select("r").distinct().collect()}
    assert rs == {4, 5}
    # max per-key volume shrank
    before = df.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    after = out.groupBy("cell_split").count().agg(F.max("count")).collect()[0][0]
    assert after < before


def test_cell_partitioned_write_prunes_scan(spark, tmp_path):
    """Writing partitioned by a (coarse) cell column yields partition-pruned
    scans for cell-equality predicates — the parquet stand-in for Iceberg
    hidden partitioning (sources/tables.py)."""
    from pgsql2osm_spark.sources import tables as TB

    df = _pts(spark, 3000).withColumn("cell4", F.shiftrightunsigned(F.col("cell"), 0))
    path = str(tmp_path / "bycell")
    TB.write_partitioned(df.drop("cell"), path, "cell4")
    back = spark.read.parquet(path)
    one_cell = [r["cell4"] for r in back.select("cell4").distinct().limit(1).collect()][0]
    q = back.where(F.col("cell4") == one_cell)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell4" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly the partition's rows
    exp = df.where(F.col("cell4") == one_cell).count()
    assert q.count() == exp


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the cell key join with NO Exchange on either
    side — the co-located join strategy for repeatedly-joined 100TB tables
    (SURVEY.md §4 'bucketing for co-located joins')."""
    import shutil
    import uuid

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"pts_bucketed_{suffix}", f"attrs_bucketed_{suffix}"
    df = _pts(spark, 2000)
    (
        df.write.mode("overwrite")
        .bucketBy(8, "cell")
        .sortBy("cell")
        .saveAsTable(ta)
    )
    attrs = df.select("cell").distinct().withColumn("weight", F.lit(1))
    (
        attrs.write.mode("overwrite")
        .bucketBy(8, "cell")
        .sortBy("cell")
        .saveAsTable(tb)
    )
    a = spark.table(ta)
    b = spark.table(tb)
    # force SMJ (broadcast would win on this tiny dim and hide the point):
    # bucketed layout means NO shuffle exchange on either join side
    joined = a.join(b.hint("merge"), "cell")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:800]
    assert "SortMergeJoin" in plan
    assert joined.count() == 2000
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")
