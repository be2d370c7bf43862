"""Table sources: catalog-or-parquet resolution and bucketed co-located joins."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pgsql2osm_spark.sources import tables as TB


def test_load_table_parquet_fallback(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "x")
    df.write.parquet(str(tmp_path / "t1.parquet"))
    got = TB.load_table(spark, "t1", base=str(tmp_path))
    assert got.count() == 10


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Co-located join: both sides bucketed on the join key -> the join plan
    has NO Exchange (the 100 TB membership-join shape; Iceberg bucket(N, col)
    analogue). Also checks result parity against a plain join."""
    n = 20_000
    rng = np.random.default_rng(7)
    pts = spark.createDataFrame(
        pd.DataFrame({"cell": rng.integers(0, 500, n), "val": np.arange(n)})
    )
    dims = spark.createDataFrame(
        pd.DataFrame({"cell": np.arange(500), "region": np.arange(500) % 12})
    )
    TB.write_bucketed(pts, "t_pts_bucketed", "cell", n_buckets=8, sort_col="cell")
    TB.write_bucketed(dims, "t_dims_bucketed", "cell", n_buckets=8, sort_col="cell")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # disable broadcast so the co-location (not a broadcast) removes the
        # shuffle; at real scale neither side fits a broadcast anyway
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.read.table("t_pts_bucketed")
        b = spark.read.table("t_dims_bucketed")
        joined = a.join(b, "cell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        got = joined.groupBy("region").agg(F.count(F.lit(1)).alias("n")).collect()
        exp = (
            pts.join(dims, "cell").groupBy("region").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        assert {(r["region"], r["n"]) for r in got} == {(r["region"], r["n"]) for r in exp}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_pts_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_dims_bucketed")


def test_write_bucketed_orphan_guard(spark):
    """Stale-location recovery semantics (VERDICT r4 #6): a leftover managed
    dir is deleted and rewritten ONLY when it looks like a completed orphan;
    a dir with an in-flight _temporary staging dir (concurrent writer
    marker) makes write_bucketed refuse loudly and leave the dir alone."""
    import os
    import shutil

    df = spark.range(10).withColumnRenamed("id", "k")
    table = "t_orphan_guard"
    loc = TB._managed_location(spark, table)
    assert loc is not None
    try:
        # case 1: mid-write dir (no catalog entry, _temporary present)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if os.path.isdir(loc):
            shutil.rmtree(loc)
        os.makedirs(os.path.join(loc, "_temporary"))
        with open(os.path.join(loc, "part-0.parquet"), "wb") as f:
            f.write(b"x")
        try:
            TB.write_bucketed(df, table, "k", n_buckets=2)
            raise AssertionError("expected refusal on mid-write dir")
        except RuntimeError as e:
            assert "refusing to delete" in str(e)
        assert os.path.isdir(os.path.join(loc, "_temporary"))  # untouched
        # case 2: completed orphan (no _temporary, _SUCCESS present)
        shutil.rmtree(os.path.join(loc, "_temporary"))
        with open(os.path.join(loc, "_SUCCESS"), "wb"):
            pass
        TB.write_bucketed(df, table, "k", n_buckets=2)
        assert spark.read.table(table).count() == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if os.path.isdir(loc):
            shutil.rmtree(loc)


def test_rolling_rate_telemetry(spark, tmp_path):
    """A4: rolling rows/sec over a trailing window of manifest events."""
    import os

    from pgsql2osm_spark.plans import manifest as M

    rows = [
        ("j1", "tiles", b, 100 * (b + 1), "", 1000.0 + 10.0 * b) for b in range(6)
    ]
    mdir = str(tmp_path / "out")
    os.makedirs(mdir, exist_ok=True)
    spark.createDataFrame(rows, M.MANIFEST_SCHEMA).write.parquet(f"{mdir}/_manifest")
    got = {
        (r["bucket"], r["buckets_in_window"], r["rows_per_sec_rolling"])
        for r in M.rolling_rate(spark, mdir, "j1", window_sec=20.0).collect()
    }
    # window [-20s, 0]: bucket b sees itself plus up to 2 predecessors
    exp = set()
    for b in range(6):
        in_w = [x for x in range(6) if 0 <= (b - x) * 10.0 <= 20.0]
        exp.add((b, len(in_w), sum(100 * (x + 1) for x in in_w) / 20.0))
    assert got == exp


def test_closure_bucketed_query_plan_and_oracle(spark):
    """The entry-level bucketed closure query (q_closure_bucketed): the
    membership semi-join runs with zero Exchange on the join key (both
    sides bucketed+sorted on ref), and the result equals the plain
    exploded-edges filter (VERDICT r2 next #9)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from pgsql2osm_spark.sources import fixtures as FX

    try:
        out = E.queries()["closure_bucketed"](spark, "/root/testdata/sf0.001")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the join itself is exchange-free: no shuffle on the ref key
        # (the final distinct/sort legitimately exchanges on (kind, id))
        assert "hashpartitioning(ref" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        got = {(r["kind"], r["id"]) for r in out.collect()}
        exp = {
            (r["parent_kind"], r["parent_id"])
            for r in FX.gen_memberships()
            for m in r["members"]
            if m["type"] == "N" and 1 <= m["ref"] < 120
        }
        assert got == exp and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS q_bt_member_edges")
        spark.sql("DROP TABLE IF EXISTS q_bt_seed_nodes")
