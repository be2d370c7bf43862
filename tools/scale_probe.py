"""Decompose the headline pipeline's 8->32 scaling ceiling (VERDICT r3 #5).

Runs pipeline variants at two core counts and prints per-variant wall +
ratio, isolating which stage stops scaling on this single-socket box:

  gen        spark.range + encode (pure codegen ALU) -> global count
  aggsmall   + groupBy(h3_7) count (16k-group hash map)
  explodeagg + explode(5 res), no join (isolates Generate)
  joinnoudf  + broadcast-hash probe, no refine UDF (isolates the probe)
  joinagg    + explode/broadcast-join/refine, agg by h3_7 (isolates join)
  full       the real headline (agg by region_id,tx,ty — ~200k groups)
  full512/full128  smaller covers (L2-resident hash relation)
  fullpacked headline but aggregating on ONE packed long key
  inset      cover membership as per-(region,res) InSet Column predicates
             (OOMs codegen at target 4096 — kept as the negative exhibit)
  fullpre / coarse / coarse2  prefilter attempts that trip janino's 64KB
             processNext limit on the generator-shaped stage (interpreted
             fallback — see BENCH/PLANS.md r4)
  scanfull / scancoarse  tmpfs-parquet source variants (decode-bound)

Usage: python tools/scale_probe.py [variant ...] [--rows N] [--cores 8,32]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

RES_SET = (7, 8, 9, 10, 11)


def _pts(spark, n_rows, n_parts):
    from pgsql2osm_spark.functions import cells as C
    from pgsql2osm_spark.sources import fixtures as FX

    pts = FX.points_jvm_df(spark, n_rows, parts=n_parts)
    return C.with_cell_columns(pts, "lon", "lat", RES_SET)


def v_gen(spark, n_rows, n_parts):
    pts, names = _pts(spark, n_rows, n_parts)
    return pts.select(F.sum(F.col(names[0])).alias("s"))


def v_aggsmall(spark, n_rows, n_parts):
    pts, names = _pts(spark, n_rows, n_parts)
    return pts.groupBy(F.col(names[0])).agg(F.count(F.lit(1)).alias("n"))


def _joined(spark, n_rows, n_parts):
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    return SJ.pip_join(
        spark, pts, FX.gen_admin_polygons(12),
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, names)),
    )


def v_joinagg(spark, n_rows, n_parts):
    return _joined(spark, n_rows, n_parts).groupBy("h3_7").agg(
        F.count(F.lit(1)).alias("n")
    )


def _joined_target(spark, n_rows, n_parts, target_cells):
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    return SJ.pip_join(
        spark, pts, FX.gen_admin_polygons(12), target_cells=target_cells,
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, names)),
    )


def v_full512(spark, n_rows, n_parts):
    """Headline with a SMALLER cover (target 512 cells/region): the hash
    relation drops from ~2MB to ~250KB (per-core-L2-resident), trading
    more boundary-refine rows for cache-local probes."""
    from pgsql2osm_spark.functions import geometry as G

    joined = _joined_target(spark, n_rows, n_parts, 512)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_full128(spark, n_rows, n_parts):
    from pgsql2osm_spark.functions import geometry as G

    joined = _joined_target(spark, n_rows, n_parts, 128)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_full(spark, n_rows, n_parts):
    from pgsql2osm_spark.functions import geometry as G

    joined = _joined(spark, n_rows, n_parts)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_fullpacked(spark, n_rows, n_parts):
    from pgsql2osm_spark.functions import geometry as G

    joined = _joined(spark, n_rows, n_parts)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    key = (
        F.col("region_id").cast("long") * F.lit(1 << 44)
        + F.col("tx").cast("long") * F.lit(1 << 22)
        + F.col("ty").cast("long")
    )
    return tiles.withColumn("_k", key).groupBy("_k").agg(F.count(F.lit(1)).alias("n"))


def v_inset(spark, n_rows, n_parts):
    """Cover membership via cache-resident InSet predicates instead of the
    exploded broadcast-hash join; candidates come from ONE projected
    12-element struct array (explode references the column only)."""
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.functions import udfs
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    by_res = dict(zip(RES_SET, names))
    cover_pdf, rings_by_region = SJ.build_cover(FX.gen_admin_polygons(12), 7, 11, 4096)
    elems = []
    for rid, g in cover_pdf.groupby("region_id"):
        int_pred, bnd_pred = F.lit(False), F.lit(False)
        for res, gr in g.groupby("res"):
            col = F.col(by_res[int(res)])
            ci = gr.loc[~gr["is_boundary"], "cell"].tolist()
            cb = gr.loc[gr["is_boundary"], "cell"].tolist()
            if ci:
                int_pred = int_pred | col.isin([int(c) for c in ci])
            if cb:
                bnd_pred = bnd_pred | col.isin([int(c) for c in cb])
        elems.append(
            F.when(
                int_pred | bnd_pred,
                F.struct(F.lit(int(rid)).alias("region_id"), int_pred.alias("interior")),
            )
        )
    staged = pts.withColumn("_cands", F.array(*elems))
    row = (
        staged.select("image_id", "lon", "lat", "h3_7", F.explode("_cands").alias("_c"))
        .where(F.col("_c").isNotNull())
        .select(
            "image_id", "lon", "lat", "h3_7",
            F.col("_c.region_id").alias("region_id"),
            F.col("_c.interior").alias("_interior"),
        )
    )
    rings_bc = spark.sparkContext.broadcast(
        {rid: list(rings) for rid, rings in rings_by_region.items()}
    )
    exact = udfs.make_pip_udf(rings_bc)(F.col("region_id"), F.col("lon"), F.col("lat"))
    kept = row.where(F.col("_interior") | exact)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = kept.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_explodeagg(spark, n_rows, n_parts):
    """Isolate Generate: explode the 5 per-res cells, no join, small agg."""
    pts, names = _pts(spark, n_rows, n_parts)
    e = pts.withColumn("_cell", F.explode(F.array(*[F.col(n) for n in names])))
    return e.groupBy("h3_7").agg(F.count(F.lit(1)).alias("n"))


def v_joinnoudf(spark, n_rows, n_parts):
    """Isolate the broadcast-hash probe: explode + join, NO refine UDF."""
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    cover_pdf, _ = SJ.build_cover(FX.gen_admin_polygons(12), 7, 11, 4096)
    cov = F.broadcast(spark.createDataFrame(cover_pdf[["cell", "region_id", "is_boundary"]]))
    e = pts.withColumn("_cell", F.explode(F.array(*[F.col(n) for n in names])))
    cand = e.join(cov, e["_cell"] == cov["cell"], "inner")
    return cand.groupBy("h3_7").agg(F.count(F.lit(1)).alias("n"))


def v_fullpre(spark, n_rows, n_parts):
    """Headline + the bbox union prefilter BEFORE the explode/join: the
    pure-codegen compare scales like ALU and cuts probe traffic to the
    in-bbox fraction."""
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    regions = FX.gen_admin_polygons(12)
    pre = SJ.pip_join_bbox_prefilter(pts, regions)
    joined = SJ.pip_join(
        spark, pre, regions,
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, names)),
    )
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_coarse(spark, n_rows, n_parts):
    """Headline + ONE coarse InSet prefilter: points whose res-7 cell is not
    an ancestor of ANY cover cell skip the explode/join entirely. The
    ancestor set is a few hundred longs (L1-resident, single hash probe,
    pure codegen) and is an exact superset of all matches."""
    from pgsql2osm_spark.functions import cells as C
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    regions = FX.gen_admin_polygons(12)
    cover_pdf, _ = SJ.build_cover(regions, 7, 11, 4096)
    anc = {int(c) for c in C.cell_parent(cover_pdf["cell"].to_numpy(), 7)}
    pre = pts.where(F.col(names[0]).isin(sorted(anc)))
    joined = SJ.pip_join(
        spark, pre, regions,
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, names)),
    )
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_coarse2(spark, n_rows, n_parts):
    """Coarse prefilter WITHOUT a Filter operator: the explode array is
    gated by the res-7 ancestor InSet (`when(isin, array(...))`) — a null
    array explodes to zero rows, so non-candidate points die inside the
    Generate without any join probe and no extra operator enters the fused
    stage (the plain `.where()` form pushed processNext() past janino's
    64KB method limit -> interpreted fallback)."""
    from pgsql2osm_spark.functions import cells as C
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.functions import udfs
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts, names = _pts(spark, n_rows, n_parts)
    regions = FX.gen_admin_polygons(12)
    cover_pdf, rings_by_region = SJ.build_cover(regions, 7, 11, 4096)
    anc = sorted({int(c) for c in C.cell_parent(cover_pdf["cell"].to_numpy(), 7)})
    arr = F.when(
        F.col(names[0]).isin(anc), F.array(*[F.col(n) for n in names])
    )
    probe = pts.withColumn("_arr", arr).withColumn("_cell", F.explode("_arr")).drop("_arr")
    cov = F.broadcast(
        spark.createDataFrame(cover_pdf[["cell", "region_id", "is_boundary"]])
    )
    cand = probe.join(cov, probe["_cell"] == cov["cell"], "inner")
    rings_bc = spark.sparkContext.broadcast(
        {rid: list(r) for rid, r in rings_by_region.items()}
    )
    exact = udfs.make_pip_udf(rings_bc)(F.col("region_id"), F.col("lon"), F.col("lat"))
    kept = cand.where((~F.col("is_boundary")) | exact).select(
        "image_id", "lon", "lat", "h3_7", "region_id"
    )
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = kept.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


_SCAN_PATH = "/dev/shm/probe_pts"
_SCAN_ROWS = {"n": 0}


def _scan_pts(spark, n_rows):
    """Materialize the synthetic points ONCE as parquet on tmpfs and scan
    them — the production shape (real jobs read storage; the generator's
    giant expression tree otherwise shares — and overflows — the probe
    stage's generated processNext)."""
    from pgsql2osm_spark.functions import cells as C
    from pgsql2osm_spark.sources import fixtures as FX

    path = f"{_SCAN_PATH}_{n_rows}"
    if not os.path.exists(path + "/_SUCCESS"):
        FX.points_jvm_df(spark, n_rows, parts=256).write.mode("overwrite").parquet(path)
    pts = spark.read.parquet(path)
    return C.with_cell_columns(pts, "lon", "lat", RES_SET)


def _scan_tail(spark, pts, names, prefilter: bool):
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    joined = SJ.pip_join(
        spark, pts, FX.gen_admin_polygons(12),
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, names)),
        coarse_prefilter=prefilter,
    )
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def v_scanfull(spark, n_rows, n_parts):
    pts, names = _scan_pts(spark, n_rows)
    return _scan_tail(spark, pts, names, prefilter=False)


def v_scancoarse(spark, n_rows, n_parts):
    pts, names = _scan_pts(spark, n_rows)
    return _scan_tail(spark, pts, names, prefilter=True)


VARIANTS = {
    "gen": v_gen,
    "explodeagg": v_explodeagg,
    "joinnoudf": v_joinnoudf,
    "fullpre": v_fullpre,
    "coarse": v_coarse,
    "coarse2": v_coarse2,
    "scanfull": v_scanfull,
    "scancoarse": v_scancoarse,
    "aggsmall": v_aggsmall,
    "joinagg": v_joinagg,
    "full": v_full,
    "full512": v_full512,
    "full128": v_full128,
    "fullpacked": v_fullpacked,
    "inset": v_inset,
}


def run(variant: str, cores: int, n_rows: int) -> float:
    from pgsql2osm_spark.session import get_spark

    spark = get_spark(
        app=f"probe_{variant}_{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench",
                    "spark.ui.showConsoleProgress": "false",
                    "spark.sql.codegen.methodSplitThreshold":
                        os.environ.get("PROBE_SPLIT", "1024")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = VARIANTS[variant]
    if variant.startswith("scan"):
        _scan_pts(spark, n_rows)  # materialize OUTSIDE the timed window
    fn(spark, 5_000_000, cores).count()  # warm codegen + broadcasts + py workers
    t0 = time.perf_counter()
    fn(spark, n_rows, cores * 2).count()
    dt = time.perf_counter() - t0
    spark.stop()
    return dt


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows = 300_000_000
    cores = (8, 32)
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            rows = int(a.split("=")[1])
        if a.startswith("--cores"):
            cores = tuple(int(v) for v in a.split("=")[1].split(","))
    names = args or list(VARIANTS)
    for name in names:
        t = {}
        for c in cores:
            load = os.getloadavg()[0]
            t[c] = run(name, c, rows)
            print(f"{name:10s} cores={c:2d} wall={t[c]:7.2f}s "
                  f"({rows / t[c] / 1e6:7.1f} M/s) load_before={load:.1f}", flush=True)
        lo, hi = cores
        print(f"{name:10s} ratio {lo}->{hi}: "
              f"{t[lo] / ((hi / lo) * t[hi]):.3f}", flush=True)
