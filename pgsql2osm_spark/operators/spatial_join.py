"""Broadcast point-in-polygon join — the engine's flagship operator.

Semantics: the reference's boundary selection (`all_nwr_within`,
/root/reference/pgsql2osm/pgsql2osm.py:178-212: ST_Intersects(way, boundary)
over a GiST index) re-expressed for Spark at 10^12-point scale:

  1. driver: each region polygon -> grid-cell cover at an adaptively chosen
     resolution (geometry.adaptive_cover_res — the X1 "adaptive chunk" idea),
     each cover cell classified interior vs boundary (geometry.polygon_cover).
  2. points: cell id per needed resolution computed with PURE JVM bitwise
     expressions (cells.cell_expr — whole-stage codegen, no Python).
  3. broadcast equi-join points.cell == cover.cell, one join per distinct
     cover resolution (<=5), unioned. No shuffle of the fact table at all:
     broadcast hash join + codegen'd cell computation stream through the scan.
  4. interior-cell matches are DONE (no exact test needed); boundary-cell
     matches go through the exact even-odd PIP pandas UDF against broadcast
     rings. This two-stage split is the reference's "AND of ST_Intersects is
     1000x cheaper than ST_Intersection" staging (settings.py:132-140,
     SURVEY.md X2) — typically >90% of candidates are interior and skip
     the Python stage entirely.

Scale notes (100 TB): the fact side is never shuffled or collected; cover +
rings are O(regions * cells_per_region) driver/broadcast data (bounded by
target_cells per region). For region sets too large to broadcast, split the
region list and union — each pass stays broadcast; a shuffle-based cell-cell
join fallback is deliberately NOT the default (it would shuffle the planet).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geometry as G
from ..functions import udfs
from ..sources import fixtures as FX


def build_cover(regions: list[dict], res_lo: int = 7, res_hi: int = 11, target_cells: int = 4096):
    """Driver-side cover build: returns (cover_pdf, rings_by_region).

    cover_pdf columns: region_id:int64, res:int32, cell:int64, is_boundary:bool.
    """
    recs = []
    rings_by_region: dict[int, list[np.ndarray]] = {}
    for reg in regions:
        rings = FX.region_rings(reg) if "outer_rings" in reg else reg["rings"]
        rings = [np.asarray(r, dtype=np.float64) for r in rings]
        rid = int(reg["region_id"])
        rings_by_region[rid] = rings
        res = G.adaptive_cover_res(rings, res_lo, res_hi, target_cells)
        cells_arr, is_bnd = G.polygon_cover(rings, res, max_cells=target_cells * 16)
        recs.append(
            pd.DataFrame(
                {
                    "region_id": np.int64(rid),
                    "res": np.int32(res),
                    "cell": cells_arr,
                    "is_boundary": is_bnd,
                }
            )
        )
    if not recs:
        cover = pd.DataFrame(
            {
                "region_id": pd.Series(dtype="int64"),
                "res": pd.Series(dtype="int32"),
                "cell": pd.Series(dtype="int64"),
                "is_boundary": pd.Series(dtype="bool"),
            }
        )
        return cover, rings_by_region
    cover = pd.concat(recs, ignore_index=True)
    return cover, rings_by_region


def pip_join(
    spark: SparkSession,
    points: DataFrame,
    regions: list[dict],
    lon: str = "lon",
    lat: str = "lat",
    res_lo: int = 7,
    res_hi: int = 11,
    target_cells: int = 4096,
    keep_cols: list[str] | None = None,
    cell_cols: dict[int, str] | None = None,
) -> DataFrame:
    """points x regions -> rows of points inside each region.

    Returns the point columns (or ``keep_cols``) + ``region_id``. A point in
    k overlapping regions yields k rows (nested admin levels do overlap, as
    in the reference's relation hierarchy).
    """
    cover_pdf, rings_by_region = build_cover(regions, res_lo, res_hi, target_cells)
    if cover_pdf.empty:
        out_cols = keep_cols or list(points.columns)
        return (
            points.select(*out_cols)
            .withColumn("region_id", F.lit(None).cast("long"))
            .where(F.lit(False))
        )
    rings_bc = spark.sparkContext.broadcast(
        {rid: [r for r in rings] for rid, rings in rings_by_region.items()}
    )
    pip_udf = udfs.make_pip_udf(rings_bc)
    out_cols = keep_cols or [c for c in points.columns]

    # ONE scan, ONE broadcast join, ONE refine stage. Cell ids embed their
    # resolution in the high bits, so cells at different cover resolutions
    # never collide: exploding the (few) per-res cell ids of each point into
    # a single join key replaces one join per res — and a union whose
    # branches would each rescan the fact table (measured: the unioned form
    # cost 4 source scans + 2 Python stages; this form costs 1 + 1).
    res_list = [int(r) for r in sorted(cover_pdf["res"].unique())]
    cov = spark.createDataFrame(cover_pdf[["cell", "region_id", "is_boundary"]])
    # Materialize per-res cells as projected columns (single shared Morton
    # spread at res 26, per-res shift — cells.with_cell_columns) and explode
    # only the column references: Generate evaluates its expressions
    # interpreted (outside whole-stage codegen), so inlining the bit-math
    # there costs ~100x (measured 16s vs 0.14s on 2M rows).
    cell_cols = dict(cell_cols or {})
    missing = [r for r in res_list if r not in cell_cols]
    probe, new_names = C.with_cell_columns(
        points, lon, lat, missing, names=[f"_cell_r{r}" for r in missing]
    )
    cell_cols.update(dict(zip(missing, new_names)))
    refs = [cell_cols[r] for r in res_list]
    probe = probe.withColumn("_cell", F.explode(F.array(*refs))).drop(*new_names)
    cand = probe.join(F.broadcast(cov), probe["_cell"] == cov["cell"], "inner")
    # interior-cell rows pass without the exact test (X2 staging); the
    # pandas-UDF PIP runs only where a boundary cell made it ambiguous
    kept = cand.where(
        (~F.col("is_boundary")) | pip_udf(F.col("region_id"), F.col(lon), F.col(lat))
    )
    return kept.select(*out_cols, "region_id")


def pip_join_bbox_prefilter(
    points: DataFrame, regions: list[dict], lon: str = "lon", lat: str = "lat"
) -> DataFrame:
    """Cheap global bbox pre-filter (union of region bboxes) to push into the
    parquet scan ahead of pip_join — the reference's conjunctive
    boundary-AND-bbox predicate (settings.py:132-140, SURVEY.md P1)."""
    cond = None
    for reg in regions:
        rings = FX.region_rings(reg) if "outer_rings" in reg else reg["rings"]
        x0, y0, x1, y1 = G.polygon_bbox([np.asarray(r) for r in rings])
        c = (
            (F.col(lon) >= x0)
            & (F.col(lon) <= x1)
            & (F.col(lat) >= y0)
            & (F.col(lat) <= y1)
        )
        cond = c if cond is None else (cond | c)
    return points.where(cond) if cond is not None else points
