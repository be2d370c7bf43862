"""Generate committed golden outputs (FIXTURES.md §4) from the NUMPY oracles
— independent of the Spark engine, so tests catch engine drift.

Usage: python tools/make_golden.py   (writes golden/*.parquet)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgsql2osm_spark.functions import geometry as G
from pgsql2osm_spark.sources import fixtures as FX

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")
N_POINTS = 4000
N_KNN_QUERIES = 12
K = 5


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    lon, lat = FX.gen_points_slice(0, N_POINTS)
    ids = np.arange(N_POINTS)

    # join_rows: brute-force even-odd PIP over every (point, region)
    regions = FX.gen_admin_polygons(12)
    rows = []
    for reg in regions:
        inside = G.points_in_rings(lon, lat, FX.region_rings(reg))
        for i in np.nonzero(inside)[0]:
            rows.append((int(ids[i]), int(reg["region_id"])))
    pd.DataFrame(rows, columns=["idx", "region_id"]).sort_values(
        ["idx", "region_id"]
    ).reset_index(drop=True).to_parquet(f"{GOLDEN_DIR}/join_rows.parquet")

    # tile_assign at z in {7, 12}
    frames = []
    for z in (7, 12):
        xt, yt = G.lonlat_to_tile(lon, lat, z)
        frames.append(pd.DataFrame({"idx": ids, "z": np.int32(z), "x": xt, "y": yt}))
    pd.concat(frames, ignore_index=True).to_parquet(f"{GOLDEN_DIR}/tile_assign.parquet")

    # knn: exact haversine brute force, ties by neighbor id
    rng = np.random.default_rng(5)
    qlon = rng.uniform(-170, 170, N_KNN_QUERIES)
    qlat = rng.uniform(-55, 65, N_KNN_QUERIES)
    out = []
    for q in range(N_KNN_QUERIES):
        d = G.haversine_m(lon, lat, qlon[q], qlat[q])
        order = np.lexsort((ids, d))[:K]
        for r, i in enumerate(order, 1):
            out.append((q, int(ids[i]), r))
    pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank"]).to_parquet(
        f"{GOLDEN_DIR}/knn.parquet"
    )
    print(f"golden written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
