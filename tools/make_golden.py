"""Generate committed golden outputs (FIXTURES.md §4).

Two sections:
1. test goldens (golden/*.parquet) — from the NUMPY oracles, independent of
   the Spark engine, so tests catch engine drift.
2. driver-oracle goldens (golden/oracle/*.parquet + golden/fixtures/*) — the
   engine-only queries of __spark_entry__ (multi-res cover, ring kNN, image
   decode, LSH...) pinned to parquet so oracle_sql() can expose them to the
   driver's DuckDB cross-check. Where an independent recomputation exists
   (even-odd PIP, haversine kNN, phash hamming, embedding LSH+cosine) the
   Spark output is VERIFIED against it before pinning; the rest are
   regression pins whose independent checks live in tests/ (pixel-parity
   PSNR, kernel parity, planted-dup recall).

Usage: python tools/make_golden.py            (test goldens only)
       python tools/make_golden.py --oracle   (both; needs a Spark session)
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


# ---------------------------------------------------------------------------
# Independent recomputations for the oracle goldens (deliberately different
# formulations from the engine kernels).
# ---------------------------------------------------------------------------


def _indep_point_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd PIP, per-edge accumulation with the classic division form —
    NOT the engine's vectorized (N, M) _crossings kernel."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        m = len(r)
        for j in range(m):
            x0, y0 = r[j]
            x1, y1 = r[(j + 1) % m]
            if y0 == y1:
                continue
            cond = (y0 > py) != (y1 > py)
            if not cond.any():
                continue
            xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
            inside ^= cond & (px < xint)
    return inside


def _indep_haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Haversine via the atan2 formulation (engine uses asin)."""
    R = 6_371_008.8
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * R * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


def _check_pip_counts(pdf: pd.DataFrame, n_points: int, n_regions: int) -> None:
    lon, lat = FX.gen_points_slice(0, n_points)
    exp = {}
    for reg in FX.gen_admin_polygons(n_regions):
        rings = G.normalize_rings(FX.region_rings(reg))
        n = int(_indep_point_in_rings(lon, lat, rings).sum())
        if n:
            exp[int(reg["region_id"])] = n
    got = {int(r.region_id): int(r.n) for r in pdf.itertuples()}
    assert got == exp, f"PIP counts mismatch: got {got} exp {exp}"


def _check_knn_rings(pdf: pd.DataFrame) -> None:
    n = 5000
    lon, lat = FX.gen_points_slice(0, n)
    ids = np.asarray([f"img{i:012d}" for i in range(n)])
    rng = np.random.default_rng(5)
    queries = pd.DataFrame(
        {"query_id": np.arange(8), "lon": rng.uniform(-170, 170, 8), "lat": rng.uniform(-55, 65, 8)}
    )
    exp = set()
    for q in queries.itertuples():
        d = _indep_haversine_m(lon, lat, q.lon, q.lat)
        order = np.lexsort((ids, d))[:5]
        # guard: the top-5 boundary must clear libm/formulation rounding noise,
        # otherwise the asin-vs-atan2 difference could flip a rank
        ds = np.sort(d)
        assert (np.diff(ds[:6]) / np.maximum(ds[1:6], 1.0) > 1e-9).all(), (
            f"query {q.query_id}: rank margin too small for a robust golden"
        )
        exp |= {(int(q.query_id), str(ids[i]), r) for r, i in enumerate(order, 1)}
    got = {(int(r.query_id), str(r.neighbor_id), int(r.rank)) for r in pdf.itertuples()}
    assert got == exp, f"knn mismatch: {sorted(got ^ exp)[:6]}"


def _check_phash_pairs(pdf: pd.DataFrame) -> None:
    imgs = FX.gen_images_pandas(128)
    ph = imgs["phash"].to_numpy(dtype=np.int64).astype(np.uint64)
    ids = imgs["image_id"].tolist()
    all_ids = ids + [f"dup_{i}" for i in ids[:4]]
    all_ph = np.concatenate([ph, ph[:4]])
    exp = set()
    for i in range(len(all_ids)):
        for j in range(len(all_ids)):
            if all_ids[i] < all_ids[j]:
                h = bin(int(all_ph[i] ^ all_ph[j])).count("1")
                if h <= 2:
                    exp.add((all_ids[i], all_ids[j]))
    got = {(r.id_a, r.id_b) for r in pdf.itertuples()}
    assert got == exp, f"phash pairs mismatch: {sorted(got ^ exp)[:6]}"


def _check_embedding_near_dups(pdf: pd.DataFrame, sf_dir: str) -> None:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    keep = vids < 10
    all_vecs = np.vstack([vecs, vecs[keep]])
    all_ids = np.concatenate([vids, vids[keep] + 1000000])
    # default n_tables=2: candidate iff within hamming 2 in EITHER plane set
    sigs_t = []
    for seed in (42, 43):
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((32, all_vecs.shape[1]))
        sigs_t.append((all_vecs @ planes.T) > 0)
    norms = np.linalg.norm(all_vecs, axis=1)
    exp = set()
    for i in range(len(all_ids)):
        hit = np.zeros(len(all_ids), dtype=bool)
        for sigs in sigs_t:
            hit |= (sigs != sigs[i]).sum(axis=1) <= 2
        cand = np.nonzero(hit & (all_ids > all_ids[i]))[0]
        for j in cand:
            c = float(all_vecs[i] @ all_vecs[j] / (norms[i] * norms[j]))
            if c >= 0.999:
                exp.add((int(all_ids[i]), int(all_ids[j])))
    got = {(int(r.id_a), int(r.id_b)) for r in pdf.itertuples()}
    assert got == exp, f"embedding near-dup mismatch: {sorted(got ^ exp)[:6]}"


# queries pinned as driver oracles: name -> optional independent validator
ORACLE_QUERIES: dict = {
    "pip_fixture_regions": lambda pdf, sf: _check_pip_counts(pdf, 20000, 12),
    "pip_partitioned_fixture": lambda pdf, sf: _check_pip_counts(pdf, 20000, 12),
    "knn_rings_fixture": lambda pdf, sf: _check_knn_rings(pdf),
    "phash_near_dups": lambda pdf, sf: _check_phash_pairs(pdf),
    "embedding_near_dups": _check_embedding_near_dups,
    # regression pins — independent checks live in tests/ (see module doc)
    "image_decode_stats": None,
    "simhash": None,
    "simhash_near_dups": None,
    "minhash_pairs": None,
    "s2_encode": None,
    "ann_ivf": None,
    "streaming_tiles": None,
    "export_pipeline": None,
    "audio_features": None,  # numpy-parity check lives in tests/test_audio.py
}

ORACLE_SF = "/root/testdata/sf0.01"


def make_oracle_goldens(sf_dir: str = ORACLE_SF) -> None:
    from pgsql2osm_spark.session import get_spark
    from pgsql2osm_spark.sources import regions as RG

    sys.path.insert(0, os.path.dirname(GOLDEN_DIR))
    import __spark_entry__ as E

    os.makedirs(f"{GOLDEN_DIR}/oracle", exist_ok=True)
    os.makedirs(f"{GOLDEN_DIR}/fixtures", exist_ok=True)

    # fixtures backing the REAL-SQL oracles (regions_lookup, closure_fixture)
    edges = [
        (r["parent_id"], r["parent_kind"], m["ref"], m["role"], m["type"])
        for r in FX.gen_memberships()
        for m in r["members"]
    ]
    pd.DataFrame(
        edges, columns=["parent_id", "parent_kind", "ref", "role", "type"]
    ).astype({"parent_id": "int64", "ref": "int64"}).to_parquet(
        f"{GOLDEN_DIR}/fixtures/member_edges.parquet", index=False
    )

    spark = get_spark(
        app="make_golden", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    RG.fixture_regions_dim(spark, 64).toPandas().to_parquet(
        f"{GOLDEN_DIR}/fixtures/regions_dim.parquet", index=False
    )
    qs = E.queries()
    for name, validator in ORACLE_QUERIES.items():
        pdf = qs[name](spark, sf_dir).toPandas()
        if validator is not None:
            validator(pdf, sf_dir)
            tag = "verified-independent"
        else:
            tag = "regression-pin"
        pdf.to_parquet(f"{GOLDEN_DIR}/oracle/{name}.parquet", index=False)
        print(f"oracle golden {name}: {len(pdf)} rows ({tag})")
    spark.stop()


if __name__ == "__main__":
    main()
    if "--oracle" in sys.argv:
        make_oracle_goldens()
