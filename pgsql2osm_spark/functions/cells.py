"""Hierarchical geospatial cell index — the engine's H3/S2 stand-in.

The north rule calls for H3 (res 7-11) and S2 cell encoding. Neither library is
available in this container, so this module implements an equivalent hierarchical
cell scheme from scratch in vectorized numpy:

* ``cell`` ("h3-style"): a Morton (Z-order) quadtree over the equirectangular
  lon/lat plane. Resolution ``r`` partitions the world into a 2^r x 2^r grid;
  a cell id packs ``(res, morton(x, y))`` into one int64. Parent/child are bit
  shifts, neighbors are +/-1 grid arithmetic with longitude wrap, so
  ``grid_disk`` (the kNN ring primitive, SURVEY.md J11) is exact and cheap.
* ``s2_cell`` ("s2-style"): cube-face projection (6 faces, gnomonic with the
  S2 quadratic UV transform) + per-face Morton quadtree, matching the real S2
  cell geometry family.

Both encoders are pure arithmetic over numpy arrays — zero per-row Python —
and are also emitted as Spark ``Column`` expressions (``cell_expr``) and as
DuckDB SQL text (``cell_sql``) so the driver's oracle cross-check can verify
the exact same bits three independent ways.

Reference parity: this replaces the PostGIS index stratum of
/root/reference/pgsql2osm/settings.py:90-146 (boundary predicate over a GiST
index) with explicit cell-grid candidate selection (SURVEY.md S1, J1, X2).

Cell id layout (int64, always positive):
    bits 59..56  resolution (0..26)
    bits 51..0   morton code, 2*res bits used
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = 56

# ---------------------------------------------------------------------------
# Morton (Z-order) bit interleaving — vectorized magic-number bit spreading.
# ---------------------------------------------------------------------------

_SPREAD_MASKS = (
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so bit i lands at position 2*i."""
    x = x.astype(np.uint64) & np.uint64(0x00000000FFFFFFFF)
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << np.uint64(shift))) & mask
    return x


def _compact_bits(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits: gather even-position bits back together."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits) into one uint64."""
    return _spread_bits(x) | (_spread_bits(y) << np.uint64(1))


def morton_decode(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = m.astype(np.uint64)
    return _compact_bits(m), _compact_bits(m >> np.uint64(1))


# ---------------------------------------------------------------------------
# Lat/lon grid cells.
# ---------------------------------------------------------------------------


def latlon_to_xy(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Equirectangular grid coordinates at resolution ``res`` (2^res x 2^res)."""
    n = 1 << res
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def cell_encode(lon, lat, res: int) -> np.ndarray:
    """lon/lat arrays -> int64 cell ids at ``res``. Pure numpy, vectorized."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    x, y = latlon_to_xy(lon, lat, res)
    m = morton_encode(x.astype(np.uint64), y.astype(np.uint64))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | m).astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell).astype(np.uint64) >> np.uint64(_RES_SHIFT)).astype(np.int64)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(cell).astype(np.uint64) & np.uint64((1 << _RES_SHIFT) - 1)
    return tuple(v.astype(np.int64) for v in morton_decode(m))


def xy_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    m = morton_encode(np.asarray(x).astype(np.uint64), np.asarray(y).astype(np.uint64))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | m).astype(np.int64)


def cell_parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Parent cell (one or more levels up) — a pure bit shift, no geometry."""
    cell = np.asarray(cell)
    res = cell_res(cell)
    if parent_res is None:
        steps = np.ones_like(res)
        pres = res - 1
    else:
        steps = res - parent_res
        if np.any(steps < 0):
            raise ValueError("parent_res must be <= cell res")
        pres = np.full_like(res, parent_res)
    m = cell.astype(np.uint64) & np.uint64((1 << _RES_SHIFT) - 1)
    m = m >> (np.uint64(2) * steps.astype(np.uint64))
    return ((pres.astype(np.uint64) << np.uint64(_RES_SHIFT)) | m).astype(np.int64)


def cell_children(cell: int) -> np.ndarray:
    """The 4 direct children of a single cell id."""
    res = int(cell_res(np.asarray([cell]))[0])
    m = (int(cell) & ((1 << _RES_SHIFT) - 1)) << 2
    base = ((res + 1) << _RES_SHIFT) | m
    return np.asarray([base, base + 1, base + 2, base + 3], dtype=np.int64)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    cell = np.asarray(cell)
    res = cell_res(cell)
    n = (np.int64(1) << res).astype(np.float64)
    x, y = cell_to_xy(cell)
    lon0 = x / n * 360.0 - 180.0
    lat0 = y / n * 180.0 - 90.0
    return lon0, lat0, lon0 + 360.0 / n, lat0 + 180.0 / n


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon0, lat0, lon1, lat1 = cell_bounds(cell)
    return (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (the H3 grid_disk
    analogue used for kNN ring expansion, SURVEY.md J11). Longitude wraps,
    latitude clamps at the poles."""
    res = int(cell_res(np.asarray([cell]))[0])
    n = 1 << res
    x, y = cell_to_xy(np.asarray([cell]))
    x, y = int(x[0]), int(y[0])
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = (x + dx.ravel()) % n
    ys = y + dy.ravel()
    keep = (ys >= 0) & (ys < n)
    return np.unique(xy_to_cell(xs[keep], ys[keep], res))


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Only the cells at exactly Chebyshev distance k (the k-th ring)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    disk = set(grid_disk(cell, k).tolist())
    inner = set(grid_disk(cell, k - 1).tolist())
    return np.asarray(sorted(disk - inner), dtype=np.int64)


def cell_size_deg(res: int) -> float:
    """Cell edge length in degrees (lat direction) at ``res``."""
    return 180.0 / (1 << res)


# ---------------------------------------------------------------------------
# S2-style cube-face cells.
# ---------------------------------------------------------------------------


def _latlon_to_face_uv(lon: np.ndarray, lat: np.ndarray):
    """Project to unit sphere, pick dominant axis -> cube face + (u, v)."""
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    x = np.cos(lat_r) * np.cos(lon_r)
    y = np.cos(lat_r) * np.sin(lon_r)
    z = np.sin(lat_r)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # major axis value per face
    major = np.choose(face, [x, y, z, -x, -y, -z])
    u_num = np.choose(face, [y, -x, -x, -z, -z, y])  # same axis pairing as S2
    v_num = np.choose(face, [z, z, y, y, x, x])
    u = u_num / major
    v = v_num / major
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection: makes cell areas near-uniform on the sphere."""
    u = np.asarray(u, dtype=np.float64)
    pos = np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, 0.5 * pos, 1.0 - 0.5 * neg)


def s2_encode(lon, lat, res: int = 16) -> np.ndarray:
    """S2-style cell id: face (3 bits) + Morton(si, ti) at ``res`` (<=26).

    Layout: bits 62..60 face, bits 59..56 unused-zero pad of res tag omitted
    (res is a call-site constant for this engine; one res per column)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    face, u, v = _latlon_to_face_uv(lon, lat)
    n = 1 << res
    si = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    ti = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    m = morton_encode(si.astype(np.uint64), ti.astype(np.uint64))
    return ((face.astype(np.uint64) << np.uint64(60)) | m).astype(np.int64)


# ---------------------------------------------------------------------------
# Spark Column / DuckDB SQL emitters for the same encoding (oracle parity).
# ---------------------------------------------------------------------------


def _spread_sql(expr: str) -> str:
    """DuckDB SQL text computing _spread_bits(expr) via the same magic masks."""
    out = f"(({expr}) & 4294967295)"
    masks = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    for shift, mask in masks:
        # masks fit in signed int64 except none here exceed 2^63-1
        out = f"(({out} | ({out} << {shift})) & {np.int64(np.uint64(mask))})"
    return out


def cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB SQL computing the exact same int64 cell id as cell_encode()."""
    n = 1 << res
    x = f"CAST(least(greatest(floor((({lon_expr}) + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"
    y = f"CAST(least(greatest(floor((({lat_expr}) + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT)"
    return f"(({_spread_sql(x)} | ({_spread_sql(y)} << 1)) | {res << _RES_SHIFT})"


def with_cell_columns(df, lon: str, lat: str, res_list, names=None, base_res: int = MAX_RES):
    """Attach one cell-id column per resolution with the heavy bit-spreading
    computed ONCE (at base_res) and every coarser cell derived by a single
    shift — the hierarchy is literal bit truncation (m_r = m_26 >> 2*(26-r)).

    Uses chained withColumn projections instead of one inline expression:
    Spark's Generate and interpreted fallbacks walk duplicated subtrees
    exponentially (measured 100x on the bench), while chained projections
    stay inside whole-stage codegen with linear code size.

    Returns (df, [colnames]). Temp columns are dropped.
    """
    from pyspark.sql import functions as F

    names = names or [f"h3_{r}" for r in res_list]
    n = 1 << base_res

    def clip(c, lo, hi):
        return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))

    df = df.withColumn(
        "_cx", clip(F.floor((F.col(lon) + 180.0) / 360.0 * n), 0, n - 1).cast("long")
    ).withColumn(
        "_cy", clip(F.floor((F.col(lat) + 90.0) / 180.0 * n), 0, n - 1).cast("long")
    )
    masks = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    df = df.withColumn("_cx", F.col("_cx").bitwiseAND(F.lit(4294967295)))
    df = df.withColumn("_cy", F.col("_cy").bitwiseAND(F.lit(4294967295)))
    for shift, mask in masks:
        m = int(np.int64(np.uint64(mask)))
        df = df.withColumn(
            "_cx", (F.col("_cx").bitwiseOR(F.shiftleft(F.col("_cx"), shift))).bitwiseAND(F.lit(m))
        ).withColumn(
            "_cy", (F.col("_cy").bitwiseOR(F.shiftleft(F.col("_cy"), shift))).bitwiseAND(F.lit(m))
        )
    df = df.withColumn("_m26", F.col("_cx").bitwiseOR(F.shiftleft(F.col("_cy"), 1)))
    for r, name in zip(res_list, names):
        df = df.withColumn(
            name,
            F.shiftrightunsigned(F.col("_m26"), 2 * (base_res - r)).bitwiseOR(
                F.lit(r << _RES_SHIFT)
            ),
        )
    return df.drop("_cx", "_cy", "_m26"), list(names)


def cell_parent_expr(cell_col, res: int, parent_res: int):
    """Spark Column computing cell_parent for cells KNOWN to be at ``res``
    (pure bit shifts, codegen-friendly — the Column twin of cell_parent
    for distributed coarse/fine probe filtering)."""
    from pyspark.sql import functions as F

    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    morton = cell_col.bitwiseAND(F.lit((1 << _RES_SHIFT) - 1))
    pm = F.shiftrightunsigned(morton, 2 * (res - parent_res))
    return pm.bitwiseOR(F.lit(parent_res << _RES_SHIFT))


def cell_expr(lon_col, lat_col, res: int):
    """Spark Column computing the same cell id with JVM-side built-ins only
    (whole-stage-codegen friendly; no Python in the hot path)."""
    from pyspark.sql import functions as F

    n = 1 << res

    def clip(c, lo, hi):
        return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))

    x = clip(F.floor((lon_col + 180.0) / 360.0 * n), 0, n - 1).cast("long")
    y = clip(F.floor((lat_col + 90.0) / 180.0 * n), 0, n - 1).cast("long")

    def spread(c):
        out = c.bitwiseAND(F.lit(4294967295))
        for shift, mask in [
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ]:
            out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(int(np.int64(np.uint64(mask)))))
        return out

    m = spread(x).bitwiseOR(F.shiftleft(spread(y), 1))
    return m.bitwiseOR(F.lit(res << _RES_SHIFT))
