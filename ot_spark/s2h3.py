"""Hierarchical cell indexes: S2 cell ids + an H3-style hex grid.

No s2sphere/h3 libraries exist in the target environment (SURVEY.md §7.0),
so both indexes are implemented from the published algorithms in pure
numpy, vectorized over Arrow batches:

- **S2** (exact, from the public s2geometry algorithm): lat/lon -> unit
  xyz -> cube face + (u,v) -> quadratic ST transform -> 30-bit (i,j) ->
  Hilbert-curve position via the standard 4-bit lookup tables (built with
  the published recursive construction) -> 64-bit cell id, truncatable to
  any level.  Level-L ids satisfy the s2 hierarchy contract
  (``parent = (leaf & ~(2*lsb-1)) | lsb``) and the face contract
  (``id >> 61 == face``).
- **H3-style hex grid** (*h3ish*: a simple axial approximation kept for
  its cheap closed-form SQL oracle).  The TRUE-GEOMETRY icosahedral
  aperture-7 grid lives in :mod:`ot_spark.h3x` (gnomonic faces, Class
  II/III lattices, 122 base cells / 12 pentagons, H3-layout ids) and is
  what the ``h3_tiles`` gate query uses; h3ish remains as a lightweight
  alternative binning, not the H3 claim.  The k-ring raster kNN moved to
  h3x in round 6 (h3x.knn_nearest_raster_h3x) — real H3 k-ring expansion,
  per the north_star.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ------------------------------------------------------------------ S2 core

_SWAP = 1
_INVERT = 2
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

_LOOKUP_POS = np.zeros(1 << 10, dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << 10, dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == 4:
        ij = (i << 4) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for index in range(4):
        ij = int(r[index])
        _init_lookup(
            level, i + (ij >> 1), j + (ij & 1), orig, pos + index,
            orient ^ int(_POS_TO_ORIENT[index]),
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)

_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL


def _lat_lon_to_xyz(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(lat)
    theta = np.radians(lon)
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


# per-face (u, v) numerator component index and sign; denominator is the
# major (face-axis) component — standard ValidFaceXYZtoUV table
_U_IDX = np.array([1, 0, 0, 2, 2, 1])
_U_SGN = np.array([1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_V_IDX = np.array([2, 2, 1, 1, 0, 0])
_V_SGN = np.array([1.0, 1.0, -1.0, 1.0, -1.0, -1.0])


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major0 = np.choose(face, [x, y, z])
    face = (face + np.where(major0 < 0, 3, 0)).astype(np.int64)
    stack = np.stack([x, y, z])
    n = np.arange(len(x))
    major = stack[face % 3, n]
    u = _U_SGN[face] * stack[_U_IDX[face], n] / major
    v = _V_SGN[face] * stack[_V_IDX[face], n] / major
    return face, u, v


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2's quadratic projection; clip the radicand per branch (np.where
    # evaluates both sides — unclipped this emits sqrt-of-negative warnings
    # and wastes a pass)
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, pos, neg)


def s2_leaf_ids(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Vectorized FromFaceIJ over the 8 4-bit chunks (lookup-table walk)."""
    x, y, z = _lat_lon_to_xyz(
        np.asarray(lat, dtype=np.float64), np.asarray(lon, dtype=np.float64)
    )
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    for k in range(7, -1, -1):
        mask = (1 << 4) - 1
        bits += ((i >> (k * 4)) & mask) << 6
        bits += ((j >> (k * 4)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits.astype(np.uint64) >> np.uint64(2)) << np.uint64(k * 8)
        bits &= _SWAP | _INVERT
    return (n * np.uint64(2) + np.uint64(1)).astype(np.int64)


def s2_parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Truncate leaf (or finer) ids to ``level`` (s2 lsb algebra)."""
    ids_u = np.asarray(ids).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((ids_u & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).astype(np.int64)


def s2_cell_ids(lat: np.ndarray, lon: np.ndarray, level: int = 10) -> np.ndarray:
    return s2_parent(s2_leaf_ids(lat, lon), level)


def s2_level_of(cell_id: int) -> int:
    u = np.array(cell_id, dtype=np.int64).astype(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return _MAX_LEVEL - (int(lsb).bit_length() - 1) // 2


def with_s2_cell(
    df: DataFrame, level: int = 10, lat_col: str = "lat", lon_col: str = "lon",
    out_col: str | None = None,
) -> DataFrame:
    out_col = out_col or f"s2_{level}"

    @F.pandas_udf(LongType())
    def enc(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for lat_s, lon_s in it:
            lat_np = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lon_np = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~(np.isnan(lat_np) | np.isnan(lon_np))
            out = np.zeros(len(lat_np), dtype=np.int64)
            if ok.any():
                out[ok] = s2_cell_ids(lat_np[ok], lon_np[ok], level)
            # nullable Int64: float64 would corrupt ids beyond 2^53
            ser = pd.Series(out, dtype="Int64")
            ser[~ok] = pd.NA
            yield ser

    return df.withColumn(out_col, enc(F.col(lat_col), F.col(lon_col)).cast("long"))


# -------------------------------------------------------------- h3ish hexes

H3ISH_BASE_SIZE = 2.0  # degrees at res 0
_APERTURE = np.sqrt(7.0)


def h3ish_size(res: int) -> float:
    return H3ISH_BASE_SIZE / (_APERTURE ** res)


def _axial_from_xy(x: np.ndarray, y: np.ndarray, size: float):
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    return _cube_round(q, r)


def _cube_round(q: np.ndarray, r: np.ndarray):
    cx, cz = q, r
    cy = -cx - cz
    rx, ry, rz = np.round(cx), np.round(cy), np.round(cz)
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _hex_center_xy(q: np.ndarray, r: np.ndarray, size: float):
    x = size * np.sqrt(3.0) * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


_BIAS = 1 << 27
_MASK = (1 << 28) - 1


def h3ish_encode(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(56))
        | ((q + _BIAS).astype(np.int64) << np.int64(28))
        | (r + _BIAS).astype(np.int64)
    )


def h3ish_decode(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = np.asarray(ids, dtype=np.int64)
    res = ids >> 56
    q = ((ids >> 28) & _MASK) - _BIAS
    r = (ids & _MASK) - _BIAS
    return res, q, r


def h3ish_cell_ids(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Equirectangular x=lon, y=lat (degrees) — a deterministic hex tiling,
    not equal-area near poles (documented h3ish approximation)."""
    q, r = _axial_from_xy(
        np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64),
        h3ish_size(res),
    )
    return h3ish_encode(q, r, res)


def h3ish_parent(ids: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent = hex at parent_res containing this cell's center (H3's own
    center-containment hierarchy)."""
    res, q, r = h3ish_decode(ids)
    size = h3ish_size(int(res[0])) if len(np.atleast_1d(res)) else 1.0
    x, y = _hex_center_xy(q, r, size)
    pq, pr = _axial_from_xy(x, y, h3ish_size(parent_res))
    return h3ish_encode(pq, pr, parent_res)


def with_h3ish_cells(
    df: DataFrame, resolutions: tuple[int, ...] = (7, 9),
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """All resolutions in ONE struct-returning Arrow UDF — one UDF per
    resolution would cost one ArrowEvalPython node (with its own Python
    worker pool) each.  The UDF is marked nondeterministic so column
    pruning cannot clone it per extracted field (measured: 2x
    ArrowEvalPython on a pruned groupBy otherwise)."""
    from pyspark.sql.types import StructField, StructType

    fields = [StructField(f"h3_{r}", LongType()) for r in resolutions]
    schema = StructType(fields)

    @F.pandas_udf(schema)
    def enc(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for lat_s, lon_s in it:
            lat_np = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lon_np = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~(np.isnan(lat_np) | np.isnan(lon_np))
            cols = {}
            for r in resolutions:
                h = np.zeros(len(lat_np), dtype=np.int64)
                if ok.any():
                    h[ok] = h3ish_cell_ids(lat_np[ok], lon_np[ok], r)
                hs = pd.Series(h, dtype="Int64")
                hs[~ok] = pd.NA
                cols[f"h3_{r}"] = hs
            yield pd.DataFrame(cols)

    enc = enc.asNondeterministic()
    tmp = df.withColumn("__h3", enc(F.col(lat_col), F.col(lon_col)))
    for f_ in fields:
        tmp = tmp.withColumn(f_.name, F.col(f"__h3.{f_.name}"))
    return tmp.drop("__h3")


def with_tiles(
    df: DataFrame,
    s2_level: int = 10,
    h3_resolutions: tuple[int, ...] = (7, 9),
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """FUSED tile encoder: s2 + all H3 resolutions in ONE pandas UDF
    (round 6: h3 columns are TRUE-GEOMETRY h3x ids — finest res encoded
    once, coarser by parent bit-truncation — matching enrich_fused).

    Each distinct pandas UDF in a projection becomes its own
    ArrowEvalPython node with its own per-core Python worker pool — at 32
    cores, three chained tile UDFs oversubscribe the host 3x and anti-scale.
    One struct-returning UDF keeps it to a single worker pool and one
    Arrow round-trip for all tile columns."""
    from pyspark.sql.types import StructField, StructType

    finest = max(h3_resolutions)
    fields = [StructField(f"s2_{s2_level}", LongType()),
              StructField(f"h3_{finest}", LongType())]
    schema = StructType(fields)

    @F.pandas_udf(schema)
    def enc(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for lat_s, lon_s in it:
            lat_np = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lon_np = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~(np.isnan(lat_np) | np.isnan(lon_np))
            cols = {}
            s2 = np.zeros(len(lat_np), dtype=np.int64)
            if ok.any():
                s2[ok] = s2_cell_ids(lat_np[ok], lon_np[ok], s2_level)
            ser = pd.Series(s2, dtype="Int64")
            ser[~ok] = pd.NA
            cols[f"s2_{s2_level}"] = ser
            from .h3x import h3x_cell_ids

            hf = np.zeros(len(lat_np), dtype=np.int64)
            if ok.any():
                hf[ok] = h3x_cell_ids(lat_np[ok], lon_np[ok], finest)
            hs = pd.Series(hf, dtype="Int64")
            hs[~ok] = pd.NA
            cols[f"h3_{finest}"] = hs
            yield pd.DataFrame(cols)

    # nondeterministic marker: stops column pruning from cloning the UDF
    # once per extracted struct field
    enc = enc.asNondeterministic()
    tmp = df.withColumn("__tiles", enc(F.col(lat_col), F.col(lon_col)))
    for f_ in fields:
        tmp = tmp.withColumn(f_.name, F.col(f"__tiles.{f_.name}"))
    from .h3x import h3x_parent_col

    for r in sorted(h3_resolutions):
        if r != finest:
            tmp = tmp.withColumn(
                f"h3_{r}", h3x_parent_col(F.col(f"h3_{finest}"), r)
            )
    return tmp.drop("__tiles")
