"""Tiling stage (W2/W3/W4): H3X/S2X encode + k-ring as Arrow pandas UDFs.

Every point row gains ``h3_cell`` (res 7-11) and ``s2_cell`` columns via
vectorized numpy inside ``pandas_udf`` — the JVM<->Python boundary moves
whole Arrow batches, never rows. K-ring expansion is the candidate
generator for spatial joins: explode each point's ring so the join
becomes a plain equi-join on cell id (shuffle- or broadcast-friendly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import h3x, s2x


def h3_encode_udf(res: int):
    @pandas_udf("long")
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(h3x.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), res))

    return enc


def s2_encode_udf(level: int):
    @pandas_udf("long")
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2x.cell_id(lat.to_numpy(), lon.to_numpy(), level))

    return enc


def k_ring_udf(k: int):
    """cell -> array of ring cells (vectorized batch-wise)."""

    @pandas_udf("array<long>")
    def ring(cells: pd.Series) -> pd.Series:
        arr = cells.to_numpy(dtype=np.int64)
        if len(arr) == 0:
            return pd.Series([], dtype=object)
        idx, out = h3x.grid_disk_arrays(arr, k)
        result = [[] for _ in range(len(arr))]
        for i, c in zip(idx, out):
            result[i].append(int(c))
        return pd.Series(result)

    return ring


def covering_cells_udf(res: int, pad_m: float, ring: int):
    """(lat, lon) -> distinct cells whose union provably covers the
    ``pad_m`` disk around the point: multi-face encode (home face plus
    every face whose Voronoi region intersects the disk) then k-ring
    around each encoding. This is the candidate generator for
    within-distance joins that stays exact across icosahedron face
    boundaries and 3-face vertices."""

    @pandas_udf("array<long>")
    def cov(lat: pd.Series, lon: pd.Series) -> pd.Series:
        n = len(lat)
        if n == 0:
            return pd.Series([], dtype=object)
        pidx, cells = h3x.latlng_to_cells_multiface(
            lat.to_numpy(), lon.to_numpy(), res, pad_m
        )
        ridx, rcells = h3x.grid_disk_arrays(cells, ring)
        owner = pidx[ridx]
        order = np.argsort(owner, kind="stable")
        owner, rcells = owner[order], rcells[order]
        bounds = np.flatnonzero(np.diff(owner)) + 1
        result = [[] for _ in range(n)]
        for o, chunk in zip(
            owner[np.concatenate([[0], bounds])] if len(owner) else [],
            np.split(rcells, bounds),
        ):
            result[int(o)] = np.unique(chunk).tolist()
        return pd.Series(result)

    return cov


def polygon_cover_cells(
    ring_lat: np.ndarray,
    ring_lon: np.ndarray,
    res: int,
    max_cover_cells: int = 200_000,
) -> np.ndarray:
    """Distinct cells whose union provably covers the polygon's bbox
    (hence the polygon) at ``res``.

    Construction: sample the bbox on a grid dense enough that every
    bbox point lies within ``pad = ring_guaranteed_m(2, res)`` of a
    sample, then take each sample's multi-face encodings plus a 2-ring
    — the same primitive ``covering_cells_udf`` builds on, so the
    guarantee (any point q within pad of a sample has its home cell in
    the set, across icosahedron face boundaries) carries over. A point
    P in the bbox is within pad of its nearest sample, so
    ``latlng_to_cell(P) ∈ cover`` — the downstream cell equi-join can
    only over-select, never miss.

    ``max_cover_cells`` guards against a res too fine for the polygon's
    extent (cover size ~ bbox_area / cell_area): callers should coarsen
    ``res`` for continent-sized polygons rather than explode 10^7 cells.
    """
    lat_min, lat_max = float(ring_lat.min()), float(ring_lat.max())
    lon_min, lon_max = float(ring_lon.min()), float(ring_lon.max())
    pad_m = h3x.ring_guaranteed_m(2, res)
    # grid diagonal/2 = 0.9 * sqrt(2)/2 * pad ~= 0.64 pad < pad
    d_m = 0.9 * pad_m
    dlat = d_m / 111_320.0
    coslat = max(
        np.cos(np.radians(max(abs(lat_min), abs(lat_max)))), 0.01
    )
    dlon = d_m / (111_320.0 * coslat)
    n_lat = int((lat_max - lat_min) / dlat) + 2
    n_lon = int((lon_max - lon_min) / dlon) + 2
    if n_lat * n_lon > 4 * max_cover_cells:
        raise ValueError(
            f"polygon bbox needs ~{n_lat * n_lon} cover samples at res "
            f"{res} (> {4 * max_cover_cells}); use a coarser res for "
            "polygons of this extent"
        )
    lats = np.linspace(lat_min, lat_max, n_lat)
    lons = np.linspace(lon_min, lon_max, n_lon)
    glat = np.repeat(lats, n_lon)
    glon = np.tile(lons, n_lat)
    _, cells = h3x.latlng_to_cells_multiface(glat, glon, res, pad_m)
    _, rcells = h3x.grid_disk_arrays(np.unique(cells), 2)
    cover = np.unique(rcells)
    if len(cover) > max_cover_cells:
        raise ValueError(
            f"polygon cover has {len(cover)} cells at res {res} "
            f"(> {max_cover_cells}); use a coarser res"
        )
    return cover


def face_edge_m_udf():
    """(lat, lon) -> great-circle meters to the nearest face boundary
    (see h3x.face_edge_distance_m)."""

    @pandas_udf("double")
    def edge(lat: pd.Series, lon: pd.Series) -> pd.Series:
        if len(lat) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(
            h3x.face_edge_distance_m(lat.to_numpy(), lon.to_numpy())
        )

    return edge


def with_cells(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    h3_res: int = 9,
    s2_level: int = 16,
    h3_col: str = "h3_cell",
    s2_col: str = "s2_cell",
) -> DataFrame:
    """Add H3X + S2X cell columns to any point DataFrame."""
    return df.withColumn(
        h3_col, h3_encode_udf(h3_res)(F.col(lat_col), F.col(lon_col))
    ).withColumn(s2_col, s2_encode_udf(s2_level)(F.col(lat_col), F.col(lon_col)))


def tile_points(
    points: DataFrame,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    resolutions=(7, 8, 9, 10, 11),
    s2_level: int = 16,
) -> DataFrame:
    """Multi-resolution tiles table (FIXTURES.md §1): one row per
    (point, h3_res) with both cell systems. Built with a single stacked
    select per res + union — the encode UDFs run once per res over
    Arrow batches; no shuffle."""
    parts = []
    for res in resolutions:
        parts.append(
            points.select(
                F.col(id_col).alias("entity_id"),
                F.col(lat_col).alias("lat"),
                F.col(lon_col).alias("lon"),
                F.lit(res).cast("tinyint").alias("h3_res"),
                h3_encode_udf(res)(F.col(lat_col), F.col(lon_col)).alias("h3_cell"),
                s2_encode_udf(s2_level)(F.col(lat_col), F.col(lon_col)).alias(
                    "s2_cell"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
