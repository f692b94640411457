"""S2-style spherical cell index, from scratch, vectorized in numpy (W3).

Standard S2 construction (public algorithm): unit sphere -> cube face
(6 faces) -> quadratic ST->UV area-equalizing transform -> 30-bit (i,j)
leaf coordinates -> Hilbert-curve position -> 64-bit cell id with the
trailing-1 level marker: ``[3 face bits][2*level pos bits][1][0...]``.
Implemented independently from the published design; the sandbox has no
s2 library to calibrate bit-exactness against, so correctness is
established by structural property tests (exact hierarchy containment
by prefix, round-trip decode, Hilbert locality).

All paths are numpy-vectorized (no per-row Python) so they run inside
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell orderings: _POS_TO_IJ[orient][pos] = ij (i*2+j);
# _POS_TO_ORIENT[pos] is XORed into the running orientation.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)

_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _r in range(4):
    for _pos in range(4):
        _IJ_TO_POS[_r, _POS_TO_IJ[_r, _pos]] = _pos


# --- sphere <-> cube ------------------------------------------------------------


def latlng_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    coslat = np.cos(lat)
    return np.stack([coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)], axis=-1)


def xyz_to_face_uv(xyz):
    """face 0..5 = (+x,+y,+z,-x,-y,-z), (u,v) in [-1,1]."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face, u, v


def face_uv_to_xyz(face, u, v):
    """Inverse of :func:`xyz_to_face_uv` (unnormalized)."""
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [one, -u, -u, -one, v, v],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, one, -v, -v, -one, u],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [v, v, one, -u, -u, -one],
    )
    return x, y, z


def _uv_to_st(u):
    with np.errstate(invalid="ignore"):  # the unselected branch may sqrt(<0)
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_uv(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s):
    ij = np.floor(s * (1 << MAX_LEVEL)).astype(np.int64)
    return np.clip(ij, 0, (1 << MAX_LEVEL) - 1)


# --- Hilbert curve ---------------------------------------------------------------


def _ij_to_pos(face, i, j):
    pos = np.zeros_like(i)
    orient = face & _SWAP
    for level in range(MAX_LEVEL - 1, -1, -1):
        ij2 = (((i >> level) & 1) << 1) | ((j >> level) & 1)
        p = _IJ_TO_POS[orient, ij2]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _pos_to_ij(face, pos):
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    orient = face & _SWAP
    for level in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> (2 * level)) & 3
        ij2 = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


# --- cell ids --------------------------------------------------------------------


def cell_id(lat_deg, lon_deg, level: int = 30):
    """Encode points to cell ids at ``level`` (vectorized)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be in [0, 30]")
    face, u, v = xyz_to_face_uv(latlng_to_xyz(lat_deg, lon_deg))
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _ij_to_pos(face, i, j)
    shift = 2 * (MAX_LEVEL - level)
    return ((face << 61) | ((pos >> shift) << (shift + 1)) | (1 << shift)).astype(
        np.int64
    )


def _decompose(ids):
    """-> (face, pos60 with truncated bits zeroed, lsb)."""
    ids = np.asarray(ids, dtype=np.int64)
    face = (ids >> 61) & 7
    lsb = ids & (-ids)
    pos60 = ((ids - lsb) >> 1) & ((1 << 60) - 1)
    return face, pos60, lsb


def cell_level(ids):
    _, _, lsb = _decompose(ids)
    # lsb = 2^(2*(30-level)); log2 of an exact power of two is exact in f64
    log2 = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return (MAX_LEVEL - (log2 >> 1)).astype(np.int64)


def parent(ids, level: int):
    """Containment is exact by construction (pos-prefix truncation)."""
    face, pos60, _ = _decompose(ids)
    shift = 2 * (MAX_LEVEL - level)
    return ((face << 61) | ((pos60 >> shift) << (shift + 1)) | (1 << shift)).astype(
        np.int64
    )


def contains(parent_ids, child_ids):
    """Range test: child in [parent - lsb + 1, parent + lsb - 1]."""
    parent_ids = np.asarray(parent_ids, dtype=np.int64)
    child_ids = np.asarray(child_ids, dtype=np.int64)
    lsb = parent_ids & (-parent_ids)
    return (child_ids >= parent_ids - lsb + 1) & (child_ids <= parent_ids + lsb - 1)


def cell_to_latlng(ids):
    """Decode cell ids to center lat/lon degrees. The cell's leaves form
    an axis-aligned quadtree block in (i,j); mask any member leaf to the
    block base and take the block center."""
    face, pos60, lsb = _decompose(ids)
    i, j = _pos_to_ij(face, pos60)
    # block size in leaf units: lsb = 2^(2*(30-level)) -> size = sqrt(lsb)
    size = np.int64(1) << (MAX_LEVEL - cell_level(ids))
    i = (i & ~(size - 1)) + (size >> 1)
    j = (j & ~(size - 1)) + (size >> 1)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    x, y, z = face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon
