"""H3-layout hierarchical hexagonal index, from scratch, numpy-vectorized (W2).

Same design space as H3 (icosahedral gnomonic projection, aperture-7
hex hierarchy, 3-bit digits per resolution, base cells + digit path in
a 64-bit id) built independently on an algebraic foundation: hex
lattice points are Eisenstein integers a+b*omega (omega = e^{2*pi*i/3}),
and aperture-7 subdivision is multiplication by (3+omega), whose norm
is 7. Digit extraction is exact integer arithmetic: the digit set
{0, +-1, +-omega, +-(1+omega)} is a complete residue system mod
(3+omega), and division is multiplication by the conjugate (2-omega)
followed by exact /7.

Documented divergences from Uber's H3 (which cannot be calibrated
against in this sandbox — no h3 wheel resolves; see ``h3compat`` for
the round-5 compatibility adapter: exact H3 bit layout + the full
published encode algorithm with the base-cell constant TABLES as
pluggable user-supplied data, since the 122-cell numbering is an
enumeration choice, not derivable from the spec):
* base-cell numbering is (face, local axial coord) rather than H3's
  122-cell table; ids are NOT bit-identical to h3's;
* no pentagon special-casing: each point is assigned the face whose
  center is nearest (a deterministic Voronoi partition, dual
  dodecahedron), so cells near face boundaries overlap slightly
  between faces instead of distorting into pentagons. k_ring stays
  within one face — a ring NEVER covers cells across a face boundary
  by itself. Cross-face correctness is the caller's contract, built
  from two primitives here: ``face_edge_distance_m`` (a ring disk is
  provably complete only within min(ring_guaranteed_m, edge distance);
  queries closer to a face edge must escalate to an exact pass) and
  ``latlng_to_cells_multiface`` (encode near-edge points on every face
  whose region intersects the search radius, so radius joins stay
  equi-joins). The spatial operators use both.

Cell id layout (63 usable bits, always positive):
  [4 bits mode=2][4 bits res 0-15][10 bits base = face*49+(a0+3)*7+(b0+3)]
  [45 bits: 15 digit slots of 3 bits, slot i = res i, unused = 7]

UPGRADE SEAM (real Uber H3 ids): every consumer reaches this module
through exactly five functions — ``latlng_to_cell``,
``grid_disk_arrays``, ``cell_to_latlng``, ``cell_to_parent``,
``cell_resolution`` — plus the two cross-face primitives above and the
three metric helpers (``cell_pitch_m``, ``ring_for_radius``,
``ring_guaranteed_m``). On a deployment where the ``h3`` wheel
resolves, an adapter module implementing those signatures over
``h3.latlng_to_cell``/``h3.grid_disk``/``h3.cell_to_latlng`` (with
``face_edge_distance_m -> 0``-returning stub and multiface == plain
encode, since real H3 rings DO cross icosa edges and pentagons) drops
in without touching any operator: the operators only ever treat ids
as opaque join keys and rely on the metric helpers for completeness
bounds. Stored ids are engine-internal either way (documented in
README); mixed-id datasets are not supported.

Resolution scale is calibrated to H3: ~122 base-cell-sized hexes cover
the sphere at res 0, cell area shrinks by 7x per res (res 9 ~ 0.1 km^2).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
_MODE = 2

# --- icosahedron geometry -------------------------------------------------------

_TOP_LAT = np.degrees(np.arctan(0.5))  # 26.565...


def _build_faces():
    v = np.zeros((12, 3))
    v[0] = (0.0, 0.0, 1.0)
    v[11] = (0.0, 0.0, -1.0)
    upper = np.radians(np.arange(5) * 72.0)
    lower = np.radians(np.arange(5) * 72.0 + 36.0)
    toplat = np.radians(_TOP_LAT)
    for i in range(5):
        v[1 + i] = (
            np.cos(toplat) * np.cos(upper[i]),
            np.cos(toplat) * np.sin(upper[i]),
            np.sin(toplat),
        )
        v[6 + i] = (
            np.cos(toplat) * np.cos(lower[i]),
            np.cos(toplat) * np.sin(lower[i]),
            -np.sin(toplat),
        )
    faces = []
    for i in range(5):
        j = (i + 1) % 5
        faces.append((0, 1 + i, 1 + j))  # polar cap north
        faces.append((1 + i, 6 + i, 1 + j))  # upper middle
        faces.append((1 + j, 6 + i, 6 + j))  # lower middle
        faces.append((11, 6 + i, 6 + j))  # polar cap south
    centers = np.array([v[a] + v[b] + v[c] for a, b, c in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # tangent-plane basis per face (no face center is at a pole)
    k = np.array([0.0, 0.0, 1.0])
    east = np.cross(np.broadcast_to(k, centers.shape), centers)
    east /= np.linalg.norm(east, axis=1, keepdims=True)
    north = np.cross(centers, east)
    return centers, east, north


_CENTERS, _EAST, _NORTH = _build_faces()
N_FACES = 20

# res-0 lattice spacing in gnomonic units: hex area (sqrt(3)/2)*a^2
# ~= 4*pi/122 steradians -> ~6.1 base hexes per face, H3-like sizing
BASE_SCALE = float(np.sqrt((4.0 * np.pi / 122.0) / (np.sqrt(3.0) / 2.0)))

# --- Eisenstein arithmetic -------------------------------------------------------

_OMEGA = complex(-0.5, np.sqrt(3.0) / 2.0)
_APERTURE = 3.0 + _OMEGA  # |.|^2 = 7, arg ~ 19.107 deg

# digits 0..6: 0 plus the 6 units
_DIGITS = np.array(
    [(0, 0), (1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1)], dtype=np.int64
)

# residue lookup: key = ((2a+b) mod 7, (3b-a) mod 7) for c = a+b*omega,
# i.e. coordinates of c*(2-omega) mod 7
_RESIDUE = np.full((7, 7), -1, dtype=np.int64)
for _idx, (_a, _b) in enumerate(_DIGITS):
    _RESIDUE[(2 * _a + _b) % 7, (3 * _b - _a) % 7] = _idx
assert (_RESIDUE >= 0).sum() == 7


def _hex_round(af, bf):
    """Nearest Eisenstein integer via cube rounding (basis 1, omega)."""
    # cube coords: x=a, z=b, y=-(a-b)?? -> use x=a, y=b, dist=max(|a|,|b|,|a-b|)
    # rounding: round a,b and the difference consistently
    cf = af - bf
    a = np.rint(af)
    b = np.rint(bf)
    c = np.rint(cf)
    da = np.abs(a - af)
    db = np.abs(b - bf)
    dc = np.abs(c - cf)
    # fix the coordinate with the largest rounding error so a - b == c
    fix_a = (da >= db) & (da >= dc)
    fix_b = ~fix_a & (db >= dc)
    a = np.where(fix_a, b + c, a)
    b = np.where(~fix_a & fix_b, a - c, b)
    return a.astype(np.int64), b.astype(np.int64)


def _digit_extract(a, b, res):
    """Exact base-(3+omega) expansion: returns (a0, b0, digits[res..1])."""
    digits = np.zeros((res, len(a)), dtype=np.int64)
    for step in range(res - 1, -1, -1):
        key_x = (2 * a + b) % 7
        key_y = (3 * b - a) % 7
        d = _RESIDUE[key_x, key_y]
        digits[step] = d
        da = _DIGITS[d, 0]
        db = _DIGITS[d, 1]
        ra, rb = a - da, b - db
        # (ra + rb*omega) * (2 - omega) / 7, exact
        a = (2 * ra + rb) // 7
        b = (3 * rb - ra) // 7
    return a, b, digits


def _digit_rebuild(a0, b0, digits):
    """Inverse of _digit_extract:
    (a+bw)(3+w) = 3a + aw + 3bw + bw^2 = (3a-b) + (a+2b)w, then add digit."""
    a, b = a0.copy(), b0.copy()
    for step in range(digits.shape[0]):
        a, b = (
            3 * a - b + _DIGITS[digits[step], 0],
            a + 2 * b + _DIGITS[digits[step], 1],
        )
    return a, b


# --- encode / decode -------------------------------------------------------------


def _project(lat_deg, lon_deg):
    """-> (face, complex gnomonic coords on that face)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    coslat = np.cos(lat)
    p = np.stack([coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)], axis=-1)
    face = np.argmax(p @ _CENTERS.T, axis=-1)
    n = _CENTERS[face]
    scale = 1.0 / np.einsum("ij,ij->i", p, n)
    q = p * scale[:, None]
    x = np.einsum("ij,ij->i", q, _EAST[face])
    y = np.einsum("ij,ij->i", q, _NORTH[face])
    return face, x + 1j * y


def _unproject(face, z):
    p = (
        _CENTERS[face]
        + np.real(z)[:, None] * _EAST[face]
        + np.imag(z)[:, None] * _NORTH[face]
    )
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1.0, 1.0)))
    lon = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    return lat, lon


def _pack(face, a0, b0, res, digits):
    base = face * 49 + (a0 + 3) * 7 + (b0 + 3)
    out = (np.int64(_MODE) << 59) | (np.int64(res) << 55) | (base.astype(np.int64) << 45)
    path = np.zeros_like(out)
    for slot in range(MAX_RES):
        d = digits[slot] if slot < res else np.full_like(out, 7)
        path |= d.astype(np.int64) << (3 * (MAX_RES - 1 - slot))
    return out | path


def _unpack(ids):
    ids = np.asarray(ids, dtype=np.int64)
    res = ((ids >> 55) & 0xF).astype(np.int64)
    base = (ids >> 45) & 0x3FF
    face = base // 49
    rem = base % 49
    a0 = rem // 7 - 3
    b0 = rem % 7 - 3
    digits = np.stack(
        [(ids >> (3 * (MAX_RES - 1 - s))) & 7 for s in range(MAX_RES)]
    )
    return face, a0, b0, res, digits


def cell_pitch_m(res: int) -> float:
    """Approximate center-to-center distance of adjacent cells at
    ``res`` in meters (gnomonic units ~ radians near face centers)."""
    return BASE_SCALE * 6_371_000.0 / (7.0 ** (res / 2.0))


def ring_guaranteed_m(ring: int, res: int) -> float:
    """Radius within which a k-ring candidate set is provably complete:
    any point within this distance of a query (anywhere in the center
    cell) falls in a ring cell. Inverse of :func:`ring_for_radius`'s
    margin (conservative)."""
    return max(ring - 0.5, 0.0) * cell_pitch_m(res) / 1.3


def ring_for_radius(radius_m: float, res: int) -> int:
    """Smallest k such that a k-ring at ``res`` is guaranteed to contain
    every cell within ``radius_m`` of a point anywhere in the center
    cell; 1.3x margin absorbs gnomonic distortion toward face edges."""
    import math

    return int(math.ceil(1.3 * radius_m / cell_pitch_m(res))) + 1


def _encode_on_face(face, z, res: int):
    """Lattice-encode gnomonic coords ``z`` already projected onto
    ``face`` (shared by the home-face and multi-face encoders)."""
    c = z * (_APERTURE**res) / BASE_SCALE
    bf = np.imag(c) / (np.sqrt(3.0) / 2.0)
    af = np.real(c) + bf / 2.0
    a, b = _hex_round(af, bf)
    a0, b0, digits = _digit_extract(a, b, res)
    # clamp base coords (points at most ~2 lattice units from center)
    a0 = np.clip(a0, -3, 3)
    b0 = np.clip(b0, -3, 3)
    return _pack(face, a0, b0, res, digits)


def latlng_to_cell(lat_deg, lon_deg, res: int):
    """Encode points to hex cell ids at resolution ``res`` (0-15)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be in [0, 15]")
    lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
    face, z = _project(lat, lon)
    return _encode_on_face(face, z, res)


# --- face-boundary machinery ------------------------------------------------------
# Face assignment is a spherical Voronoi partition of the 20 face
# centers; the boundary between faces i and j is the great circle with
# pole n_ij = (c_i - c_j)/|c_i - c_j|. Distance from a point on face i
# to that boundary is arcsin(p . n_ij) (>= 0 on face i's side).

_EARTH_R_M = 6_371_000.0


def _unit_vectors(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    coslat = np.cos(lat)
    return np.stack(
        [coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)], axis=-1
    )


def _boundary_normals():
    diff = _CENTERS[:, None, :] - _CENTERS[None, :, :]  # (20,20,3)
    norm = np.linalg.norm(diff, axis=-1)
    np.fill_diagonal(norm, 1.0)  # self pair never used
    return diff / norm[:, :, None]


_BOUNDARY_N = _boundary_normals()


def face_edge_distance_m(lat_deg, lon_deg):
    """Great-circle meters from each point to the nearest boundary of
    its face's Voronoi region. A k-ring candidate disk is provably
    complete only within min(ring_guaranteed_m, this): rings never
    cross faces, so a smaller value forces the caller's exact/escalate
    path (the round-1 cross-face blind spot)."""
    p = _unit_vectors(np.atleast_1d(lat_deg), np.atleast_1d(lon_deg))
    face = np.argmax(p @ _CENTERS.T, axis=-1)
    # signed distances to all 19 boundaries of the home face
    d = np.einsum("nd,njd->nj", p, _BOUNDARY_N[face])  # (n, 20)
    d[np.arange(len(face)), face] = np.inf  # mask self
    return np.arcsin(np.clip(d.min(axis=1), -1.0, 1.0)) * _EARTH_R_M


def latlng_to_cells_multiface(lat_deg, lon_deg, res: int, pad_m: float):
    """Encode each point on its home face AND on every neighboring face
    whose Voronoi region lies within ``pad_m`` — so a k-ring around the
    returned cells covers the full ``pad_m`` disk even across face
    boundaries (incl. 3-face icosahedron vertices). Returns
    (point_idx, cell_id) arrays; most points contribute one cell."""
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be in [0, 15]")
    lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
    p = _unit_vectors(lat, lon)
    face = np.argmax(p @ _CENTERS.T, axis=-1)
    d = np.einsum("nd,njd->nj", p, _BOUNDARY_N[face]) * _EARTH_R_M  # (n,20)
    d[np.arange(len(face)), face] = 0.0  # home face always included
    idx, faces = np.nonzero(d < pad_m)
    pf = p[idx]
    cf = _CENTERS[faces]
    scale = 1.0 / np.einsum("ij,ij->i", pf, cf)
    q = pf * scale[:, None]
    z = np.einsum("ij,ij->i", q, _EAST[faces]) + 1j * np.einsum(
        "ij,ij->i", q, _NORTH[faces]
    )
    return idx, _encode_on_face(faces, z, res)


def cell_to_latlng(ids):
    """Decode cell ids to their center lat/lon (degrees)."""
    face, a0, b0, res, digits = _unpack(ids)
    n = len(np.atleast_1d(face))
    # rebuild axial coords per distinct res (vectorized per group)
    a = np.zeros(n, dtype=np.int64)
    b = np.zeros(n, dtype=np.int64)
    out_lat = np.zeros(n)
    out_lon = np.zeros(n)
    for r in np.unique(res):
        m = res == r
        aa, bb = a0[m], b0[m]
        for step in range(int(r)):
            d = digits[step][m]
            na = 3 * aa - bb + _DIGITS[d, 0]
            nb = aa + 2 * bb + _DIGITS[d, 1]
            aa, bb = na, nb
        c = (aa + bb * _OMEGA) * BASE_SCALE / (_APERTURE ** int(r))
        la, lo = _unproject(face[m], c)
        out_lat[m] = la
        out_lon[m] = lo
    return out_lat, out_lon


def cell_resolution(ids):
    return ((np.asarray(ids, dtype=np.int64) >> 55) & 0xF).astype(np.int64)


def cell_to_parent(ids, parent_res: int):
    """Digit truncation — hierarchy containment exact by construction."""
    face, a0, b0, res, digits = _unpack(ids)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    return _pack(face, a0, b0, parent_res, digits)


def k_ring(cell_id: int, k: int):
    """All cells within hex-grid distance k of ``cell_id`` (same face).

    Purely lattice arithmetic: offsets {(da,db): max(|da|,|db|,|da-db|)
    <= k} added to the cell's axial coords, re-encoded exactly.
    """
    ids = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    face, a0, b0, res, digits = _unpack(ids)
    r = int(res[0])
    aa, bb = a0.copy(), b0.copy()
    for step in range(r):
        d = digits[step]
        aa, bb = 3 * aa - bb + _DIGITS[d, 0], aa + 2 * bb + _DIGITS[d, 1]
    offsets = [
        (da, db)
        for da in range(-k, k + 1)
        for db in range(-k, k + 1)
        if max(abs(da), abs(db), abs(da - db)) <= k
    ]
    out = []
    for da, db in offsets:
        na, nb = aa + da, bb + db
        na0, nb0, nd = _digit_extract(na, nb, r)
        if np.any(np.abs(na0) > 3) or np.any(np.abs(nb0) > 3):
            continue  # spilled off the face's base grid (face edge)
        out.append(_pack(face, na0, nb0, r, nd))
    return np.concatenate(out) if out else np.array([], dtype=np.int64)


def grid_disk_arrays(ids, k: int):
    """Vectorized k-ring for an array of cells: returns (orig_idx, ring
    cell ids) arrays — the candidate-generation explode for W4/W5/W7."""
    ids = np.asarray(ids, dtype=np.int64)
    face, a0, b0, res, digits = _unpack(ids)
    r = int(res[0]) if len(res) else 0
    aa, bb = a0.copy(), b0.copy()
    for step in range(r):
        d = digits[step]
        aa, bb = 3 * aa - bb + _DIGITS[d, 0], aa + 2 * bb + _DIGITS[d, 1]
    offsets = np.array(
        [
            (da, db)
            for da in range(-k, k + 1)
            for db in range(-k, k + 1)
            if max(abs(da), abs(db), abs(da - db)) <= k
        ],
        dtype=np.int64,
    )
    n, m = len(ids), len(offsets)
    na = (aa[:, None] + offsets[None, :, 0]).ravel()
    nb = (bb[:, None] + offsets[None, :, 1]).ravel()
    na0, nb0, nd = _digit_extract(na, nb, r)
    faces = np.repeat(face, m)
    idx = np.repeat(np.arange(n), m)
    ok = (np.abs(na0) <= 3) & (np.abs(nb0) <= 3)
    return idx[ok], _pack(faces[ok], na0[ok], nb0[ok], r, nd[:, ok])
