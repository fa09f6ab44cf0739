"""hex7 — an H3-STYLE aperture-7 hexagonal hierarchical index on the
icosahedron, derived from first principles (engine-level cross-index,
SURVEY.md section 7.5; the reference has no hexagonal index either —
its wrapper API only mimics H3's *shape*, CHANGES.rst 0.5.5).

NOT bit-compatible with Uber H3: H3's 122-base-cell and per-face
orientation tables are not reproducible offline, so hex7 replaces them
with a self-contained construction sharing H3's algorithmic skeleton:

  1. gnomonic projection of the unit-sphere point onto the nearest of
     the 20 icosahedron faces (argmax of face-center dot products);
  2. continuous hex-lattice coordinates on the face's tangent plane;
  3. aperture-7 hierarchy via generalized balanced ternary (GBT):
     resolution-r lattice = Z[w] / u^r for the Eisenstein integer
     u = 3 + w (norm 7, w = exp(2*pi*i/3)); a cell's digit string is
     the base-u expansion with digit set {0, the six units}, which is
     a complete residue system mod u — so parent = drop finest digit
     is EXACT in lattice space (unlike H3's approximate containment).

Cell id packs into int64: [4b res][5b face][4b+4b res-0 hex][15 x 3b
digits, coarsest first, unused slots = 7]. Parent/resolution/base-hex
are therefore pure bitwise column ops on the Spark side.

Known limitation (documented, mirrors the reference's own
documented-incomplete multi-face rings, rhp_wrappers.py:37): cells are
face-local — hexes straddling an icosahedron edge are split per face,
and k_ring does not wrap across faces.
"""

from __future__ import annotations

import numpy as np

SQRT3 = float(np.sqrt(3.0))
OMEGA = complex(-0.5, SQRT3 / 2)  # w = exp(2*pi*i/3)
U_C = 3.0 + OMEGA  # aperture-7 base as a complex number, |u|^2 = 7
S0 = 0.35  # res-0 hex lattice spacing in gnomonic tangent units

# GBT digit set: 0 and the six units of Z[w], as (a, b) with z = a + b*w.
DIGITS = np.array(
    [(0, 0), (1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1)],
    dtype=np.int64,
)

MAX_RES = 15
# Layout (62 bits used): [61..58 res][57..53 face][52..49 z0a+8]
# [48..45 z0b+8][44..0 digits: level k (1-indexed, coarsest first) at
# shift 3*(MAX_RES-k), i.e. level 1 at bits 44..42, level 15 at 2..0].
_RES_SHIFT = 58
_FACE_SHIFT = 53
_Z0A_SHIFT = 49
_Z0B_SHIFT = 45
_DIG_SHIFT = lambda k: 3 * (MAX_RES - k)  # noqa: E731  (level k digit)


def _icosahedron():
    """Vertices, faces, per-face orthonormal tangent bases — computed,
    not tabulated, so the construction is reproducible from the code
    alone. Deterministic ordering: lexicographic."""
    phi = (1 + np.sqrt(5.0)) / 2
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    v = np.array(sorted(verts))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # Faces: vertex triples at minimal pairwise distance (edges).
    d = np.linalg.norm(v[:, None, :] - v[None, :, :], axis=2)
    edge = d[d > 1e-9].min()
    adj = (np.abs(d - edge) < 1e-9)
    faces = []
    n_v = len(v)
    for i in range(n_v):
        for j in range(i + 1, n_v):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n_v):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces = np.array(sorted(faces))
    assert faces.shape == (20, 3)
    centers = v[faces].mean(axis=1)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    e1 = v[faces[:, 0]] - (v[faces[:, 0]] * centers).sum(1, keepdims=True) * centers
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(centers, e1)
    return v, faces, centers, e1, e2


VERTS, FACES, FACE_N, FACE_E1, FACE_E2 = _icosahedron()


def _unit_vectors(lon_deg, lat_deg):
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)], axis=1)


def _hex_round(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest Eisenstein lattice point to complex w (cube rounding)."""
    b = 2.0 * w.imag / SQRT3
    a = w.real + b / 2
    # axial -> cube
    x, z = a, b
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _peel_digits(za, zb, res):
    """Extract `res` GBT digits (finest first), returning (digits
    [n, res], z0a, z0b). Exact integer arithmetic; each step divides
    by u via w*conj(u)/7 with conj(u) = 2 - w."""
    n = za.shape[0]
    digs = np.zeros((n, res), dtype=np.int64)
    for k in range(res):
        nxa, nxb = np.zeros_like(za), np.zeros_like(zb)
        dig = np.zeros(n, dtype=np.int64)
        found = np.zeros(n, dtype=bool)
        for idx in range(7):
            da, db = DIGITS[idx]
            wa, wb = za - da, zb - db
            qa, qb = 2 * wa + wb, 3 * wb - wa  # w * conj(u)
            ok = (~found) & (qa % 7 == 0) & (qb % 7 == 0)
            dig = np.where(ok, idx, dig)
            nxa = np.where(ok, qa // 7, nxa)
            nxb = np.where(ok, qb // 7, nxb)
            found |= ok
        assert found.all(), "GBT digit set must be a complete residue system"
        digs[:, k] = dig
        za, zb = nxa, nxb
    return digs, za, zb


def _build_z(z0a, z0b, digs):
    """Inverse of _peel_digits: z = (((z0*u + d_1)*u + d_2)...)."""
    za, zb = z0a.copy(), z0b.copy()
    res = digs.shape[1]
    for k in range(res - 1, -1, -1):  # coarsest applied first
        za, zb = 3 * za - zb, za + 2 * zb  # z * u, u = 3 + w
        da, db = DIGITS[digs[:, k], 0], DIGITS[digs[:, k], 1]
        za, zb = za + da, zb + db
    return za, zb


def _pack(face, res, z0a, z0b, digs):
    out = (
        (np.int64(res) << _RES_SHIFT)
        | (face.astype(np.int64) << _FACE_SHIFT)
        | ((z0a + 8).astype(np.int64) << _Z0A_SHIFT)
        | ((z0b + 8).astype(np.int64) << _Z0B_SHIFT)
    )
    filled = np.zeros_like(out)
    for k in range(1, MAX_RES + 1):
        if k <= res:
            d = digs[:, res - k]  # digits stored finest-first; level k
            # digit is the one peeled at step res-k (coarsest = last).
        else:
            d = np.full(out.shape, 7, dtype=np.int64)
        filled |= d << _DIG_SHIFT(k)
    return out | filled


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> _RES_SHIFT) & 0xF
    face = (cell >> _FACE_SHIFT) & 0x1F
    z0a = ((cell >> _Z0A_SHIFT) & 0xF) - 8
    z0b = ((cell >> _Z0B_SHIFT) & 0xF) - 8
    return face, res, z0a, z0b


def _digits_of(cell, res):
    cell = np.asarray(cell, dtype=np.int64)
    digs = np.zeros((cell.shape[0], res), dtype=np.int64)
    for k in range(1, res + 1):
        digs[:, res - k] = (cell >> _DIG_SHIFT(k)) & 0x7
    return digs


def encode(lon_deg, lat_deg, res: int) -> np.ndarray:
    """(lon, lat) degrees -> hex7 cell id at resolution res.
    Non-finite inputs yield -1 (the null sentinel for UDF wrappers)."""
    assert 0 <= res <= MAX_RES
    lon_a = np.asarray(lon_deg, dtype=np.float64)
    lat_a = np.asarray(lat_deg, dtype=np.float64)
    bad = ~(np.isfinite(lon_a) & np.isfinite(lat_a))
    if bad.any():
        lon_a = np.where(bad, 0.0, lon_a)
        lat_a = np.where(bad, 0.0, lat_a)
    p = _unit_vectors(lon_a, lat_a)
    face = np.argmax(p @ FACE_N.T, axis=1)
    n, e1, e2 = FACE_N[face], FACE_E1[face], FACE_E2[face]
    t = (p * n).sum(1)
    q = p / t[:, None]
    c = ((q * e1).sum(1) + 1j * (q * e2).sum(1)) / S0
    w = c * U_C**res
    za, zb = _hex_round(w)
    digs, z0a, z0b = _peel_digits(za, zb, res)
    out = _pack(face, res, np.clip(z0a, -8, 7), np.clip(z0b, -8, 7), digs)
    if bad.any():
        out = np.where(bad, np.int64(-1), out)
    return out


def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """hex7 cell id -> (lon, lat) degrees of the hex center (spherical,
    inverse gnomonic)."""
    cell = np.asarray(cell, dtype=np.int64)
    face, res, z0a, z0b = unpack(cell)
    r = int(res[0]) if res.size else 0
    assert (res == r).all(), "cell_center expects uniform resolution"
    digs = _digits_of(cell, r)
    za, zb = _build_z(z0a, z0b, digs)
    w = (za + zb * OMEGA) * S0 / U_C**r
    n, e1, e2 = FACE_N[face], FACE_E1[face], FACE_E2[face]
    p = n + w.real[:, None] * e1 + w.imag[:, None] * e2
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat = np.rad2deg(np.arcsin(np.clip(p[:, 2], -1, 1)))
    lon = np.rad2deg(np.arctan2(p[:, 1], p[:, 0]))
    return lon, lat


def parent(cell, parent_res: int) -> np.ndarray:
    """Exact aperture-7 parent: truncate digits below parent_res (set
    to 7) and rewrite the res field — pure bitwise, mirrored as a
    native Spark column expression in functions/hex7_udfs.py."""
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> _RES_SHIFT) & 0xF
    assert (res >= parent_res).all()
    out = cell
    for k in range(parent_res + 1, MAX_RES + 1):
        out = out | (np.int64(7) << _DIG_SHIFT(k))
    out = (out & ~(np.int64(0xF) << _RES_SHIFT)) | (
        np.int64(parent_res) << _RES_SHIFT
    )
    return out


def k_ring(cell, k: int = 1) -> np.ndarray:
    """Filled hex disk of radius k in lattice space, per cell:
    [n, 3k(k+1)+1] ids. Face-local (no cross-face wrap)."""
    cell = np.asarray(cell, dtype=np.int64)
    face, res, z0a, z0b = unpack(cell)
    r = int(res[0]) if res.size else 0
    assert (res == r).all(), "k_ring expects uniform resolution"
    digs = _digits_of(cell, r)
    za, zb = _build_z(z0a, z0b, digs)
    offs = [
        (da, db)
        for da in range(-k, k + 1)
        for db in range(-k, k + 1)
        if max(abs(da), abs(db), abs(da - db)) <= k
    ]
    out = np.empty((cell.shape[0], len(offs)), dtype=np.int64)
    for j, (da, db) in enumerate(offs):
        ndigs, nz0a, nz0b = _peel_digits(za + da, zb + db, r)
        out[:, j] = _pack(
            face, r, np.clip(nz0a, -8, 7), np.clip(nz0b, -8, 7), ndigs
        )
    return out


def neighbors(cell) -> np.ndarray:
    """CROSS-FACE-CORRECT 6-neighborhood (VERDICT r4 item 5 — closes
    the documented face-local k_ring limitation above): for each of
    the six unit lattice directions, take the neighbor lattice
    point's CENTER on this face's tangent plane, lift it to the
    sphere, and re-encode it through the global encoder. For an
    interior cell the center is an exact lattice point of this face,
    so `_hex_round` returns it verbatim and the result equals the
    pure lattice neighbor; for a cell on an icosahedron edge the
    lifted center's nearest face is the ADJACENT face, and the
    re-encode lands on that face's own hex lattice — a well-defined,
    locally-computable adjacency across every edge and vertex of the
    icosahedron.

    The relation is deterministic but DIRECTED near edges (face B's
    lattice is not aligned with face A's, so A->B does not imply
    B->A); graph consumers (operators/joins.hex7_k_disk) define the
    disk by forward reachability and say so. Returns [n, 6] ids;
    duplicates possible near vertices (consumers dedupe)."""
    cell = np.asarray(cell, dtype=np.int64)
    face, res, z0a, z0b = unpack(cell)
    r = int(res[0]) if res.size else 0
    assert (res == r).all(), "neighbors expects uniform resolution"
    digs = _digits_of(cell, r)
    za, zb = _build_z(z0a, z0b, digs)
    n_v, e1, e2 = FACE_N[face], FACE_E1[face], FACE_E2[face]
    out = np.empty((cell.shape[0], 6), dtype=np.int64)
    for j, (da, db) in enumerate(DIGITS[1:]):
        w = ((za + da) + (zb + db) * OMEGA) * S0 / U_C**r
        p = n_v + w.real[:, None] * e1 + w.imag[:, None] * e2
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        lat = np.rad2deg(np.arcsin(np.clip(p[:, 2], -1, 1)))
        lon = np.rad2deg(np.arctan2(p[:, 1], p[:, 0]))
        out[:, j] = encode(lon, lat, r)
    return out


def token(cell) -> np.ndarray:
    """Hex-string form, e.g. '21c8e00000000e49'."""
    return np.array([format(int(c) & 0xFFFFFFFFFFFFFFFF, "016x") for c in np.asarray(cell)])
