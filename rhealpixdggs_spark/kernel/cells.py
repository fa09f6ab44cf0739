"""Vectorized cell algebra: encode, decode, hierarchy, indexing.

Re-derivation of the reference's Cell / RHEALPixDGGS cell math
(dggs.py:737-831, cell.py:42-531, cell.py:625-754, cell.py:986-1147)
over flat NumPy arrays. A batch of cells is represented as
``(face: int64[n], digits: int64[n, res])`` — string suids only
materialize at the column boundary.

Only N_side with N_side**2 < 10 produces concatenated string ids
(cell.py:181-188); the engine fixes N_side=3 for its string API.
"""

from __future__ import annotations

import numpy as np

from .constants import CELLS0, DggsConfig
from .rhealpix import rhealpix_forward, rhealpix_inverse, triangle

FACE_BYTES = np.frombuffer("".join(CELLS0).encode("ascii"), dtype=np.uint8)
_BYTE_TO_FACE = np.full(256, -1, dtype=np.int64)
for _i, _b in enumerate(FACE_BYTES):
    _BYTE_TO_FACE[_b] = _i


# ---------------------------------------------------------------------------
# suid string <-> (face, digits) codecs
# ---------------------------------------------------------------------------


def suid_strings(face: np.ndarray, digits: np.ndarray) -> np.ndarray:
    """(face, digits) -> numpy unicode array of suid strings."""
    n, res = digits.shape
    buf = np.empty((n, res + 1), dtype=np.uint8)
    buf[:, 0] = FACE_BYTES[face]
    if res:
        buf[:, 1:] = digits.astype(np.uint8) + ord("0")
    return buf.reshape(-1).view(f"S{res + 1}").astype(str)


def parse_suids(suids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Uniform-resolution suid strings -> (face, digits)."""
    s = np.asarray(suids, dtype=str)
    if s.size == 0:
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.int64)
    length = len(s[0])
    if int(s.dtype.str[2:]) != length:
        raise ValueError("parse_suids requires uniform-resolution suids")
    raw = s.astype(f"S{length}").view(np.uint8).reshape(-1, length)
    face = _BYTE_TO_FACE[raw[:, 0]]
    digits = (raw[:, 1:] - ord("0")).astype(np.int64)
    return face, digits


# ---------------------------------------------------------------------------
# Encode: point -> cell (the hot path; reference dggs.py:737-831)
# ---------------------------------------------------------------------------


def encode_planar(
    cfg: DggsConfig, x: np.ndarray, y: np.ndarray, resolution: int
) -> tuple[np.ndarray, np.ndarray]:
    """Planar (x, y) meters -> (face, digits). face == -1 marks points
    outside the rHEALPix image (reference returns None, dggs.py:793-795).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    R = cfg.R_A
    pi = np.pi
    ns, ss = cfg.north_square, cfg.south_square

    # Resolution-0 face dispatch; predicate order and strictness copied
    # from dggs.py:768-795 (N/S strict, equatorial half-open).
    face = np.select(
        [
            (y > R * pi / 4)
            & (y < R * 3 * pi / 4)
            & (x > R * (-pi + ns * (pi / 2)))
            & (x < R * (-pi / 2 + ns * (pi / 2))),
            (y > -R * 3 * pi / 4)
            & (y < -R * pi / 4)
            & (x > R * (-pi + ss * (pi / 2)))
            & (x < R * (-pi / 2 + ss * (pi / 2))),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= -R * pi) & (x < -R * pi / 2),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= -R * pi / 2) & (x < 0),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= 0) & (x < R * pi / 2),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= R * pi / 2) & (x < R * pi),
        ],
        [0, 5, 1, 2, 3, 4],
        default=-1,
    )
    n = x.shape[0]
    if resolution == 0:
        return face, np.empty((n, 0), dtype=np.int64)

    # Fractional offsets from the face's UL vertex (dggs.py:804-814).
    w = cfg.cell_width(0)
    ul = np.array([cfg.ul_vertex_face(i) for i in range(6)], dtype=np.float64)
    safe = np.where(face >= 0, face, 0)
    dx = np.abs(x - ul[safe, 0]) / w
    dy = np.abs(y - ul[safe, 1]) / w
    # Border fuzz: analytically impossible, numerically possible
    # (dggs.py:807-814).
    smidgen = 0.5 * cfg.cell_width(cfg.max_resolution) / w
    dx = np.where(dx == 1, dx - smidgen, dx)
    dy = np.where(dy == 1, dy - smidgen, dy)

    # Base-N digit expansion of dx, dy truncated at `resolution`
    # (dggs.py:816-827). int(float(str(v))) in the reference is an
    # exact repr round-trip in Python 3, i.e. plain truncation.
    N = cfg.N_side
    scale = float(N) ** resolution
    # NaN / outside-grid rows are masked by face == -1; zero them before
    # the int cast to keep the cast well-defined.
    dy = np.where(np.isfinite(dy), dy, 0.0)
    dx = np.where(np.isfinite(dx), dx, 0.0)
    row = (dy * scale).astype(np.int64)
    col = (dx * scale).astype(np.int64)
    row = np.clip(row, 0, int(scale) - 1)
    col = np.clip(col, 0, int(scale) - 1)

    digits = np.empty((n, resolution), dtype=np.int64)
    for i in range(resolution - 1, -1, -1):
        r_i = row % N
        c_i = col % N
        # child_order[(row, col)] = row*N + col (dggs.py:250-256)
        digits[:, i] = r_i * N + c_i
        row //= N
        col //= N
    return face, digits


def encode_planar_index(
    cfg: DggsConfig, x: np.ndarray, y: np.ndarray, resolution: int
) -> np.ndarray:
    """Planar (x, y) -> packed level-order index (int64), -1 outside.

    The string-free hot path: identical face/digit math to
    encode_planar, but digits accumulate straight into the level-order
    key (cell.py:260-267) — no per-digit array, no string build. The
    8-byte key is what shuffles/joins/sorts at scale; suid strings are
    decoded on demand via suid_from_level_order_index."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    R = cfg.R_A
    pi = np.pi
    ns, ss = cfg.north_square, cfg.south_square
    face = np.select(
        [
            (y > R * pi / 4)
            & (y < R * 3 * pi / 4)
            & (x > R * (-pi + ns * (pi / 2)))
            & (x < R * (-pi / 2 + ns * (pi / 2))),
            (y > -R * 3 * pi / 4)
            & (y < -R * pi / 4)
            & (x > R * (-pi + ss * (pi / 2)))
            & (x < R * (-pi / 2 + ss * (pi / 2))),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= -R * pi) & (x < -R * pi / 2),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= -R * pi / 2) & (x < 0),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= 0) & (x < R * pi / 2),
            (y >= -R * pi / 4) & (y <= R * pi / 4) & (x >= R * pi / 2) & (x < R * pi),
        ],
        [0, 5, 1, 2, 3, 4],
        default=-1,
    )
    N = cfg.N_side
    b = N * N
    base = cfg.num_cells(0, resolution - 1) if resolution > 0 else 0
    if resolution == 0:
        return np.where(face >= 0, base + face, -1)
    w = cfg.cell_width(0)
    ul = np.array([cfg.ul_vertex_face(i) for i in range(6)], dtype=np.float64)
    safe = np.where(face >= 0, face, 0)
    dx = np.abs(x - ul[safe, 0]) / w
    dy = np.abs(y - ul[safe, 1]) / w
    smidgen = 0.5 * cfg.cell_width(cfg.max_resolution) / w
    dx = np.where(dx == 1, dx - smidgen, dx)
    dy = np.where(dy == 1, dy - smidgen, dy)
    dy = np.where(np.isfinite(dy), dy, 0.0)
    dx = np.where(np.isfinite(dx), dx, 0.0)
    scale = float(N) ** resolution
    row = np.clip((dy * scale).astype(np.int64), 0, int(scale) - 1)
    col = np.clip((dx * scale).astype(np.int64), 0, int(scale) - 1)
    val = face.astype(np.int64)
    for i in range(resolution):
        shift = N ** (resolution - 1 - i)
        val = val * b + ((row // shift) % N) * N + (col // shift) % N
    return np.where(face >= 0, base + val, -1)


def encode_index(
    cfg: DggsConfig,
    lon: np.ndarray,
    lat: np.ndarray,
    resolution: int,
    plane: bool = False,
) -> np.ndarray:
    """(lon, lat) -> packed level-order index; -1 for outside/null."""
    if plane:
        x, y = np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    else:
        x, y = rhealpix_forward(cfg, lon, lat)
    return encode_planar_index(cfg, x, y, resolution)


def encode(
    cfg: DggsConfig,
    lon: np.ndarray,
    lat: np.ndarray,
    resolution: int,
    plane: bool = False,
) -> np.ndarray:
    """(lon, lat) -> suid string array; None entries for points outside
    the grid (matching geo_to_rhp, rhp_wrappers.py:46-77)."""
    if plane:
        x, y = np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    else:
        x, y = rhealpix_forward(cfg, lon, lat)
    face, digits = encode_planar(cfg, x, y, resolution)
    out = suid_strings(np.where(face >= 0, face, 0), digits).astype(object)
    out[face < 0] = None
    return out


# ---------------------------------------------------------------------------
# Decode: cell -> geometry (reference cell.py:483-754)
# ---------------------------------------------------------------------------


def ul_vertex(cfg: DggsConfig, face: np.ndarray, digits: np.ndarray):
    """Planar upper-left vertex (cell.py:483-531). Digit sums accumulate
    in exact int64 before the single float scale, matching the
    reference's "multiply by N**(-resolution) at the end" note."""
    n, res = digits.shape
    N = cfg.N_side
    ul = np.array([cfg.ul_vertex_face(i) for i in range(6)], dtype=np.float64)
    row_d = digits // N
    col_d = digits % N
    if res:
        pows = N ** np.arange(res - 1, -1, -1, dtype=np.int64)  # N**(res-i)
        dx_int = (col_d * pows).sum(axis=1)
        dy_int = (row_d * pows).sum(axis=1)
    else:
        dx_int = np.zeros(n, dtype=np.int64)
        dy_int = np.zeros(n, dtype=np.int64)
    inv = float(N) ** (-res)
    dx = dx_int * inv
    dy = dy_int * inv
    w0 = cfg.cell_width(0)
    x = ul[face, 0] + w0 * dx
    y = ul[face, 1] - w0 * dy
    return x, y


def nucleus(cfg: DggsConfig, face, digits, plane: bool = True):
    """Planar / ellipsoidal cell center (cell.py:625-653)."""
    x, y = ul_vertex(cfg, face, digits)
    w = cfg.cell_width(digits.shape[1])
    cx, cy = x + w / 2, y - w / 2
    if plane:
        return cx, cy
    return rhealpix_inverse(cfg, cx, cy)


def vertices_planar(cfg: DggsConfig, face, digits):
    """4 planar corners (ul, ur, dr, dl) as (n, 4, 2) (cell.py:708-713)."""
    x, y = ul_vertex(cfg, face, digits)
    w = cfg.cell_width(digits.shape[1])
    out = np.empty((x.shape[0], 4, 2), dtype=np.float64)
    out[:, 0, 0], out[:, 0, 1] = x, y
    out[:, 1, 0], out[:, 1, 1] = x + w, y
    out[:, 2, 0], out[:, 2, 1] = x + w, y - w
    out[:, 3, 0], out[:, 3, 1] = x, y - w
    return out


def region_of(face: np.ndarray) -> np.ndarray:
    """0 equatorial, 1 north_polar, 2 south_polar (cell.py:986-1006)."""
    return np.select([face == 0, face == 5], [1, 2], default=0)


def ellipsoidal_shape(cfg: DggsConfig, face, digits) -> np.ndarray:
    """Shape codes: 0 quad, 1 cap, 2 dart, 3 skew_quad
    (cell.py:1008-1059, N_side odd)."""
    n, res = digits.shape
    N = cfg.N_side
    shape = np.full(n, 3, dtype=np.int64)
    equatorial = (face >= 1) & (face <= 4)
    shape[equatorial] = 0
    polar = ~equatorial
    if res == 0:
        shape[polar] = 1
        return shape
    center = (N * N - 1) // 2
    cap = polar & (digits == center).all(axis=1) if N % 2 == 1 else np.zeros(n, bool)
    diag1 = np.isin(digits, [i * (N + 1) for i in range(N)]).all(axis=1)
    diag2 = np.isin(digits, [(i + 1) * (N - 1) for i in range(N)]).all(axis=1)
    dart = polar & ~cap & (diag1 | diag2)
    shape[cap] = 1
    shape[dart] = 2
    return shape


def nw_vertex_index(cfg: DggsConfig, face, digits) -> np.ndarray:
    """Index (0-3) of the northwest vertex within the planar vertex list
    (ul, ur, dr, dl). Vectorization of cell.py:533-623."""
    n, res = digits.shape
    shape = ellipsoidal_shape(cfg, face, digits)
    idx = np.zeros(n, dtype=np.int64)  # quad & cap: ul (cell.py:590-592)

    skew = shape == 3
    if np.any(skew):
        # Triangle of the nucleus in the rHEALPix image (cell.py:593-608).
        cx, cy = nucleus(cfg, face[skew], digits[skew], plane=True)
        tri, _ = triangle(
            np.asarray(cx) / cfg.R_A,
            np.asarray(cy) / cfg.R_A,
            cfg.north_square,
            cfg.south_square,
            inverse=True,
        )
        north = face[skew] == 0
        i_n = (tri - cfg.north_square) % 4
        i_s = (tri - cfg.south_square) % 4
        # v[-i] for north (cell.py:604), v[i] for south (cell.py:608).
        idx[skew] = np.where(north, (4 - i_n) % 4, i_s)

    dart = shape == 2
    if np.any(dart):
        # Polewards vertex: max (|lat|, j) over the 4 projected corners
        # (cell.py:609-620) — ties break toward the larger index.
        v = vertices_planar(cfg, face[dart], digits[dart])
        m = v.shape[0]
        lats = np.empty((m, 4), dtype=np.float64)
        for j in range(4):
            _, la = rhealpix_inverse(cfg, v[:, j, 0], v[:, j, 1])
            lats[:, j] = np.abs(la)
        # argmax over (|lat|, j): reversed argmax picks the last maximum.
        rev = lats[:, ::-1]
        i = 3 - np.argmax(rev, axis=1)
        north = face[dart] == 0
        idx[dart] = np.where(north, i, (i + 1) % 4)
    return idx


def vertices(
    cfg: DggsConfig,
    face,
    digits,
    plane: bool = True,
    trim_dart: bool = False,
):
    """Cell corners. Planar: (n, 4, 2) float array (ul, ur, dr, dl).
    Ellipsoidal: list of per-row (k, 2) arrays, k==3 for trimmed darts
    (cell.py:655-732)."""
    v = vertices_planar(cfg, face, digits)
    if plane:
        return v
    n = v.shape[0]
    i0 = nw_vertex_index(cfg, face, digits)
    # Rotate each row so it starts at the NW vertex (cell.py:718-720).
    order = (i0[:, None] + np.arange(4)[None, :]) % 4
    rot = np.take_along_axis(v, order[:, :, None], axis=1)
    lon = np.empty((n, 4), dtype=np.float64)
    lat = np.empty((n, 4), dtype=np.float64)
    for j in range(4):
        lo, la = rhealpix_inverse(cfg, rot[:, j, 0], rot[:, j, 1])
        lon[:, j] = lo
        lat[:, j] = la
    shape = ellipsoidal_shape(cfg, face, digits)
    region = region_of(face)
    out = []
    for r in range(n):
        pts = np.stack([lon[r], lat[r]], axis=1)
        if trim_dart and shape[r] == 2:
            # Remove the non-vertex point (cell.py:726-731).
            drop = 2 if region[r] == 1 else 1
            pts = np.delete(pts, drop, axis=0)
        out.append(pts)
    return out


def boundary(cfg: DggsConfig, face, digits, n_per_edge: int = 2, plane: bool = True,
             interior: bool = False):
    """4(n-1) clockwise boundary points per cell as (rows, 4(n-1), 2)
    (cell.py:756-831)."""
    npts = 4 * (n_per_edge - 1)
    rows = face.shape[0]
    res = digits.shape[1]
    ulx, uly = ul_vertex(cfg, face, digits)
    w = cfg.cell_width(res)
    eps = w / 10000 if interior else 0.0
    delta = (w - 2 * eps) / (n_per_edge - 1)
    # Clockwise unit steps starting at UL: right, down, left, up.
    steps = []
    px, py = eps, -eps
    pts = [(px, py)]
    for dx_, dy_ in [(1, 0), (0, -1), (-1, 0), (0, 1)]:
        base = pts[-1]
        for j in range(1, n_per_edge):
            pts.append((base[0] + j * delta * dx_, base[1] + j * delta * dy_))
    pts.pop()  # last == first (cell.py:815-816)
    offs = np.array(pts, dtype=np.float64)  # (npts, 2)
    out = np.empty((rows, npts, 2), dtype=np.float64)
    out[:, :, 0] = ulx[:, None] + offs[None, :, 0]
    out[:, :, 1] = uly[:, None] + offs[None, :, 1]
    if plane:
        return out
    # Rotate to start at the NW vertex (cell.py:818-825), then project.
    i0 = nw_vertex_index(cfg, face, digits) * (n_per_edge - 1)
    order = (i0[:, None] + np.arange(npts)[None, :]) % npts
    out = np.take_along_axis(out, order[:, :, None], axis=1)
    flat_lon, flat_lat = rhealpix_inverse(cfg, out[:, :, 0].ravel(), out[:, :, 1].ravel())
    res_arr = np.stack([flat_lon, flat_lat], axis=1).reshape(rows, npts, 2)
    return res_arr


def xy_range(cfg: DggsConfig, face, digits):
    """Planar bbox ((x_min, x_max), (y_min, y_max)) per cell as 4 arrays
    (cell.py:734-754)."""
    x, y = ul_vertex(cfg, face, digits)
    w = cfg.cell_width(digits.shape[1])
    return x, x + w, y - w, y


# ---------------------------------------------------------------------------
# Level-order index codec (cell.py:42-120, cell.py:218-267)
# ---------------------------------------------------------------------------


def level_order_index(cfg: DggsConfig, face, digits) -> np.ndarray:
    """Level-order traversal index of each cell (cell.py:260-267)."""
    n, res = digits.shape
    b = cfg.N_side**2
    base = cfg.num_cells(0, res - 1) if res > 0 else 0
    val = face.astype(np.int64) * (b**res)
    for i in range(res):
        val = val + digits[:, i] * (b ** (res - 1 - i))
    return base + val


def suid_from_level_order_index(cfg: DggsConfig, index: np.ndarray, resolution: int):
    """Inverse codec for a fixed resolution (cell.py:89-119): index must
    lie in [ind(res), ind(res+1))."""
    b = cfg.N_side**2
    base = cfg.num_cells(0, resolution - 1) if resolution > 0 else 0
    rem = np.asarray(index, dtype=np.int64) - base
    digits = np.empty((rem.shape[0], resolution), dtype=np.int64)
    for i in range(resolution - 1, -1, -1):
        digits[:, i] = rem % b
        rem //= b
    face = rem
    return face, digits


def post_order_index(cfg: DggsConfig, face, digits) -> np.ndarray:
    """Post-order traversal index (cell.py:254-259):
    sum(s_i * num(i)) + num(L) - 1 with num(k) the subtree size."""
    n, res = digits.shape
    num = [cfg.num_cells(res_1=k, subcells=True) for k in range(res + 1)]
    out = face.astype(np.int64) * num[0]
    for i in range(res):
        out = out + digits[:, i] * num[i + 1]
    return out + num[res] - 1


def suid_from_post_order_index(cfg: DggsConfig, index: np.ndarray):
    """Inverse post-order codec (cell.py:53-88). Cells come out at
    whatever resolution the index implies; returns (face, digits,
    resolution) per row — rows are grouped by resolution by callers."""
    idx = np.asarray(index, dtype=np.int64)
    out = []
    for p in idx:
        suid = []
        rem = int(p)
        for i in range(cfg.max_resolution + 1):
            num = cfg.num_cells(res_1=i, subcells=True)
            q, r = divmod(rem, num)
            suid.append(q)
            rem = r
            if rem == num - 1:
                break
        out.append(suid)
    return out  # list of [face_idx, d1, ...]


def interval_indices(cfg: DggsConfig, suid_a: str, suid_b: str) -> tuple[int, int, int]:
    """Level-order index range [lo, hi] equivalent to the reference's
    post-order interval generator (dggs.py:710-735): all cells at
    resolution max(res_a, res_b) between a and b inclusive. At a fixed
    resolution post-order and level-order agree, so the interval is a
    contiguous level-order index range — a WHERE BETWEEN on the packed
    key (SURVEY.md section 2.4)."""
    res = max(len(suid_a), len(suid_b)) - 1
    b_side = cfg.N_side**2
    base = cfg.num_cells(0, res - 1) if res > 0 else 0

    def value_at_own_res(suid):
        f, d = parse_suids(np.array([suid]))
        own_base = cfg.num_cells(0, len(suid) - 2) if len(suid) > 1 else 0
        return int(level_order_index(cfg, f, d)[0]) - own_base, len(suid) - 1

    va, ra = value_at_own_res(suid_a[: res + 1])
    if ra < res:
        # a coarser: start at a.successor(res) = next cell at a's own
        # resolution, descended by zeros (dggs.py:727-730).
        va = (va + 1) * b_side ** (res - ra)
    vb, rb = value_at_own_res(suid_b[: res + 1])
    if rb < res:
        # b coarser: its last descendant is <= b in post-order.
        vb = (vb + 1) * b_side ** (res - rb) - 1
    return base + va, base + vb, res


# ---------------------------------------------------------------------------
# Ellipsoidal centroid (cell.py:1061-1147); scipy.dblquad replaced by a
# fixed-order Gauss-Legendre tensor rule (deterministic, tolerance-tested).
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(30)


def centroid(cfg: DggsConfig, face, digits, plane: bool = True):
    """Cell centroid. Planar == nucleus; ellipsoidal per shape:
    cap -> nucleus, quad -> (nucleus lon, mean vertex lat),
    dart/skew_quad -> area integral of the inverse projection
    (cell.py:1076-1120)."""
    if plane:
        return nucleus(cfg, face, digits, plane=True)
    n = face.shape[0]
    lon_bar, lat_bar = nucleus(cfg, face, digits, plane=False)
    lon_bar = np.asarray(lon_bar).copy()
    lat_bar = np.asarray(lat_bar).copy()
    shape = ellipsoidal_shape(cfg, face, digits)

    quad = shape == 0
    if np.any(quad):
        ev = vertices(cfg, face[quad], digits[quad], plane=False)
        lat_bar[quad] = np.array([v[:, 1].sum() / 4 for v in ev])

    hard = (shape == 2) | (shape == 3)
    if np.any(hard):
        x0, y0 = ul_vertex(cfg, face[hard], digits[hard])
        w = cfg.cell_width(digits.shape[1])
        # Tensor Gauss-Legendre over [x0, x0+w] x [y0-w, y0].
        gx = (x0[:, None] + (1 + _GL_NODES[None, :]) * w / 2)  # (m, 30)
        gy = (y0[:, None] - (1 - _GL_NODES[None, :]) * w / 2)
        m = x0.shape[0]
        X = np.repeat(gx[:, :, None], 30, axis=2)  # (m, 30x, 30y)
        Y = np.repeat(gy[:, None, :], 30, axis=1)
        lo, la = rhealpix_inverse(cfg, X.ravel(), Y.ravel())
        lo = lo.reshape(m, 30, 30)
        la = la.reshape(m, 30, 30)
        W2 = _GL_WEIGHTS[:, None] * _GL_WEIGHTS[None, :] / 4  # integrates to 1
        phi_bar = (la * W2[None]).sum(axis=(1, 2))
        lat_bar[hard] = phi_bar
        skew = shape == 3
        if np.any(skew):
            # For skew quads the longitude also needs integrating
            # (cell.py:1115-1120). Recenter lon to the nucleus to avoid
            # the antimeridian seam before averaging.
            sk_in_hard = skew[hard]
            half = 180.0 if not cfg.radians else np.pi
            nuc = lon_bar[hard][sk_in_hard][:, None, None]
            lo_sk = lo[sk_in_hard]
            dlo = np.mod(lo_sk - nuc + half, 2 * half) - half
            lam_bar = (dlo * W2[None]).sum(axis=(1, 2))
            tmp = lon_bar[hard]
            tmp[sk_in_hard] = tmp[sk_in_hard] + lam_bar
            lon_bar[hard] = tmp
    return lon_bar, lat_bar
