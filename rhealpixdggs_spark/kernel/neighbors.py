"""Vectorized cell topology: planar/ellipsoidal neighbors, rings.

Re-derivation of the reference's atomic-neighbor tables and digit-walk
(dggs.py:279-350, cell.py:1149-1446) and the cell_ring/k_ring walks
(rhp_wrappers.py:371-507). The common case — a ring whose bounding box
stays inside one cube face — is generated closed-form from row/col
indices (no pointer chase); face-crossing rings fall back to a faithful
per-cell replication of the reference walk, including its documented
incompleteness for rings spanning more than two faces
(rhp_wrappers.py:37).
"""

from __future__ import annotations

import numpy as np

from .constants import CELLS0, DggsConfig
from .cells import nucleus, parse_suids, suid_strings
from .latitudes import wrap_longitude

# Direction codes.
LEFT, RIGHT, UP, DOWN = 0, 1, 2, 3
DIR_NAMES = {"left": LEFT, "right": RIGHT, "up": UP, "down": DOWN}
# rhp_wrappers.py:30-31
RING_DIRS = ("right", "down", "left", "up")  # ring-walk order
DIR_INVERSE = dict(zip(RING_DIRS, ("left", "up", "right", "down")))


class NeighborTables:
    """Precomputed lookup tables for one DggsConfig (dggs.py:279-350)."""

    _cache: dict = {}

    def __new__(cls, cfg: DggsConfig):
        key = (cfg.N_side, cfg.north_square, cfg.south_square)
        if key not in cls._cache:
            cls._cache[key] = super().__new__(cls)
            cls._cache[key]._build(cfg)
        return cls._cache[key]

    def _build(self, cfg: DggsConfig):
        N = cfg.N_side
        self.N = N
        nn, ss = cfg.north_square, cfg.south_square
        # Face adjacency (dggs.py:294-334), indexed [dir, face].
        face = np.zeros((4, 6), dtype=np.int64)
        for i in range(1, 5):
            face[LEFT, i] = 4 if i == 1 else i - 1
            face[RIGHT, i] = 1 if i == 4 else i + 1
            face[DOWN, i] = 5
            face[UP, i] = 0
        face[DOWN, 0] = (nn + 0) % 4 + 1
        face[RIGHT, 0] = (nn + 1) % 4 + 1
        face[UP, 0] = (nn + 2) % 4 + 1
        face[LEFT, 0] = (nn + 3) % 4 + 1
        face[UP, 5] = (ss + 0) % 4 + 1
        face[RIGHT, 5] = (ss + 1) % 4 + 1
        face[DOWN, 5] = (ss + 2) % 4 + 1
        face[LEFT, 5] = (ss + 3) % 4 + 1
        self.face_nbr = face

        # Digit adjacency (dggs.py:337-349), indexed [dir, digit].
        dig = np.zeros((4, N * N), dtype=np.int64)
        for i in range(N * N):
            dig[LEFT, i] = i - 1
            dig[RIGHT, i] = i + 1
            dig[UP, i] = (i - N) % (N * N)
            dig[DOWN, i] = (i + N) % (N * N)
        for i in range(0, N * N, N):
            dig[LEFT, i] += N
        for i in range(N - 1, N * N, N):
            dig[RIGHT, i] -= N
        self.digit_nbr = dig

        # Border membership (cell.py:1287-1296), indexed [dir, digit].
        border = np.zeros((4, N * N), dtype=bool)
        border[UP, list(range(N))] = True
        border[DOWN, [(N - 1) * N + i for i in range(N)]] = True
        border[LEFT, [i * N for i in range(N)]] = True
        border[RIGHT, [(i + 1) * N - 1 for i in range(N)]] = True
        self.border = border

        # Quarter-turn digit permutation (cell.py:1183-1196):
        # f[i*N + j] = j*N + (N-1-i); rot[q] applies f q times.
        f1 = np.empty(N * N, dtype=np.int64)
        for i in range(N):
            for j in range(N):
                f1[i * N + j] = j * N + (N - 1 - i)
        rot = np.empty((4, N * N), dtype=np.int64)
        rot[0] = np.arange(N * N)
        rot[1] = f1
        rot[2] = f1[f1]
        rot[3] = f1[f1[f1]]
        self.rot = rot

        # Rotation fix amount per (self_face, neighbor_face) pair
        # (cell.py:1310-1335). Evaluated in the reference's elif order.
        an = {c: {} for c in range(6)}
        names = {LEFT: "left", RIGHT: "right", UP: "up", DOWN: "down"}
        for c in range(6):
            for d, nm in names.items():
                an[c][nm] = face[d, c]
        S, Np = 5, 0
        fix = np.zeros((6, 6), dtype=np.int64)
        for s0 in range(6):
            for n0 in range(6):
                if (
                    (s0 == S and n0 == an[S]["left"])
                    or (s0 == an[S]["right"] and n0 == S)
                    or (s0 == Np and n0 == an[Np]["right"])
                    or (s0 == an[Np]["left"] and n0 == Np)
                ):
                    fix[s0, n0] = 1
                elif (
                    (s0 == S and n0 == an[S]["down"])
                    or (s0 == an[S]["down"] and n0 == S)
                    or (s0 == Np and n0 == an[Np]["up"])
                    or (s0 == an[Np]["up"] and n0 == Np)
                ):
                    fix[s0, n0] = 2
                elif (
                    (s0 == S and n0 == an[S]["right"])
                    or (s0 == an[S]["left"] and n0 == S)
                    or (s0 == Np and n0 == an[Np]["left"])
                    or (s0 == an[Np]["right"] and n0 == Np)
                ):
                    fix[s0, n0] = 3
        self.rot_fix = fix


def neighbor(cfg: DggsConfig, face: np.ndarray, digits: np.ndarray, direction: str):
    """Planar edge neighbor of each cell in the given direction
    (cell.py:1224-1345), vectorized over the batch."""
    t = NeighborTables(cfg)
    d = DIR_NAMES[direction]
    n, res = digits.shape
    out = digits.copy()
    crossed = np.zeros(n, dtype=bool)
    # Digit-wise carry walk, back to front (cell.py:1299-1307).
    for i in range(res - 1, -1, -1):
        cur = digits[:, i]
        todo = ~crossed
        out[todo, i] = t.digit_nbr[d, cur[todo]]
        crossed |= ~t.border[d, cur]
    new_face = np.where(crossed, face, t.face_nbr[d, face])
    # Polar-crossing rotation fix (cell.py:1310-1335).
    q = t.rot_fix[face, new_face]
    if res and np.any(q):
        for qq in (1, 2, 3):
            m = q == qq
            if np.any(m):
                out[m] = t.rot[qq][out[m]]
    return new_face, out


def neighbors_planar(cfg: DggsConfig, face, digits):
    """Dict direction -> (face, digits) for left/right/down/up."""
    return {nm: neighbor(cfg, face, digits, nm) for nm in ["left", "right", "down", "up"]}


_ELL_DIRS = [
    "north", "south", "west", "east",
    "south_west", "south_east", "north_west", "north_east",
    "south_0", "south_1", "south_2", "south_3",
    "north_0", "north_1", "north_2", "north_3",
]


def neighbors_ellipsoidal(cfg: DggsConfig, face, digits) -> list[dict]:
    """Per-row dict of direction -> suid string, matching
    cell.neighbors(plane=False) relabeling (cell.py:1347-1446)."""
    from .cells import ellipsoidal_shape

    n = face.shape[0]
    plane = neighbors_planar(cfg, face, digits)
    # Insertion order matters for tie-breaking: left, right, down, up
    # (cell.py:1366-1368).
    order = ["left", "right", "down", "up"]
    nb_face = np.stack([plane[k][0] for k in order], axis=1)  # (n, 4)
    nb_dig = np.stack([plane[k][1] for k in order], axis=1)  # (n, 4, res)
    lon = np.empty((n, 4))
    lat = np.empty((n, 4))
    for j in range(4):
        lo, la = nucleus(cfg, nb_face[:, j], nb_dig[:, j], plane=False)
        lon[:, j] = lo
        lat[:, j] = la
    shape = ellipsoidal_shape(cfg, face, digits)
    self_lon, _ = nucleus(cfg, face, digits, plane=False)
    # Recentred longitudes for skew_quad/dart (cell.py:1396-1445).
    rel_lon = wrap_longitude(
        (lon - np.asarray(self_lon)[:, None]).ravel(), radians=cfg.radians
    ).reshape(n, 4)

    def s(r, j):
        return suid_strings(nb_face[r : r + 1, j], nb_dig[r, j][None, :])[0]

    results = []
    for r in range(n):
        sh = shape[r]
        if sh == 0:  # quad
            results.append(
                {"north": s(r, 3), "south": s(r, 2), "west": s(r, 0), "east": s(r, 1)}
            )
        elif sh == 1:  # cap: sort by (lon, lat) ascending (cell.py:1379-1395)
            idx = np.lexsort((lat[r], lon[r]))
            prefix = "south" if face[r] == 0 else "north"
            results.append({f"{prefix}_{i}": s(r, idx[i]) for i in range(4)})
        elif sh == 3:  # skew_quad (cell.py:1396-1421)
            rl = rel_lon[r].copy()
            la = lat[r].copy()
            remaining = list(range(4))
            north = max(remaining, key=lambda j: la[j])
            remaining.remove(north)
            south = min(remaining, key=lambda j: la[j])
            remaining.remove(south)
            east = max(remaining, key=lambda j: rl[j])
            west = min(remaining, key=lambda j: rl[j])
            results.append(
                {"north": s(r, north), "south": s(r, south), "east": s(r, east), "west": s(r, west)}
            )
        else:  # dart (cell.py:1422-1445)
            idx = np.lexsort((lat[r], rel_lon[r]))
            if face[r] == 0:
                keys = ["west", "south_west", "south_east", "east"]
            else:
                keys = ["west", "north_west", "north_east", "east"]
            results.append({k: s(r, idx[i]) for i, k in enumerate(keys)})
    return results


# ---------------------------------------------------------------------------
# Row/col coordinates within a face (used by the ring fast path and the
# cube mirror).
# ---------------------------------------------------------------------------


def rowcol(cfg: DggsConfig, digits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer (row, col) of the cell inside its face (base-N digits of
    the row/col suids, cell.py:269-291)."""
    N = cfg.N_side
    res = digits.shape[1]
    row = np.zeros(digits.shape[0], dtype=np.int64)
    col = np.zeros(digits.shape[0], dtype=np.int64)
    for i in range(res):
        row = row * N + digits[:, i] // N
        col = col * N + digits[:, i] % N
    return row, col


def from_rowcol(cfg: DggsConfig, face, row, col, resolution: int):
    """Inverse of rowcol: (face, row, col) -> digits."""
    N = cfg.N_side
    digits = np.empty((row.shape[0], resolution), dtype=np.int64)
    r = row.copy()
    c = col.copy()
    for i in range(resolution - 1, -1, -1):
        digits[:, i] = (r % N) * N + (c % N)
        r //= N
        c //= N
    return digits


def mirror_on_cube(cfg: DggsConfig, face, digits):
    """Opposite cell on the cube (rhp_wrappers.py:689-715)."""
    # N<->S, O<->Q, P<->R
    face_map = np.array([5, 3, 4, 1, 2, 0], dtype=np.int64)
    new_face = face_map[face]
    res = digits.shape[1]
    if res == 0:
        return new_face, digits.copy()
    N = cfg.N_side
    row_d = digits // N
    col_d = digits % N
    eq = (face >= 1) & (face <= 4)
    # Per-digit index flip: rows for equatorial faces, cols for polar.
    new_row = np.where(eq[:, None], N - row_d - 1, row_d)
    new_col = np.where(eq[:, None], col_d, N - col_d - 1)
    return new_face, new_row * N + new_col


# ---------------------------------------------------------------------------
# cell_ring / k_ring (rhp_wrappers.py:371-507)
# ---------------------------------------------------------------------------


def _ring_offsets(k: int) -> np.ndarray:
    """Ring walk offsets (drow, dcol) in reference order: start UL, walk
    right along the top, then down, left, up (2k steps per side)."""
    offs = []
    r, c = -k, -k
    for dr, dc in [(0, 1), (1, 0), (0, -1), (-1, 0)]:
        for _ in range(2 * k):
            offs.append((r, c))
            r += dr
            c += dc
    return np.array(offs, dtype=np.int64)


def cell_ring(cfg: DggsConfig, suid: str, k: int = 1) -> list[str] | None:
    """Ring of cells at distance k around one cell
    (rhp_wrappers.py:371-468)."""
    if k < 0:
        return None
    if k == 0:
        return [suid]
    face, digits = parse_suids(np.array([suid]))
    res = digits.shape[1]
    half_circle = 2 * cfg.N_side**res
    if k > half_circle:
        mf, md = mirror_on_cube(cfg, face, digits)
        return [suid_strings(mf, md)[0]]
    if res == 0:
        # Faces of the four neighbors in ring-walk order
        # (rhp_wrappers.py:423-425).
        return [
            CELLS0[neighbor(cfg, face, digits, d)[0][0]] for d in RING_DIRS
        ]
    side = cfg.N_side**res
    row, col = rowcol(cfg, digits)
    r0, c0 = int(row[0]), int(col[0])
    quarter = half_circle // 2
    if (
        k <= quarter // 2
        and r0 - k >= 0
        and c0 - k >= 0
        and r0 + k < side
        and c0 + k < side
    ):
        # Fast path: ring fits inside one face; closed-form offsets.
        offs = _ring_offsets(k)
        rows = offs[:, 0] + r0
        cols = offs[:, 1] + c0
        d = from_rowcol(cfg, None, rows, cols, res)
        f = np.full(rows.shape[0], face[0], dtype=np.int64)
        return list(suid_strings(f, d))
    return _cell_ring_walk(cfg, face, digits, k, half_circle)


def _neighbor_direction(cfg, f1, d1, f2, d2) -> str | None:
    """Which direction leads from cell 1 to cell 2
    (rhp_wrappers.py:680-686)."""
    for nm in ["left", "right", "down", "up"]:
        nf, nd = neighbor(cfg, f1, d1, nm)
        if nf[0] == f2[0] and np.array_equal(nd[0], d2[0]):
            return nm
    return None


def _cell_ring_walk(cfg, face, digits, k, half_circle):
    """Faithful replication of the reference ring walk for rings that
    cross cube faces (rhp_wrappers.py:427-468, 718-807)."""
    quarter = half_circle // 2
    # _cell_ring_setup (rhp_wrappers.py:718-735)
    if k > quarter:
        k_eff = max(2 * quarter - k, 0)
        face, digits = mirror_on_cube(cfg, face, digits)
    else:
        k_eff = k
    side_cap = quarter if 2 * k_eff > quarter else 2 * k_eff
    if k_eff < 1:
        return [suid_strings(face, digits)[0]]

    directions = RING_DIRS
    dinv = DIR_INVERSE
    # _find_cell_ring_start (rhp_wrappers.py:738-807)
    cf, cd = face, digits
    heading = directions.index("left")
    entry_step = -1
    edges_crossed = 0
    d = 0
    while d < k_eff:
        d += 1
        nm = directions[heading]
        nf, nd = neighbor(cfg, cf, cd, nm)
        if cf[0] != nf[0]:
            edges_crossed += 1
            back_f, back_d = neighbor(cfg, nf, nd, dinv[nm])
            if not (back_f[0] == cf[0] and np.array_equal(back_d[0], cd[0])):
                heading = directions.index(dinv[_neighbor_direction(cfg, nf, nd, cf, cd)])
        cf, cd = nf, nd
        nm = directions[(heading + 1) % 4]
        nf, nd = neighbor(cfg, cf, cd, nm)
        if cf[0] != nf[0]:
            edges_crossed += 1
            back_f, back_d = neighbor(cfg, nf, nd, dinv[nm])
            if not (back_f[0] == cf[0] and np.array_equal(back_d[0], cd[0])):
                heading = (
                    directions.index(dinv[_neighbor_direction(cfg, nf, nd, cf, cd)]) - 1
                ) % 4
            if edges_crossed > 1:
                heading = (heading - 1) % 4
                entry_step = d
                d = k_eff
        cf, cd = nf, nd
    direction = dinv[directions[heading]]
    if entry_step >= 0:
        side_len = min(k_eff + entry_step - 1, side_cap)
        local_up = directions[(directions.index(direction) - 1) % 4]
        for _ in range(k_eff - entry_step):
            cf, cd = neighbor(cfg, cf, cd, local_up)
    else:
        side_len = side_cap

    # Walk the four sides (rhp_wrappers.py:444-466).
    ring = []
    for _ in range(4):
        step = 0
        while step < side_len:
            ring.append(suid_strings(cf, cd)[0])
            nf, nd = neighbor(cfg, cf, cd, direction)
            back_f, back_d = neighbor(cfg, nf, nd, dinv[direction])
            if not (back_f[0] == cf[0] and np.array_equal(back_d[0], cd[0])):
                direction = dinv[_neighbor_direction(cfg, nf, nd, cf, cd)]
            cf, cd = nf, nd
            step += 1
        if side_len == 2 * k_eff:
            direction = directions[(directions.index(direction) + 1) % 4]
        side_len = side_cap
    return ring


def k_ring(cfg: DggsConfig, suid: str, k: int = 1) -> list[str] | None:
    """Filled disk: center + rings 1..k (rhp_wrappers.py:471-507)."""
    if k < 0:
        return None
    if k == 0:
        return [suid]
    res = len(suid) - 1
    distance = min(2 * cfg.N_side**res, k)
    out = [suid]
    for d in range(1, distance + 1):
        out.extend(cell_ring(cfg, suid, d))
    return out


def k_ring_batch(cfg: DggsConfig, suids: np.ndarray, k: int) -> list[list[str]]:
    """k_ring for a batch of suids. Cells whose whole disk stays inside
    their face vectorize as (2k+1)^2 rowcol offsets (one from_rowcol
    call per offset across the whole sub-batch, same walk order as the
    scalar path); border cells fall back to the per-cell face-crossing
    walk. At tile-table scale the interior path covers almost all
    cells (border fraction ~ 4k/side)."""
    arr = np.asarray(suids, dtype=object)
    out: list = [None] * len(arr)
    by_res: dict[int, list[int]] = {}
    for i, s in enumerate(arr):
        if s is not None:
            by_res.setdefault(len(s) - 1, []).append(i)
    for res, idxs in by_res.items():
        side = cfg.N_side**res
        if k <= 0 or res == 0 or k > side - 1:
            for i in idxs:
                out[i] = k_ring(cfg, str(arr[i]), k)
            continue
        sub = np.array([str(arr[i]) for i in idxs])
        face, digits = parse_suids(sub)
        row, col = rowcol(cfg, digits)
        interior = (
            (row >= k) & (row <= side - 1 - k) & (col >= k) & (col <= side - 1 - k)
        )
        idx_arr = np.array(idxs)
        if interior.any():
            f_m, r_m, c_m = face[interior], row[interior], col[interior]
            offsets = [(0, 0)] + [
                tuple(o) for d in range(1, k + 1) for o in _ring_offsets(d)
            ]
            cols_out = []
            for dr, dc in offsets:
                digs = from_rowcol(cfg, f_m, r_m + dr, c_m + dc, res)
                cols_out.append(suid_strings(f_m, digs))
            mat = np.stack(cols_out, axis=1)
            for j, i in enumerate(idx_arr[interior]):
                out[i] = mat[j].tolist()
        for i in idx_arr[~interior]:
            out[i] = k_ring(cfg, str(arr[i]), k)
    return out
