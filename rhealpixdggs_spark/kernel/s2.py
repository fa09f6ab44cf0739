"""S2 cell-id encoder (pure NumPy, public algorithm).

Implements the published S2 point->cell-id scheme (quadratic ST
projection + Hilbert curve ordering on 6 cube faces) for cross-index
joins alongside rHEALPix (north-star requirement). Derived from the
publicly documented algorithm (s2geometry.io docs; the C++/python
implementations are Apache-2.0): cube-face selection by dominant
axis, (u,v) -> (s,t) quadratic transform, 30-level leaf (i,j), Hilbert
position via the standard 4-bit lookup tables, 64-bit id with trailing
1-bit marking the level.

Everything is vectorized: face select via argmax, Hilbert walk as 8
table-lookup rounds over int64 arrays.
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30

POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.int64)


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)

    def init(level, i, j, orig_orientation, pos, orientation):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for index in range(4):
            init(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ int(POS_TO_ORIENTATION[index]),
            )

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij

LOOKUP_POS, LOOKUP_IJ = _build_lookups()


def _xyz_from_lonlat(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    cp = np.cos(phi)
    return np.cos(lam) * cp, np.sin(lam) * cp, np.sin(phi)


def _face_uv(x, y, z):
    """Dominant-axis face selection and (u, v) per the S2 face tables."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + 3 * (
        np.select([face == 0, face == 1], [x < 0, y < 0], default=z < 0)
    ).astype(np.int64)
    # u, v per face (s2 coordinate conventions). np.select evaluates
    # every branch, so zero denominators in non-selected branches are
    # expected — silence them.
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face.astype(np.int64), u, v


def _st_from_uv(u):
    """Quadratic projection: uniform cell areas to within ~2.1x.
    Both branches are evaluated by np.where, so clamp each sqrt
    argument to keep the unselected branch from raising on |u|>1/3."""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1 + 3 * u, 0.0)),
        1 - 0.5 * np.sqrt(np.maximum(1 - 3 * u, 0.0)),
    )


def _ij_from_st(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def cell_id_from_lonlat(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """(lon, lat) degrees -> int64 S2 cell id at `level`."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & SWAP_MASK).astype(np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    ident = (n << np.uint64(1)) + np.uint64(1)  # leaf id
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        ident = (ident & ~(lsb - np.uint64(1)) & ~lsb) | lsb
    return ident.astype(np.int64)  # two's-complement view, matches s2 int64 ids


def token(ids: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    out = []
    for v in np.asarray(ids, dtype=np.int64):
        h = format(np.uint64(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out, dtype=object)


def level_of(ids: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    ids = np.asarray(ids).astype(np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2)).astype(np.int64)


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    ids = np.asarray(ids).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((ids & ~(lsb - np.uint64(1)) & ~lsb) | lsb).astype(np.int64)
