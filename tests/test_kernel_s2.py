"""S2 encoder structural verification (no s2 library available
offline): face dispatch, level markers, parent consistency, Hilbert
curve continuity, and a brute-force quadtree oracle."""

import numpy as np
import pytest

from rhealpixdggs_spark.kernel import s2

A = np.array


def test_face_dispatch():
    ids = s2.cell_id_from_lonlat(
        A([0.0, 90.0, 180.0, -90.0, 0.0, 0.0]),
        A([0.0, 0.0, 0.0, 0.0, 90.0, -90.0]),
        0,
    ).astype(np.uint64)
    faces = [int(v >> np.uint64(61)) for v in ids]
    assert faces == [0, 1, 3, 4, 2, 5]


def test_level_marker_and_parent():
    lon, lat = A([10.0, -120.0, 55.0]), A([20.0, -45.0, 80.0])
    leaf = s2.cell_id_from_lonlat(lon, lat, 30)
    assert list(s2.level_of(leaf)) == [30, 30, 30]
    for lvl in (0, 3, 7, 15, 29):
        direct = s2.cell_id_from_lonlat(lon, lat, lvl)
        via_parent = s2.parent(leaf, lvl)
        assert np.array_equal(direct, via_parent), lvl
        assert list(s2.level_of(direct)) == [lvl] * 3


def test_prefix_containment_range():
    # Children ids lie within [parent_min, parent_max] (Hilbert range
    # property used for range joins).
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    leaf = s2.cell_id_from_lonlat(lon, lat, 30).astype(np.uint64)
    for lvl in (2, 8, 14):
        p = s2.cell_id_from_lonlat(lon, lat, lvl).astype(np.uint64)
        lsb = np.uint64(1) << np.uint64(2 * (30 - lvl))
        lo = p - lsb + np.uint64(1)
        hi = p + lsb - np.uint64(1)
        assert ((leaf >= lo) & (leaf <= hi)).all(), lvl


def _ij_from_pos_bruteforce(face: int, pos: int, level: int):
    """Independent Hilbert decode: walk the quadtree with the POS_TO_IJ
    tables two bits at a time (no 4-bit lookup acceleration)."""
    orientation = face & s2.SWAP_MASK
    i = j = 0
    for k in range(level):
        child = (pos >> (2 * (level - 1 - k))) & 3
        ij = int(s2.POS_TO_IJ[orientation][child])
        i = (i << 1) + (ij >> 1)
        j = (j << 1) + (ij & 1)
        orientation ^= int(s2.POS_TO_ORIENTATION[child])
    return i, j


def test_hilbert_continuity_level6():
    # Consecutive curve positions must be edge-adjacent cells: the
    # defining Hilbert property; validates the lookup tables end to end.
    level = 6
    face = 2
    prev = None
    for pos in range(4**level):
        ij = _ij_from_pos_bruteforce(face, pos, level)
        if prev is not None:
            assert abs(ij[0] - prev[0]) + abs(ij[1] - prev[1]) == 1, pos
        prev = ij


def test_encoder_matches_bruteforce_decode():
    # Encode a point, recover (i, j) prefix from the id via the
    # brute-force table walk, and compare against the direct ST->ij.
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    level = 10
    ids = s2.cell_id_from_lonlat(lon, lat, level).astype(np.uint64)
    x, y, z = s2._xyz_from_lonlat(lon, lat)
    face, u, v = s2._face_uv(x, y, z)
    i_full = s2._ij_from_st(s2._st_from_uv(u))
    j_full = s2._ij_from_st(s2._st_from_uv(v))
    for r in range(200):
        f = int(ids[r] >> np.uint64(61))
        assert f == face[r]
        pos = int((ids[r] >> np.uint64(1)) & np.uint64((1 << 60) - 1)) >> (
            2 * (30 - level)
        )
        ii, jj = _ij_from_pos_bruteforce(f, pos, level)
        assert ii == i_full[r] >> (30 - level), r
        assert jj == j_full[r] >> (30 - level), r


def test_token_roundtrip():
    ids = s2.cell_id_from_lonlat(A([10.0]), A([20.0]), 12)
    t = s2.token(ids)[0]
    assert 1 <= len(t) <= 16
    assert int(t.ljust(16, "0"), 16) == int(np.uint64(ids[0]))
