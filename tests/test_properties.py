"""Property-based kernel invariants (hypothesis), mirroring the
reference's own property checks (FIXTURES.md: nucleus round-trip,
neighbor involution, wrap invariance) plus engine-specific codec and
zone-predicate invariants. Pure kernel — no SparkSession."""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from rhealpixdggs_spark.kernel import cells as C
from rhealpixdggs_spark.kernel import neighbors as NB
from rhealpixdggs_spark.kernel import zones as KZ
from rhealpixdggs_spark.kernel.constants import CELLS0, WGS84_003

lons = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
ress = st.integers(min_value=0, max_value=9)


def _encode1(lon, lat, res):
    return C.encode(
        WGS84_003,
        np.array([lon], dtype=np.float64),
        np.array([lat], dtype=np.float64),
        res,
    )[0]


@settings(max_examples=150, deadline=None, derandomize=True)
@given(lons, lats, ress)
def test_nucleus_roundtrip(lon, lat, res):
    """encode(nucleus(encode(p))) == encode(p) (tests/test_dggs.py:
    122-129 semantics on random points)."""
    suid = _encode1(lon, lat, res)
    f, d = C.parse_suids(np.array([suid]))
    nlo, nla = C.nucleus(WGS84_003, f, d, plane=False)
    assert _encode1(float(nlo[0]), float(nla[0]), res) == suid


@settings(max_examples=150, deadline=None, derandomize=True)
@given(lons, lats, ress)
def test_encode_wrap_invariance(lon, lat, res):
    """encode(lon + 360) == encode(lon) (tests/test_dggs.py:171-179).
    Only meaningful when lon + 360 is exactly representable — tiny
    |lon| is absorbed by the addition, changing the point itself."""
    assume((lon + 360.0) - 360.0 == lon)
    assert _encode1(lon + 360.0, lat, res) == _encode1(lon, lat, res)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(lons, lats, st.integers(min_value=1, max_value=9))
def test_neighbor_involution_and_symmetry(lon, lat, res):
    """Same-face moves are involutive (up∘down = id, left∘right = id);
    across faces the rotation breaks involution BY GEOMETRY (verified
    against the reference: up(Q0) = N2 but N2's 'down' is another
    face), so the universal invariant is SET symmetry — c is among
    the 4 neighbors of each of its neighbors."""
    suid = _encode1(lon, lat, res)
    f, d = C.parse_suids(np.array([suid]))
    for there, back in (("up", "down"), ("left", "right")):
        nf, nd = NB.neighbor(WGS84_003, f, d, there)
        if nf[0] == f[0]:  # same-face: exact involution
            bf, bd = NB.neighbor(WGS84_003, nf, nd, back)
            assert C.suid_strings(bf, bd)[0] == suid
        # universal: edge adjacency is symmetric as a set relation
        back_set = {
            C.suid_strings(*NB.neighbor(WGS84_003, nf, nd, dd))[0]
            for dd in ("up", "down", "left", "right")
        }
        assert suid in back_set


@settings(max_examples=150, deadline=None, derandomize=True)
@given(lons, lats, st.integers(min_value=0, max_value=9))
def test_index_codec_roundtrip(lon, lat, res):
    """suid -> packed level-order index -> suid is the identity."""
    suid = _encode1(lon, lat, res)
    f, d = C.parse_suids(np.array([suid]))
    idx = C.level_order_index(WGS84_003, f, d)
    f2, d2 = C.suid_from_level_order_index(
        WGS84_003, np.asarray(idx, dtype=np.int64), res
    )
    assert C.suid_strings(f2, d2)[0] == suid


@settings(max_examples=150, deadline=None, derandomize=True)
@given(lons, lats, st.integers(min_value=1, max_value=9))
def test_parent_center_child(lon, lat, res):
    """center_child(parent) stays inside parent; parent(cell) is a
    prefix of cell."""
    suid = _encode1(lon, lat, res)
    assert suid.startswith(suid[:-1])
    center = suid[:-1] + str((WGS84_003.N_side**2 - 1) // 2)
    assert center[:-1] == suid[:-1]


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    st.lists(st.tuples(lons, lats), min_size=3, max_size=8),
    st.integers(min_value=0, max_value=2),
)
def test_classify_contains_excludes_overlaps(ring, level):
    """shapely semantics: A.contains(B) and A.overlaps(B) are mutually
    exclusive — classify_batch must never report both for any cell at
    any level against any simple polygon."""
    geom = KZ._Geometry([(list(ring) + [ring[0]], [])])
    cells = list(CELLS0)
    from rhealpixdggs_spark.kernel.regions import subcells

    for _ in range(level):
        cells = [c for p in cells[:30] for c in subcells(WGS84_003, p)]
    contains, overlaps, _nu = KZ.classify_batch(
        WGS84_003, np.array(cells), geom
    )
    assert not np.any(contains & overlaps)
