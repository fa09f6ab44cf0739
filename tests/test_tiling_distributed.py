"""Distributed ellipsoidal cover / polyfill vs the NumPy kernel.

region_cover_ell_df and polyfill_df must reproduce the kernel (and
therefore reference dggs.py:1181-1331 / rhp_wrappers.py:510-599)
outputs exactly, including cap rows, boundary prepend/append rows and
polygon holes."""

import pytest

from rhealpixdggs_spark.kernel import regions as KR
from rhealpixdggs_spark.kernel.constants import WGS84_003
from rhealpixdggs_spark.operators.tiling import polyfill_df, region_cover_ell_df

REGIONS = [
    (3, (-10.0, 60.0), (30.0, 34.0)),  # spans the north cap boundary
    (3, (-10.0, 35.0), (30.0, 5.0)),  # equatorial only
    (2, (-170.0, 80.0), (170.0, -80.0)),  # near-global, both caps
    (1, (100.0, 20.0), (120.0, -20.0)),  # crosses the equator
    (4, (-1.0, 1.0), (1.0, -1.0)),  # small
]


@pytest.mark.parametrize("res,ul,dr", REGIONS)
def test_region_cover_ell_matches_kernel(spark, res, ul, dr):
    mat = KR.cells_from_region(WGS84_003, res, ul, dr, plane=False)
    exp = sorted(
        (ri, ci, c) for ri, row in enumerate(mat) for ci, cell in enumerate(row)
        for c in [cell]
    )
    got = sorted(
        tuple(r) for r in region_cover_ell_df(spark, res, ul, dr).collect()
    )
    assert got == exp


POLYS = [
    (
        "eq_hole",
        [(-20.0, -10.0), (25.0, -15.0), (30.0, 20.0), (0.0, 30.0), (-20.0, -10.0)],
        [[(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)]],
        3,
    ),
]


@pytest.mark.parametrize("name,ring,holes,res", POLYS)
def test_polyfill_df_matches_kernel(spark, name, ring, holes, res):
    exp = sorted(KR.polyfill(WGS84_003, [(ring, holes)], res, plane=False))
    got = sorted(
        r.tile_id
        for r in polyfill_df(spark, {name: [(ring, holes)]}, res, plane=False).collect()
    )
    assert got == exp


def test_polyfill_df_euro_matches_kernel(spark):
    from __spark_entry__ import EURO_RING

    exp = sorted(KR.polyfill(WGS84_003, [(EURO_RING, [])], 3, plane=False))
    got = sorted(
        r.tile_id
        for r in polyfill_df(spark, {"euro": [(EURO_RING, [])]}, 3, plane=False).collect()
    )
    assert got == exp
