"""Vendored reference-executed goldens stay consistent with the kernel.

rhealpixdggs_spark/data/ref_goldens.json was produced by
tools/gen_reference_goldens.py, which EXECUTES the reference library
(cells_from_region, cells_from_line, CellZoneFromPoly) and
cross-checks against the engine kernel before writing. These tests
re-run the kernel side only, so a kernel regression (or a stale
vendored file) fails without needing the reference checkout.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from rhealpixdggs_spark.kernel import regions as KR  # noqa: E402
from rhealpixdggs_spark.kernel import zones as KZ  # noqa: E402
from rhealpixdggs_spark.kernel.constants import WGS84_003  # noqa: E402


def _gen_module():
    path = os.path.join(REPO, "tools", "gen_reference_goldens.py")
    spec = importlib.util.spec_from_file_location("gen_ref_goldens", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _goldens():
    path = os.path.join(
        REPO, "rhealpixdggs_spark", "data", "ref_goldens.json"
    )
    with open(path) as f:
        return json.load(f)


def test_region_cover_golden_matches_kernel():
    g = _goldens()["region_cover"]
    M = KR.cells_from_region(
        WGS84_003, g["res"], tuple(g["ul"]), tuple(g["dr"]), plane=False
    )
    krows = [[i, j, c] for i, row in enumerate(M) for j, c in enumerate(row)]
    assert krows == g["rows"]


def test_linetrace_golden_matches_kernel():
    g = _goldens()["linetrace_many"]
    gen = _gen_module()
    assert g["n_lines"] == gen.N_LINES and g["res"] == gen.LINE_RES
    krows = []
    for line_id, pts in gen.line_fleet():
        cells = KR.linetrace(WGS84_003, [pts], g["res"], plane=False)
        krows.extend([line_id, seq, c] for seq, c in enumerate(cells))
    assert krows == g["rows"]


def test_polyfill_golden_matches_kernel():
    g = _goldens()["polyfill"]
    poly = [tuple(p) for p in g["polygon"]]
    kcells = KR.polyfill(WGS84_003, [(poly, [])], g["res"], plane=False)
    assert sorted(kcells) == g["cells"]


def test_kring_golden_matches_kernel():
    import hashlib

    from rhealpixdggs_spark.kernel import neighbors as KN

    g = _goldens()["kring_sizes"]
    for suid, n, md5 in g["rows"]:
        disk = KN.k_ring(WGS84_003, suid, g["k"])
        members = sorted(set(disk))
        assert len(members) == n
        assert hashlib.md5(",".join(members).encode()).hexdigest() == md5


def test_neighbors_golden_matches_kernel():
    import numpy as np

    from rhealpixdggs_spark.kernel import neighbors as KN
    from rhealpixdggs_spark.kernel.cells import parse_suids

    g = _goldens()["neighbors_all"]
    by_cell = {}
    for suid, direction, nb in g["rows"]:
        by_cell.setdefault(suid, {})[direction] = nb
    suids = sorted(by_cell)
    f, d = parse_suids(np.array(suids))
    kdicts = KN.neighbors_ellipsoidal(WGS84_003, f, d)
    for suid, kd in zip(suids, kdicts):
        assert kd == by_cell[suid]


def test_decode_golden_matches_kernel():
    import numpy as np

    from rhealpixdggs_spark.kernel import cells as KC

    gen = _gen_module()
    g = _goldens()["decode_all"]
    by_cell = {}
    for suid, kind, lon, lat in g["rows"]:
        by_cell.setdefault(suid, {})[kind] = (lon, lat)
    suids = sorted(by_cell)
    f, d = KC.parse_suids(np.array(suids))
    klon, klat = KC.nucleus(WGS84_003, f, d, plane=False)
    krings = np.asarray(KC.vertices(WGS84_003, f, d, plane=False))
    for i, suid in enumerate(suids):
        exp = by_cell[suid]
        assert (gen._round9(klon[i]), gen._round9(klat[i])) == exp["nucleus"]
        for j in range(4):
            got = (gen._round9(krings[i][j][0]), gen._round9(krings[i][j][1]))
            assert got == exp[f"v{j}"]


def test_zone_golden_matches_kernel():
    g = _goldens()["zone_from_poly"]
    poly = [tuple(p) for p in g["polygon"]]
    kcells = sorted(
        KZ.zone_from_poly(WGS84_003, [(poly, [])], g["res_limit"])
    )
    assert kcells == g["cells"]
