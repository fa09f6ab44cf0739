"""Neighbor/ring parity: goldens + live-oracle random batches."""

import numpy as np

from rhealpixdggs_spark.kernel import cells as C
from rhealpixdggs_spark.kernel import neighbors as NB
from rhealpixdggs_spark.kernel.constants import DggsConfig, WGS84_003

A = np.array


def suids_at(cfg, res, rng, n):
    idx0 = cfg.num_cells(0, res - 1) if res > 0 else 0
    idx = rng.integers(idx0, idx0 + 6 * cfg.N_side ** (2 * res), n)
    f, d = C.suid_from_level_order_index(cfg, idx, res)
    return f, d


class TestGoldens:
    def test_planar_neighbors_n0(self):
        f, d = C.parse_suids(A(["N0"]))
        got = {
            nm: C.suid_strings(*NB.neighbor(WGS84_003, f, d, nm))[0]
            for nm in ["down", "left", "right", "up"]
        }
        assert got == {"down": "N3", "left": "R0", "right": "N1", "up": "Q2"}

    def test_dggs_doctest_n8(self):
        cfg = DggsConfig(north_square=1, south_square=2)
        f, d = C.parse_suids(A(["N8"]))
        got = {
            nm: C.suid_strings(*NB.neighbor(cfg, f, d, nm))[0]
            for nm in ["down", "left", "right", "up"]
        }
        assert got == {"down": "P2", "left": "N7", "right": "Q0", "up": "N5"}
        ell = NB.neighbors_ellipsoidal(cfg, f, d)[0]
        assert ell == {"east": "N5", "south_east": "Q0", "south_west": "P2", "west": "N7"}

    def test_rotation_table(self):
        t = NB.NeighborTables(WGS84_003)
        assert [int(t.rot[q][0]) for q in range(4)] == [0, 2, 8, 6]

    def test_cell_ring_goldens(self):
        # rhp_wrappers.py:387-394
        assert NB.cell_ring(WGS84_003, "S", 1) == ["P", "Q", "R", "O"]
        assert NB.cell_ring(WGS84_003, "S001450634", 0) == ["S001450634"]
        assert NB.cell_ring(WGS84_003, "S001450634", 1) == [
            "S001450630", "S001450631", "S001450632", "S001450635",
            "S001450638", "S001450637", "S001450636", "S001450633",
        ]
        assert NB.cell_ring(WGS84_003, "S001450634", 2) == [
            "S001442828", "S001450606", "S001450607", "S001450608",
            "S001450616", "S001450640", "S001450643", "S001450646",
            "S001450670", "S001450662", "S001450661", "S001450660",
            "S001442882", "S001442858", "S001442855", "S001442852",
        ]

    def test_k_ring_goldens(self):
        # rhp_wrappers.py:482-487
        assert NB.k_ring(WGS84_003, "S001450634", 0) == ["S001450634"]
        k1 = NB.k_ring(WGS84_003, "S001450634", 1)
        assert k1 == ["S001450634"] + NB.cell_ring(WGS84_003, "S001450634", 1)
        k2 = NB.k_ring(WGS84_003, "S001450634", 2)
        assert len(k2) == 25
        assert NB.k_ring(WGS84_003, "S001450634", -1) is None


class TestProperties:
    def test_neighbor_involution(self, rng):
        # up . down == id away from face borders; general involution
        # checked against oracle below (tests/test_dggs.py:62-66 analogue).
        cfg = WGS84_003
        f, d = suids_at(cfg, 3, rng, 500)
        for a, b in [("up", "down"), ("left", "right")]:
            nf, nd = NB.neighbor(cfg, f, d, a)
            bf, bd = NB.neighbor(cfg, nf, nd, b)
            same_face = f == nf
            assert np.array_equal(bf[same_face], f[same_face])
            assert np.array_equal(bd[same_face], d[same_face])

    def test_mirror_involution(self, rng):
        cfg = WGS84_003
        f, d = suids_at(cfg, 4, rng, 500)
        mf, md = NB.mirror_on_cube(cfg, f, d)
        bf, bd = NB.mirror_on_cube(cfg, mf, md)
        assert np.array_equal(bf, f) and np.array_equal(bd, d)

    def test_rowcol_roundtrip(self, rng):
        cfg = WGS84_003
        f, d = suids_at(cfg, 5, rng, 500)
        r, c = NB.rowcol(cfg, d)
        back = NB.from_rowcol(cfg, f, r, c, 5)
        assert np.array_equal(back, d)


class TestOracleParity:
    def test_planar_neighbors_vs_reference(self, ref, rng):
        rd = ref.dggs.RHEALPixDGGS()
        cfg = WGS84_003
        for res in (1, 2, 4):
            f, d = suids_at(cfg, res, rng, 300)
            suids = C.suid_strings(f, d)
            for nm in ["left", "right", "up", "down"]:
                nf, nd = NB.neighbor(cfg, f, d, nm)
                mine = C.suid_strings(nf, nd)
                for i, s in enumerate(suids):
                    cell = rd.cell([s[0]] + [int(ch) for ch in s[1:]])
                    assert mine[i] == str(cell.neighbor(nm)), (s, nm)

    def test_ellipsoidal_neighbors_vs_reference(self, ref, rng):
        rd = ref.dggs.RHEALPixDGGS()
        cfg = WGS84_003
        f, d = suids_at(cfg, 2, rng, 200)
        suids = C.suid_strings(f, d)
        mine = NB.neighbors_ellipsoidal(cfg, f, d)
        for i, s in enumerate(suids):
            cell = rd.cell([s[0]] + [int(ch) for ch in s[1:]])
            theirs = {k: str(v) for k, v in cell.neighbors(plane=False).items()}
            assert mine[i] == theirs, s

    def test_cell_ring_vs_reference_cross_face(self, ref, rng):
        # Force the slow path: cells near face corners at res 2.
        import rhealpixdggs.rhp_wrappers as rw

        for suid in ["N00", "P08", "S88", "Q26", "R60", "N88", "O00"]:
            for k in (1, 2):
                theirs = rw.cell_ring(suid, k, verbose=False)
                mine = NB.cell_ring(WGS84_003, suid, k)
                assert mine == theirs, (suid, k)

    def test_k_ring_vs_reference_random(self, ref, rng):
        import rhealpixdggs.rhp_wrappers as rw

        cfg = WGS84_003
        f, d = suids_at(cfg, 3, rng, 40)
        for s in C.suid_strings(f, d):
            assert NB.k_ring(cfg, s, 2) == rw.k_ring(s, 2, verbose=False), s
