"""Zone set algebra vs a brute-force leaf-set model.

The model expands every cell to max-resolution leaves, applies plain
Python set ops, and greedily re-compresses bottom-up — an independent
definition of the semantics the operators implement relationally.
"""

import itertools
import random

import pytest

from rhealpixdggs_spark.operators.zone_algebra import (
    normalize_zone,
    zone_intersect,
    zone_subtract,
    zone_union,
    zone_xor,
)

DIGITS = "012345678"


def leaves(cells, res):
    out = set()
    for c in cells:
        need = (res + 1) - len(c)
        assert need >= 0
        if need == 0:
            out.add(c)
        else:
            out.update(
                c + "".join(p) for p in itertools.product(DIGITS, repeat=need)
            )
    return out


def compress(cells):
    cells = set(cells)
    changed = True
    while changed:
        changed = False
        parents = {}
        for c in cells:
            if len(c) > 1:
                parents.setdefault(c[:-1], set()).add(c)
        for p, kids in parents.items():
            if len(kids) == 9:
                cells -= kids
                cells.add(p)
                changed = True
    return cells


def _df(spark, cells):
    return spark.createDataFrame([(c,) for c in cells], "cell_id string")


ZA = ["N0", "P1", "Q33", "R2"]
ZB = [
    "N00", "N01", "P",
    "Q330", "Q331", "Q332", "Q333", "Q334", "Q335", "Q336", "Q337",
    "S1",
]


class TestFixedZones:
    def test_union(self, spark):
        got = {r.cell_id for r in zone_union(_df(spark, ZA), _df(spark, ZB)).collect()}
        exp = compress(leaves(ZA, 3) | leaves(ZB, 3))
        assert got == exp == {"N0", "P", "Q33", "R2", "S1"}

    def test_intersect(self, spark):
        got = {
            r.cell_id
            for r in zone_intersect(_df(spark, ZA), _df(spark, ZB)).collect()
        }
        exp = compress(leaves(ZA, 3) & leaves(ZB, 3))
        assert got == exp
        assert "P1" in got and "N00" in got and "Q337" in got

    def test_subtract(self, spark):
        got = {
            r.cell_id
            for r in zone_subtract(_df(spark, ZA), _df(spark, ZB)).collect()
        }
        exp = compress(leaves(ZA, 3) - leaves(ZB, 3))
        assert got == exp
        assert "Q338" in got and "R2" in got and "P1" not in got

    def test_xor(self, spark):
        got = {
            r.cell_id for r in zone_xor(_df(spark, ZA), _df(spark, ZB)).collect()
        }
        exp = compress(leaves(ZA, 3) ^ leaves(ZB, 3))
        assert got == exp
        # Cells in both zones vanish; one-side cells survive.
        assert "P1" not in got and "R2" in got and "S1" in got

    def test_xor_empty_sides(self, spark):
        assert {
            r.cell_id for r in zone_xor(_df(spark, ZA), _df(spark, [])).collect()
        } == set(ZA)
        assert {
            r.cell_id for r in zone_xor(_df(spark, []), _df(spark, ZB)).collect()
        } == set(compress(set(ZB)))

    def test_xor_self_is_empty(self, spark):
        assert (
            zone_xor(_df(spark, ZA), _df(spark, ZA)).count() == 0
        )

    def test_subtract_empty_b(self, spark):
        got = {
            r.cell_id
            for r in zone_subtract(_df(spark, ZA), _df(spark, [])).collect()
        }
        assert got == set(ZA)

    def test_normalize_drops_redundancy(self, spark):
        messy = ["N0", "N03", "N03", "P1"] + [f"Q3{d}" for d in DIGITS]
        got = {r.cell_id for r in normalize_zone(_df(spark, messy)).collect()}
        assert got == {"N0", "P1", "Q3"}


class TestDeepSubtract:
    def test_res5_holes_cross_checkpoint_boundary(self, spark):
        """Subtracting res-5 holes from a res-0 face expands 5 levels
        — past the checkpoint_every=3 boundary — and the kept set must
        equal the leaf model exactly."""
        rng = random.Random(42)
        holes = sorted(
            {
                "N" + "".join(rng.choice(DIGITS) for _ in range(5))
                for _ in range(20)
            }
        )
        got = {
            r.cell_id
            for r in zone_subtract(_df(spark, ["N"]), _df(spark, holes)).collect()
        }
        exp = compress(leaves(["N"], 5) - leaves(holes, 5))
        assert got == exp
        # Compression must have re-merged everything B didn't touch:
        # the result is far smaller than the 59049-leaf expansion.
        assert len(got) < 9 * 5 * len(holes)

    def test_exhausted_max_levels_raises(self, spark):
        """A caller-supplied max_levels too shallow for B must raise,
        not silently drop the still-poked frontier (ADVICE r3)."""
        with pytest.raises(ValueError, match="frontier still poked"):
            zone_subtract(
                _df(spark, ["N"]), _df(spark, ["N01234"]), max_levels=2
            ).collect()

    def test_xor_res12_deep_cut(self, spark):
        """res-12 cut crossing four checkpoint boundaries: xor must
        equal subtract(A,B) ∪ subtract(B,A) (each leaf-model verified
        at shallower depths) without materializing 9^12 leaves."""
        A, B = ["N"], ["N012345670123", "P2"]
        got = {r.cell_id for r in zone_xor(_df(spark, A), _df(spark, B)).collect()}
        ab = {
            r.cell_id
            for r in zone_subtract(_df(spark, A), _df(spark, B)).collect()
        }
        ba = {
            r.cell_id
            for r in zone_subtract(_df(spark, B), _df(spark, A)).collect()
        }
        assert got == compress(ab | ba)
        assert "P2" in got and len(got) == 8 * 12 + 1

    def test_default_bound_derived_from_b_depth(self, spark):
        """With max_levels unset the bound comes from B's deepest suid
        — a res-7 hole in a res-0 face subtracts exactly."""
        hole = "N0123456"
        got = {
            r.cell_id
            for r in zone_subtract(_df(spark, ["N"]), _df(spark, [hole])).collect()
        }
        exp = compress(leaves(["N"], 7) - leaves([hole], 7))
        assert got == exp


class TestRandomZones:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_ops_match_leaf_model(self, spark, seed):
        rng = random.Random(seed)

        def rand_zone(n):
            cells = set()
            while len(cells) < n:
                res = rng.randint(1, 3)
                cells.add(
                    rng.choice("NOPQRS")
                    + "".join(rng.choice(DIGITS) for _ in range(res))
                )
            return sorted(cells)

        za, zb = rand_zone(12), rand_zone(12)
        la, lb = leaves(za, 3), leaves(zb, 3)
        for op, model in (
            (zone_union, la | lb),
            (zone_intersect, la & lb),
            (zone_subtract, la - lb),
            (zone_xor, la ^ lb),
        ):
            got = {
                r.cell_id for r in op(_df(spark, za), _df(spark, zb)).collect()
            }
            assert got == compress(model), (op.__name__, za, zb)
