"""Set algebra over multi-resolution cell zones.

A *zone* is a DataFrame with a suid column representing the union of
the cells' regions (mixed resolutions allowed — the output shape of
zone_from_poly_df / polyfill_df / compress_cells_df). The reference
has no zone algebra; these operators give tile-management set ops
(union / intersect / subtract) with purely relational plans:

- prefix containment is a string-prefix equi-join (the same
  materialized-prefix trick as operators/joins.containment_join), so
  every op is groupBy/join/union over the (tiny relative to the data)
  zone tables — broadcast-able, no UDF anywhere;
- subtract expands only the cells B actually pokes into, one level
  per iteration (children = pure column concat + explode), so the
  work is proportional to the CUT BOUNDARY, not the zone area — the
  same perimeter-not-area shape as zone_from_poly_df's frontier.

Semantics are defined on leaf sets: conceptually expand every cell to
max-resolution leaves, apply the set operation, re-compress to the
canonical antichain (no cell an ancestor of another, no complete
sibling set left unmerged). Tested against a brute-force leaf-set
model in tests/test_zone_algebra.py and gated against independent
recursive-CTE SQL oracles in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.constants import WGS84_003, DggsConfig
from .tiling import compress_cells_df

# NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty, so the
# res-0 case must be guarded or every face cell becomes its own
# "proper" ancestor.
_PROPER_PREFIXES = (
    "CASE WHEN length(cell_id) > 1 THEN"
    " transform(sequence(1, length(cell_id) - 1),"
    " i -> substring(cell_id, 1, i))"
    " ELSE array() END"
)


def _cells(df: DataFrame, cell_col: str) -> DataFrame:
    return df.select(F.col(cell_col).alias("cell_id")).distinct()


def _drop_covered(cells: DataFrame) -> DataFrame:
    """Remove cells that have a PROPER ancestor in the same set."""
    pref = cells.select(
        "cell_id", F.explode(F.expr(_PROPER_PREFIXES)).alias("anc")
    )
    covered = (
        pref.join(
            cells.select(F.col("cell_id").alias("anc")), "anc", "left_semi"
        )
        .select("cell_id")
        .distinct()
    )
    return cells.join(covered, "cell_id", "left_anti")


def normalize_zone(
    df: DataFrame,
    cell_col: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    compress: bool = True,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Canonical antichain form: dedupe, drop descendant-redundant
    cells, merge complete sibling sets (compress_cells_df)."""
    out = _drop_covered(_cells(df, cell_col))
    if not compress:
        return out
    return compress_cells_df(
        out, cfg=cfg, reliable_checkpoint=reliable_checkpoint
    )


def zone_union(
    a: DataFrame,
    b: DataFrame,
    cell_col: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Leaves(A) ∪ Leaves(B) as a canonical antichain."""
    both = _cells(a, cell_col).unionByName(_cells(b, cell_col))
    return normalize_zone(both, cfg=cfg, reliable_checkpoint=reliable_checkpoint)


def zone_intersect(
    a: DataFrame,
    b: DataFrame,
    cell_col: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Leaves(A) ∩ Leaves(B). For antichains the intersection is:
    A-cells having an ancestor-or-equal in B (the A-cell lies wholly
    inside B) plus B-cells having a PROPER ancestor in A (the B-cell
    refines an A-cell) — two prefix semi-joins, provably an antichain
    again (a containment chain across the two cases would violate
    B's antichain property)."""
    A = normalize_zone(a, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    B = normalize_zone(b, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    b_keys = B.select(F.col("cell_id").alias("anc"))
    a_keys = A.select(F.col("cell_id").alias("anc"))
    a_pref = A.select(
        "cell_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(cell_id)),"
                " i -> substring(cell_id, 1, i))"
            )
        ).alias("anc"),
    )
    case1 = a_pref.join(b_keys, "anc", "left_semi").select("cell_id").distinct()
    b_pref = B.select(
        "cell_id", F.explode(F.expr(_PROPER_PREFIXES)).alias("anc")
    )
    case2 = b_pref.join(a_keys, "anc", "left_semi").select("cell_id").distinct()
    return compress_cells_df(
        case1.unionByName(case2), cfg=cfg,
        reliable_checkpoint=reliable_checkpoint,
    )


def zone_subtract(
    a: DataFrame,
    b: DataFrame,
    cell_col: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    checkpoint_every: int = 3,
    max_levels: int | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Leaves(A) − Leaves(B) as a canonical antichain.

    A-cells wholly covered by B drop; A-cells untouched by B pass
    through; A-cells B pokes into expand one level per iteration —
    each child is dropped (== a B cell), emitted (no B descendant), or
    carried to the next level (B still pokes into it). Iterations are
    bounded by B's deepest resolution — derived from one tiny
    driver-side aggregate (max suid length over the already-small zone
    table B) unless `max_levels` overrides it; a frontier still poked
    after the last level raises rather than silently under-reporting
    A − B (ADVICE r3). The frontier is localCheckpoint'ed every
    `checkpoint_every` levels (same lineage-bounding treatment as
    compress_cells_df)."""
    spark = a.sparkSession
    A = normalize_zone(a, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    B = normalize_zone(b, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    b_cells = B.select(F.col("cell_id").alias("b_cell"))
    # Every proper prefix of a B cell: "B has a descendant inside".
    b_pref = (
        B.select(F.explode(F.expr(_PROPER_PREFIXES)).alias("b_pfx"))
        .distinct()
    )
    a_pref = A.select(
        "cell_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(cell_id)),"
                " i -> substring(cell_id, 1, i))"
            )
        ).alias("anc"),
    )
    covered = (
        a_pref.join(b_cells, a_pref.anc == b_cells.b_cell, "left_semi")
        .select("cell_id")
        .distinct()
    )
    alive = A.join(covered, "cell_id", "left_anti")
    poked = alive.join(
        b_pref, alive.cell_id == b_pref.b_pfx, "left_semi"
    )
    kept = alive.join(poked, "cell_id", "left_anti")
    frontier = poked
    digits = [F.lit(str(d)) for d in range(cfg.N_side**2)]
    if max_levels is None:
        # A child of length L is poked iff it matches a proper B
        # prefix (length <= max_b_len - 1), so max_b_len - 1 levels
        # always drain the frontier regardless of where A's cells sit.
        row = B.agg(F.max(F.length("cell_id"))).first()
        max_levels = max((row[0] or 1) - 1, 0)
    for level in range(max_levels):
        if frontier.isEmpty():
            break
        children = frontier.select(
            F.explode(
                F.array(*[F.concat(F.col("cell_id"), d) for d in digits])
            ).alias("cell_id")
        )
        # Parent was not covered, so a child is covered iff it IS a
        # B cell; it needs further cutting iff B has a descendant in
        # it (exact match against the prefix table).
        children = children.join(
            b_cells, children.cell_id == b_cells.b_cell, "left_anti"
        )
        next_frontier = children.join(
            b_pref, children.cell_id == b_pref.b_pfx, "left_semi"
        )
        kept = kept.unionByName(
            children.join(next_frontier, "cell_id", "left_anti")
        )
        frontier = next_frontier
        if (level + 1) % checkpoint_every == 0:
            # Same fault-tolerance trade-off note as
            # operators/joins.knn_join_rings_adaptive.
            if reliable_checkpoint:
                frontier = frontier.checkpoint(eager=True)
                kept = kept.checkpoint(eager=True)
            else:
                frontier = frontier.localCheckpoint(eager=True)
                kept = kept.localCheckpoint(eager=True)
    else:
        if not frontier.isEmpty():
            raise ValueError(
                "zone_subtract: frontier still poked by B after "
                f"{max_levels} levels — raise max_levels (or leave it "
                "None to derive the bound from B's deepest cell)"
            )
    return compress_cells_df(
        kept, cfg=cfg, reliable_checkpoint=reliable_checkpoint
    )


def zone_xor(
    a: DataFrame,
    b: DataFrame,
    cell_col: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    checkpoint_every: int = 3,
    max_levels: int | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Symmetric difference Leaves(A) XOR Leaves(B) as a canonical
    antichain: (A − B) ∪ (B − A) with the two subtract frontiers FUSED
    into one per-level loop — a single tagged frontier (src, cell_id)
    explodes children once per level and joins against the opposite
    side's cell/prefix tables, so xor costs one plan sequence instead
    of two full subtracts plus a union. The two kept sets are
    region-disjoint (an A−B cell lies inside A, a B−A cell outside
    A), so their union is already an antichain and one final
    compress_cells_df canonicalizes it."""
    A = normalize_zone(a, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    B = normalize_zone(b, cell_col, cfg, reliable_checkpoint=reliable_checkpoint)
    # For src='a' rows the cutter is B; for src='b' rows it is A.
    cut_cells = (
        B.select(F.lit("a").alias("src"), F.col("cell_id").alias("cut"))
        .unionByName(
            A.select(F.lit("b").alias("src"), F.col("cell_id").alias("cut"))
        )
    )
    cut_pref = (
        B.select(
            F.lit("a").alias("src"),
            F.explode(F.expr(_PROPER_PREFIXES)).alias("pfx"),
        )
        .unionByName(
            A.select(
                F.lit("b").alias("src"),
                F.explode(F.expr(_PROPER_PREFIXES)).alias("pfx"),
            )
        )
        .distinct()
    )
    base = A.select(F.lit("a").alias("src"), "cell_id").unionByName(
        B.select(F.lit("b").alias("src"), "cell_id")
    )
    base_pref = base.select(
        "src",
        "cell_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(cell_id)),"
                " i -> substring(cell_id, 1, i))"
            )
        ).alias("anc"),
    )
    covered = (
        base_pref.join(
            cut_cells,
            (base_pref.src == cut_cells.src) & (base_pref.anc == cut_cells.cut),
            "left_semi",
        )
        .select("src", "cell_id")
        .distinct()
    )
    alive = base.join(covered, ["src", "cell_id"], "left_anti")
    poked = alive.join(
        cut_pref,
        (alive.src == cut_pref.src) & (alive.cell_id == cut_pref.pfx),
        "left_semi",
    )
    kept = alive.join(poked, ["src", "cell_id"], "left_anti")
    frontier = poked
    digits = [F.lit(str(d)) for d in range(cfg.N_side**2)]
    if max_levels is None:
        row = base.agg(F.max(F.length("cell_id"))).first()
        max_levels = max((row[0] or 1) - 1, 0)
    for level in range(max_levels):
        if frontier.isEmpty():
            break
        children = frontier.select(
            "src",
            F.explode(
                F.array(*[F.concat(F.col("cell_id"), d) for d in digits])
            ).alias("cell_id"),
        )
        children = children.join(
            cut_cells,
            (children.src == cut_cells.src)
            & (children.cell_id == cut_cells.cut),
            "left_anti",
        )
        next_frontier = children.join(
            cut_pref,
            (children.src == cut_pref.src)
            & (children.cell_id == cut_pref.pfx),
            "left_semi",
        )
        kept = kept.unionByName(
            children.join(next_frontier, ["src", "cell_id"], "left_anti")
        )
        frontier = next_frontier
        if (level + 1) % checkpoint_every == 0:
            if reliable_checkpoint:
                frontier = frontier.checkpoint(eager=True)
                kept = kept.checkpoint(eager=True)
            else:
                frontier = frontier.localCheckpoint(eager=True)
                kept = kept.localCheckpoint(eager=True)
    else:
        if not frontier.isEmpty():
            raise ValueError(
                "zone_xor: frontier still poked after "
                f"{max_levels} levels — raise max_levels (or leave it "
                "None to derive the bound from the zones' deepest cell)"
            )
    return compress_cells_df(
        kept.select("cell_id"), cfg=cfg,
        reliable_checkpoint=reliable_checkpoint,
    )
