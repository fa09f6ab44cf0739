"""hex7 cell-set compaction / expansion (H3 compact-style API).

Aperture-7 GBT addressing makes "7 children per parent" a combinatorial
identity (kernel/hex7.py header: the digit set is a complete residue
system mod u, so parent = drop-finest-digit is exact in lattice space).
Compaction therefore needs no geometry at all: a parent replaces its
children exactly when all 7 sibling ids are present. This is the hex7
twin of the rHEALPix ``compress_order_cells`` family
(operators/tiling.py:compress_cells_df; reference conversion.py:114-135
for the square-grid analogue) — the reference repo itself has no
hexagonal index (its H3-shaped wrapper API only mimics names,
CHANGES.rst 0.5.5).

Both operators are pure bitwise column math + groupBy/anti-join/union —
no UDF, no driver-side cell materialization. Plan depth grows one
groupBy-union per resolution level (max 15) and is lineage-bounded the
same way compress_cells_df is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hex7_udfs import hex7_children, hex7_parent, hex7_resolution

__all__ = ["hex7_compact", "hex7_uncompact"]


def hex7_compact(
    cells: DataFrame,
    cell_col: str = "cell",
    checkpoint_every: int = 4,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Replace every complete set of 7 hex7 siblings by their parent,
    cascading coarse-ward to a fixpoint (complete parents can complete
    THEIR parent at the next level, so levels run finest-first).

    One level = one groupBy(parent) + left_anti + union, all bitwise
    int64 ops; siblings share every bit except the 3-bit finest digit,
    so within a distinct id set ``count(*) == 7`` on the parent key IS
    the all-seven-digits test. The only driver collect is the 1-row
    max-resolution bound (same bounded-control-flow pattern as
    compress_cells_df's max-suid-length scalar). localCheckpoint every
    ``checkpoint_every`` levels keeps Catalyst plan depth constant on
    deep inputs; set ``reliable_checkpoint=True`` (after
    ``setCheckpointDir``) when executor loss mid-compaction matters."""
    out = cells.select(F.col(cell_col).alias("cell")).distinct()
    max_res = out.agg(F.max(hex7_resolution(F.col("cell")))).collect()[0][0]
    if max_res is None:
        return out
    done = 0
    for r in range(int(max_res), 0, -1):
        at_r = out.where(hex7_resolution(F.col("cell")) == r)
        # Eagerly materialize the (small) complete-parent set: it is
        # consumed twice per level (emptiness probe + anti-join) and
        # would otherwise re-run the level's groupBy — and everything
        # upstream of it — both times.
        parents = (
            at_r.groupBy(hex7_parent(F.col("cell"), r - 1).alias("parent"))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == 7)
            .select("parent")
        ).localCheckpoint(eager=True)
        if parents.isEmpty():
            continue
        survivors = at_r.join(
            parents,
            hex7_parent(at_r["cell"], r - 1) == parents["parent"],
            "left_anti",
        )
        out = (
            out.where(hex7_resolution(F.col("cell")) != r)
            .unionByName(survivors)
            .unionByName(parents.select(F.col("parent").alias("cell")))
        )
        done += 1
        if done % checkpoint_every == 0:
            out = (
                out.checkpoint(eager=True)
                if reliable_checkpoint
                else out.localCheckpoint(eager=True)
            )
    return out


def hex7_uncompact(
    cells: DataFrame, target_res: int, cell_col: str = "cell"
) -> DataFrame:
    """Expand a (possibly compacted, mixed-resolution) hex7 cell set to
    uniform ``target_res``: cells already at the target pass through,
    coarser cells explode into their 7 children per level (a sequence
    explode — map-side, no shuffle). Cells FINER than the target are an
    error in H3's uncompact and raise here too (cheap metadata check
    folded into the same 1-row aggregate)."""
    out = cells.select(F.col(cell_col).alias("cell")).distinct()
    # One scalar job bounds the loop on BOTH ends (no per-level
    # emptiness probes — each would re-run the growing union plan).
    lo, hi = (
        out.agg(
            F.min(hex7_resolution(F.col("cell"))),
            F.max(hex7_resolution(F.col("cell"))),
        )
        .collect()[0]
    )
    if hi is None:
        return out
    if int(hi) > target_res:
        raise ValueError(
            f"uncompact target res {target_res} is coarser than the finest "
            f"input cell (res {int(hi)})"
        )
    for r in range(int(lo), target_res):
        coarse = out.where(hex7_resolution(F.col("cell")) == r)
        out = out.where(hex7_resolution(F.col("cell")) != r).unionByName(
            coarse.select(
                F.explode(hex7_children(F.col("cell"), r)).alias("cell")
            )
        )
    return out
