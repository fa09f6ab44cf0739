"""Tile-table construction: full grids, region covers, polygon
covers, zones.

Grid generation is the SURVEY section 2.4 plan: cells at resolution k
are exactly the level-order indices [ind(k), ind(k+1)), so
spark.range + the index->suid kernel generates any slice of the grid
embarrassingly parallel — no successor chain, no driver loop.

Region covers and polyfill are distributed by default
(region_cover_df / region_cover_ell_df / polyfill_df): candidates come
from closed-form row/column spans, geometry decode is one Arrow pass,
containment is pure column math — a continent-scale res-9 cover never
touches the driver. polyfill_tiles remains as the driver-side NumPy
fast path for a handful of small polygons whose result should land in
a broadcastable local DataFrame."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import cells as KC
from ..kernel import regions as KR
from ..kernel.constants import WGS84_003, DggsConfig


def _resolve_split_dateline(polys, split_dateline, cfg, opname: str):
    """Shared dateline policy for the polygon-list operators
    (VERDICT r3 item 4): `polys` is [(exterior, holes), ...].
    split_dateline=None (default) detects crossing rings and
    auto-splits them; True forces the split path; False asserts none
    cross and raises ValueError so a forgotten flag can never produce
    silently-partial covers."""
    crossing = [
        i
        for i, (ext, _h) in enumerate(polys)
        if KR.ring_crosses_dateline(ext, radians=cfg.radians)
    ]
    if split_dateline is False and crossing:
        raise ValueError(
            f"{opname}(split_dateline=False): polygon(s) "
            f"{crossing[:5]} cross the antimeridian; the bbox cover "
            "would silently drop cells — pass split_dateline=True/None "
            "to auto-split at the seam"
        )
    if split_dateline or (split_dateline is None and crossing):
        return KR.split_antimeridian(polys, radians=cfg.radians)
    return list(polys)


def grid(spark: SparkSession, resolution: int, cfg: DggsConfig = WGS84_003,
         partitions: int | None = None) -> DataFrame:
    """All cells at a resolution as (cell_id string, cell_idx long).

    Distributed: spark.range over the level-order index interval
    (cell.py:93-98), suid materialized by the index codec kernel
    (cell.py:89-119) one Arrow batch at a time."""
    lo = cfg.num_cells(0, resolution - 1) if resolution > 0 else 0
    hi = lo + 6 * cfg.N_side ** (2 * resolution)

    @pandas_udf(T.StringType())
    def idx_to_suid(idx: pd.Series) -> pd.Series:
        face, digits = KC.suid_from_level_order_index(
            cfg, idx.to_numpy(dtype=np.int64), resolution
        )
        return pd.Series(KC.suid_strings(face, digits), index=idx.index)

    rng = spark.range(lo, hi, numPartitions=partitions)
    return rng.select(
        idx_to_suid(F.col("id")).alias("cell_id"), F.col("id").alias("cell_idx")
    )


def polyfill_tiles(
    spark: SparkSession,
    polygons: dict[str, list],
    res: int,
    cfg: DggsConfig = WGS84_003,
    plane: bool = False,
    compress: bool = False,
) -> DataFrame:
    """Rasterize named polygons to a tile table
    (tile_id, res, zone). `polygons` maps zone name ->
    [(exterior_ring, holes), ...]."""
    rows = []
    for name, polys in polygons.items():
        for cell in sorted(KR.polyfill(cfg, polys, res, plane=plane, compress=compress)):
            rows.append((cell, len(cell) - 1, name))
    schema = T.StructType(
        [
            T.StructField("tile_id", T.StringType()),
            T.StructField("res", T.IntegerType()),
            T.StructField("zone", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def tile_boundaries(tiles: DataFrame, cfg: DggsConfig = WGS84_003,
                    tile_col: str = "tile_id") -> DataFrame:
    """Attach densified ellipsoidal boundaries (FIXTURES.md tiles
    spec: n=5 per edge) for point-in-polygon fixtures."""
    from ..functions.udfs import _decode_udf  # local import, shares wrapper

    def fn(face, digits):
        b = KC.boundary(cfg, face, digits, n_per_edge=5, plane=False)
        return [
            [{"lon": float(p[0]), "lat": float(p[1])} for p in row] for row in b
        ]

    ring_t = T.ArrayType(
        T.StructType(
            [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
        )
    )
    return tiles.withColumn("boundary", _decode_udf(cfg, fn, ring_t)(F.col(tile_col)))


def compress_cells_df(cells: DataFrame, cell_col: str = "cell_id",
                      cfg: DggsConfig = WGS84_003,
                      checkpoint_every: int = 3,
                      reliable_checkpoint: bool = False) -> DataFrame:
    """Distributed compress_order_cells (conversion.py:114-135): replace
    any complete set of N_side^2 siblings by the parent, iteratively to
    fixpoint. Pure groupBy/union per level — no UDF.

    Each level chains a groupBy + left_anti + union onto the previous
    plan, so a res-15 input would otherwise carry a 14-deep nested-union
    lineage into every level's isEmpty() action — Catalyst re-analyzes
    the whole tree per level (planning, not execution, becomes the
    bottleneck). The working set is localCheckpoint'ed every
    `checkpoint_every` levels to keep plan depth O(checkpoint_every)
    regardless of input resolution; each checkpoint materializes only
    the (shrinking) compressed set. localCheckpoint truncates lineage
    to executor-local blocks; for long cluster jobs where an executor
    loss mid-compaction matters, set reliable_checkpoint=True after
    spark.sparkContext.setCheckpointDir(...) (same trade-off note as
    operators/joins.knn_join_rings_adaptive)."""
    n_child = cfg.N_side**2
    out = cells.select(F.col(cell_col).alias("cell_id")).distinct()
    # Longest suid bounds the number of iterations.
    max_len = out.agg(F.max(F.length("cell_id"))).collect()[0][0] or 1
    for level in range(int(max_len) - 1):
        parents = (
            out.where(F.length("cell_id") > 1)
            .groupBy(F.expr("substring(cell_id, 1, length(cell_id)-1)").alias("parent"))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == n_child)
            .select(F.col("parent"))
        )
        if parents.isEmpty():
            break
        merged = out.join(
            parents,
            F.expr("substring(cell_id, 1, length(cell_id)-1)") == F.col("parent"),
            "left_anti",
        )
        out = merged.unionByName(parents.select(F.col("parent").alias("cell_id")))
        if (level + 1) % checkpoint_every == 0:
            out = (
                out.checkpoint(eager=True)
                if reliable_checkpoint
                else out.localCheckpoint(eager=True)
            )
    return out


def linetrace_df(
    lines: DataFrame,
    res: int,
    cfg: DggsConfig = WGS84_003,
    line_col: str = "line",
    plane: bool = False,
    split_dateline: bool = False,
) -> DataFrame:
    """Distributed linetrace (dggs.py:1096-1179 walk, parallel across
    lines): `line_col` is array<struct<lon,lat>>; output appends
    (seq, cell_id) rows per input row. Each line's neighbor walk is
    inherently sequential, so parallelism comes from the row axis —
    the right decomposition for millions of small geometries.
    split_dateline=True splits seam-crossing segments (raw in-range
    coordinates with a >180-degree jump) and concatenates the walks,
    lifting the reference's documented limitation."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _trace(col: pd.Series) -> pd.Series:
        out = []
        for coords in col:
            if coords is None or len(coords) < 2:
                out.append([])
                continue
            pts = [(float(p["lon"]), float(p["lat"])) for p in coords]
            out.append(
                [
                    str(c)
                    for c in KR.linetrace(
                        cfg, [pts], res, plane=plane,
                        split_dateline=split_dateline,
                    )
                ]
            )
        return pd.Series(out, index=col.index, dtype=object)

    traced = lines.withColumn("_cells", _trace.asNondeterministic()(F.col(line_col)))
    return traced.select(
        *[c for c in lines.columns if c != line_col],
        F.posexplode("_cells").alias("seq", "cell_id"),
    )


def _in_ring_col(px, py, ring):
    """Even-odd ray-crossing containment against a CONSTANT ring as a
    pure column expression (JVM twin of kernel points_in_ring,
    regions.py:321-337): one xor'd crossing term per non-horizontal
    edge, whole-stage codegen, no UDF."""
    ring = [tuple(map(float, p)) for p in ring]
    if ring[0] == ring[-1]:
        ring = ring[:-1]
    inside = F.lit(False)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses the test ray
        crosses = (F.lit(y1) > py) != (F.lit(y2) > py)
        xin = F.lit(x2 - x1) * (py - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        inside = inside != (crosses & (px < xin))
    return inside


def points_in_polygon_col(px, py, exterior, holes=()):
    """Column twin of kernel points_in_polygon (exterior minus holes)."""
    inside = _in_ring_col(px, py, exterior)
    for h in holes:
        inside = inside & ~_in_ring_col(px, py, h)
    return inside


def region_cover_ell_df(
    spark: SparkSession,
    res: int,
    ul: tuple[float, float],
    dr: tuple[float, float],
    cfg: DggsConfig = WGS84_003,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed ellipsoidal cells_from_region (dggs.py:1298-1331):
    same (row_i, col_i, cell_id) matrix as the kernel, row-major
    north->south / west->east, built Spark-side.

    Plan (the SURVEY section 2.6 'per-parallel generation, union'):
    the nucleus-latitude rows of the cover form a uniform lattice in
    planar y, so the row table is one spark.range / small local table;
    every row whose nucleus lies in the equatorial band expands to a
    closed-form planar COLUMN range (east neighbor == next column,
    x == R*lambda there), materialized by the level-order index codec
    in one Arrow pass — no neighbor walking, no driver-side cells.
    Polar-cap rows (the parallel's image is a square ring around the
    cap, dggs.py:1060-1094) fall back to the per-row walk kernel
    cells_from_parallel inside a pandas UDF, parallel across rows.
    """
    import math

    PI = np.pi if cfg.radians else 180.0
    mat_fallback = (
        ul[0] > dr[0]
        or ul[1] < dr[1]
        or res == 0
        or (tuple(ul) == (-PI, PI / 2) and dr[0] == -PI)
        or (tuple(dr) == (-PI, -PI / 2) and ul[0] == -PI)
    )
    schema = T.StructType(
        [
            T.StructField("row_i", T.LongType()),
            T.StructField("col_i", T.LongType()),
            T.StructField("cell_id", T.StringType()),
        ]
    )
    if mat_fallback:
        # degenerate / res-0 / whole-cap regions: the kernel matrix is
        # tiny (caps span single-digit rows at res 0).
        mat = KR.cells_from_region(cfg, res, ul, dr, plane=False)
        rows = [
            (ri, ci, c) for ri, row in enumerate(mat) for ci, c in enumerate(row)
        ]
        return spark.createDataFrame(rows, schema)

    R = cfg.R_A
    w = cfg.cell_width(res)
    n3 = cfg.N_side**res
    ring_len = 4 * n3
    phi_min, phi_max = dr[1], ul[1]
    lam_min, lam_max = ul[0], dr[0]

    def fwd(lam, phi):
        x, y = KR.healpix_forward_cfg(
            cfg, np.array([lam], dtype=np.float64), np.array([phi], dtype=np.float64)
        )
        return float(x[0]), float(y[0])

    _, y_min = fwd(0.0, phi_min)
    _, y_max = fwd(0.0, phi_max)
    # nucleus-y lattice, bit-identical to cell_latitudes(plane=True)
    ys = KR.cell_latitudes(cfg, res, y_min, y_max, nucleus_lats=True, plane=True)
    n_rows = len(ys)

    # column span of one parallel row in the equatorial band: contiguous
    # global columns between the corner cells' planar x (x = R*lambda).
    x_lo, _ = fwd(lam_min, 0.0)
    x_hi, _ = fwd(lam_max, 0.0)
    c0 = int(math.floor((x_lo + R * np.pi) / w))
    c1 = int(math.floor((x_hi + R * np.pi) / w))
    c0 = min(c0, ring_len - 1)
    c1 = min(c1, ring_len - 1)
    full_ring = c0 == c1 and (lam_max - lam_min) >= PI / 2
    # Wrap-aware span: a region whose east edge sits exactly at +180
    # has c1 wrapped to column 0 (the forward projection maps +180 to
    # -180). The kernel/reference walk then INCLUDES the first column
    # across the seam (encode(+180) lands there), so the closed-form
    # span must too — (c1 - c0) mod ring_len keeps the matrices
    # identical; the existing (col + c0) % ring_len emission already
    # wraps the column ids.
    ncols = ring_len if full_ring else (c1 - c0) % ring_len + 1

    # boundary rows (dggs.py:1319-1330): prepend/append a walked
    # parallel when the lattice misses the region's corner cells.
    ul_cell = KR.encode1(cfg, ul[0], ul[1], res)
    dl_cell = KR.encode1(cfg, ul[0], dr[1], res)
    first_nucleus = (
        KR.encode1(
            cfg,
            lam_min,
            float(KR.healpix_inverse_cfg(
                cfg, np.array([R * np.pi / 4]), np.array([ys[-1]]))[1][0]),
            res,
        )
        if n_rows
        else None
    )
    prepend = not n_rows or first_nucleus != ul_cell
    last_nucleus = (
        KR.encode1(
            cfg,
            lam_min,
            float(KR.healpix_inverse_cfg(
                cfg, np.array([R * np.pi / 4]), np.array([ys[0]]))[1][0]),
            res,
        )
        if n_rows
        else None
    )
    append = not n_rows or last_nucleus != dl_cell
    off = 1 if prepend else 0

    # split rows: equatorial band (closed-form columns) vs cap (walk).
    band = R * np.pi / 4
    eq_rows = [
        (off + (n_rows - 1 - k), y) for k, y in enumerate(ys) if abs(y) < band
    ]
    walk_rows = [
        (off + (n_rows - 1 - k), 0, y)
        for k, y in enumerate(ys)
        if abs(y) >= band
    ]
    if prepend:
        walk_rows.append((0, 1, phi_max))
    if append:
        walk_rows.append((off + n_rows, 1, phi_min))

    parts = []
    if eq_rows:
        rows_df = spark.createDataFrame(eq_rows, ["row_i", "y"])
        if partitions:
            rows_df = rows_df.repartition(partitions)
        cols_df = spark.range(0, ncols).select(F.col("id").alias("col_i"))
        g = rows_df.crossJoin(cols_df)
        gc = (F.col("col_i") + F.lit(c0)) % F.lit(ring_len)
        rib = F.floor((F.lit(band) - F.col("y")) / F.lit(w)).cast("long")
        face = F.lit(1) + F.floor(gc / F.lit(n3)).cast("long")
        cif = gc % F.lit(n3)
        # level-order index = base + face*9^res + 3*spread3to9(row) +
        # spread3to9(col) (cell.py:260-267 digit interleave).
        base = cfg.num_cells(0, res - 1)
        idx = F.lit(base) + face * F.lit((cfg.N_side**2) ** res)
        spread_r, spread_c = F.lit(0).cast("long"), F.lit(0).cast("long")
        for i in range(res):
            p3, p9 = cfg.N_side**i, (cfg.N_side**2) ** i
            spread_r = spread_r + (F.floor(rib / F.lit(p3)) % 3) * F.lit(p9)
            spread_c = spread_c + (F.floor(cif / F.lit(p3)) % 3) * F.lit(p9)
        idx = idx + F.lit(3) * spread_r + spread_c

        @pandas_udf(T.StringType())
        def idx_to_suid(ix: pd.Series) -> pd.Series:
            face, digits = KC.suid_from_level_order_index(
                cfg, ix.to_numpy(dtype=np.int64), res
            )
            return pd.Series(KC.suid_strings(face, digits), index=ix.index)

        parts.append(
            g.select(
                F.col("row_i").cast("long"),
                F.col("col_i").cast("long"),
                idx_to_suid(idx).alias("cell_id"),
            )
        )
    if walk_rows:
        wdf = spark.createDataFrame(walk_rows, ["row_i", "is_phi", "val"])

        @pandas_udf(T.ArrayType(T.StringType()))
        def walk(is_phi: pd.Series, val: pd.Series) -> pd.Series:
            out = []
            for flag, v in zip(is_phi, val):
                if flag:
                    phi = float(v)
                else:
                    phi = float(
                        KR.healpix_inverse_cfg(
                            cfg, np.array([R * np.pi / 4]), np.array([float(v)])
                        )[1][0]
                    )
                out.append(
                    [str(c) for c in KR.cells_from_parallel(
                        cfg, res, phi, lam_min, lam_max)]
                )
            return pd.Series(out, dtype=object)

        traced = wdf.withColumn(
            "_cells", walk.asNondeterministic()(F.col("is_phi"), F.col("val"))
        )
        parts.append(
            traced.select(
                F.col("row_i").cast("long"),
                F.posexplode("_cells").alias("col_i", "cell_id"),
            ).select("row_i", F.col("col_i").cast("long"), "cell_id")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def polyfill_df(
    spark: SparkSession,
    polygons: dict[str, list],
    res: int,
    cfg: DggsConfig = WGS84_003,
    plane: bool = False,
    compress: bool = False,
    split_dateline: bool | None = None,
) -> DataFrame:
    """Distributed polyfill (rhp_wrappers.py:510-599 semantics, same
    result set as kernel polyfill): per polygon, candidates come from
    the DISTRIBUTED bbox cover (region_cover_ell_df / region_cover_df),
    the centroid decode is one Arrow pass (rhp_centroid), and the
    even-odd containment filter is a pure column expression
    (points_in_polygon_col) — no driver-side cell list at any point.
    Output: (tile_id, res, zone).

    Dateline handling (the reference's own bbox assumption is its
    documented antimeridian TODO, rhp_wrappers.py:510-599): crossing
    rings (given unwrapped, or with raw >180-degree jumps) are
    detected and auto-split at the seam into west/east polygons of
    the same zone (kernel regions.split_antimeridian) before
    candidate generation when split_dateline is None (default);
    True forces the split path, False raises on a crossing ring."""
    from ..functions.udfs import rhp_centroid

    zones = []
    for name, polys in polygons.items():
        if not plane:
            polys = _resolve_split_dateline(
                polys, split_dateline, cfg, f"polyfill_df[{name}]"
            )
        cand = None
        for exterior, holes in polys:
            ext = np.asarray(exterior, dtype=np.float64)
            nw = (float(ext[:, 0].min()), float(ext[:, 1].max()))
            se = (float(ext[:, 0].max()), float(ext[:, 1].min()))
            if plane:
                cover = region_cover_df(spark, res, nw, se, cfg)
            else:
                cover = region_cover_ell_df(spark, res, nw, se, cfg)
            # explicit round-robin fan-out: the distinct() output is
            # small in BYTES, so AQE would coalesce it onto one task —
            # but the centroid decode downstream is Python COMPUTE (GL
            # integrals for dart/skew cells); see polyfill_many's note
            cells = cover.select("cell_id").distinct().repartition(
                spark.sparkContext.defaultParallelism
            )
            # centroid struct fields are (lon, lat); in plane mode they
            # carry (x, y) — either way the polygon is in the same frame.
            c = rhp_centroid(F.col("cell_id"), cfg, plane=plane)
            keep = cells.select("cell_id", c.alias("_c")).where(
                points_in_polygon_col(
                    F.col("_c")["lon"], F.col("_c")["lat"], exterior, holes
                )
            ).select("cell_id")
            cand = keep if cand is None else cand.unionByName(keep)
        cand = cand.distinct()
        if compress:
            cand = compress_cells_df(cand, cfg=cfg)
        zones.append(
            cand.select(
                F.col("cell_id").alias("tile_id"),
                (F.length("cell_id") - 1).cast("int").alias("res"),
                F.lit(name).alias("zone"),
            )
        )
    out = zones[0]
    for z in zones[1:]:
        out = out.unionByName(z)
    return out


def zone_from_poly_df(
    spark: SparkSession,
    polygons,
    res_limit: int,
    cfg: DggsConfig = WGS84_003,
    bounding_cell: str | None = None,
    checkpoint: bool = True,
    split_dateline: bool | None = None,
) -> DataFrame:
    """Distributed CellZoneFromPoly (reference conversion.py:40-111;
    the SURVEY section 2.6 'iterative DataFrame loop res 0->limit'):
    per level, explode the N_side^2 children of every
    still-overlapping cell (pure column concat), classify
    contains / overlaps / nucleus-in in ONE Arrow pass (kernel
    classify_batch — 4-vertex even-odd containment plus
    orientation-sign proper-crossing tests, vectorized across the
    batch), emit fully-contained children (and, at res_limit,
    nucleus-inside children), and carry only the overlapping cells
    forward.

    Scale shape: the frontier is the zone's PERIMETER at each level —
    O(3^level) boundary cells, not the O(9^level) interior, because
    contained cells are emitted coarse and never subdivided. Each
    level is localCheckpoint'ed (checkpoint=True) so plan depth stays
    O(1) across the <=15 levels and the classified batch is computed
    once for both the emit and frontier branches. A res-9+ zone of a
    continental polygon therefore runs entirely on executors; the
    driver only ever sees the <=6 root cells. The recursive NumPy
    kernel (kernel/zones.zone_from_poly) remains the small-N fast
    path for a handful of low-resolution zones.

    Output: (cell_id string, res int), one row per zone cell, same
    cell set as the kernel / reference recursion.

    Dateline-crossing polygons are detected and normalized through
    kernel regions.split_antimeridian by default (split_dateline=None;
    the classify kernel's even-odd test assumes rings within
    [-180, 180]); True forces the split, False raises on a crossing
    ring."""
    from ..kernel import zones as KZ
    from ..kernel.constants import CELLS0

    polygons = _resolve_split_dateline(
        polygons, split_dateline, cfg, "zone_from_poly_df"
    )
    geom = KZ._Geometry(polygons)
    if bounding_cell is None:
        bc = KZ.get_finest_containing_cell(cfg, polygons)
        roots = [bc] if bc is not None else list(CELLS0)
    else:
        roots = [bounding_cell]

    emitted_roots: list[str] = []
    frontier_cells: list[str] = []
    for root in roots:
        ring = KZ._cell_ring_ellipsoidal(cfg, root)
        if len(roots) > 1 and not (
            geom.overlaps_ring(ring) or geom.contains_ring(ring)
        ):
            continue
        if geom.contains_ring(ring):
            emitted_roots.append(root)
        elif len(root) <= res_limit:  # res(root) + 1 <= res_limit
            frontier_cells.append(root)

    parts: list[DataFrame] = []
    if emitted_roots:
        parts.append(
            spark.createDataFrame([(c,) for c in emitted_roots], "cell_id string")
        )

    @pandas_udf("contains boolean, overlaps boolean, nucleus_in boolean")
    def _classify(s: pd.Series) -> pd.DataFrame:
        c, o, nu = KZ.classify_batch(cfg, s.to_numpy(dtype=str), geom)
        return pd.DataFrame(
            {"contains": c, "overlaps": o, "nucleus_in": nu}, index=s.index
        )

    digits = [str(i) for i in range(cfg.N_side**2)]
    frontier = (
        spark.createDataFrame([(c,) for c in frontier_cells], "cell_id string")
        if frontier_cells
        else None
    )
    # no per-level fan-out here, by MEASUREMENT: this classify is one
    # vectorized kernel call per batch (~us/cell), so even a res-10
    # frontier's Python cost is ~1 s — a round-robin exchange per level
    # costs more than it saves (res-7 run: 5.0 s -> 16.4 s with it).
    # Contrast zone_tiles_many_df, where per-ZONE Python (geometry
    # rebuild + root search) is ms-per-row and the fan-out pays.
    res = len(roots[0]) - 1
    while frontier is not None and res < res_limit:
        children = frontier.select(
            F.explode(
                F.array(*[F.concat(F.col("cell_id"), F.lit(dg)) for dg in digits])
            ).alias("cell_id")
        )
        cls = children.withColumn(
            "_c", _classify.asNondeterministic()(F.col("cell_id"))
        )
        if checkpoint:
            cls = cls.localCheckpoint(eager=True)
        res += 1
        if res == res_limit:
            # at-limit membership: fully contained OR nucleus inside
            # (conversion.py child-at-limit branch)
            parts.append(
                cls.where(
                    F.col("_c.contains") | F.col("_c.nucleus_in")
                ).select("cell_id")
            )
            frontier = None
        else:
            parts.append(cls.where(F.col("_c.contains")).select("cell_id"))
            frontier = cls.where(
                ~F.col("_c.contains") & F.col("_c.overlaps")
            ).select("cell_id")
            if frontier.isEmpty():
                frontier = None
    out = (
        parts[0]
        if parts
        else spark.createDataFrame([], "cell_id string")
    )
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "cell_id", (F.length("cell_id") - 1).cast("int").alias("res")
    )


def zone_tiles(
    spark: SparkSession,
    polygons: dict[str, list],
    res_limit: int,
    cfg: DggsConfig = WGS84_003,
    split_dateline: bool | None = None,
) -> DataFrame:
    """Named multi-resolution zone table (tile_id, res, zone) — the
    CellZoneFromPoly twin of polyfill_df's output shape: one
    distributed zone loop (zone_from_poly_df) per named zone, unioned.
    The result is the compact tile side for containment_join /
    streaming_zone_assignment. `polygons` maps zone name ->
    [(exterior_ring, holes), ...]; dateline-crossing rings are
    detected and auto-split per zone by default (None); True forces
    the split, False raises on a crossing ring."""
    parts = [
        zone_from_poly_df(
            spark, polys, res_limit, cfg, split_dateline=split_dateline
        ).select(
            F.col("cell_id").alias("tile_id"),
            "res",
            F.lit(name).alias("zone"),
        )
        for name, polys in polygons.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def zone_tiles_many(
    spark: SparkSession,
    polygons: dict[str, list],
    res_limit: int,
    cfg: DggsConfig = WGS84_003,
    checkpoint: bool = True,
    split_dateline: bool | None = None,
) -> DataFrame:
    """Lock-step distributed CellZoneFromPoly for MANY named zones:
    one (zone, cell_id) frontier advances all zones together, so a
    fleet of 10k polygons rasterizes in <= res_limit+1 Spark jobs
    TOTAL (zone_tiles would launch a per-level job sequence per zone
    and union 10k plans). Per level the classify pass groups the Arrow
    batch by (zone, resolution) and runs the vectorized kernel once
    per group; zones whose perimeter is fully classified simply drop
    out of the frontier. Roots may sit at different depths (each
    zone's finest bounding cell), so the frontier legitimately mixes
    resolutions — the at-limit emit test is per-row column math.

    The geometry table ships in the UDF closure: fine for ~10^4
    modest polygons (the classify kernel is O(cells x vertices) per
    zone); beyond that, shard the dict across calls. Output:
    (tile_id, res, zone), same cell sets as zone_from_poly_df per
    zone."""
    from ..kernel import zones as KZ
    from ..kernel.constants import CELLS0

    polygons = {
        name: _resolve_split_dateline(
            polys, split_dateline, cfg, f"zone_tiles_many[{name}]"
        )
        for name, polys in polygons.items()
    }
    geoms = {name: KZ._Geometry(polys) for name, polys in polygons.items()}
    emit_rows: list[tuple[str, str]] = []
    frontier_rows: list[tuple[str, str]] = []
    for name, polys in polygons.items():
        geom = geoms[name]
        bc = KZ.get_finest_containing_cell(cfg, polys)
        roots = [bc] if bc is not None else list(CELLS0)
        for root in roots:
            ring = KZ._cell_ring_ellipsoidal(cfg, root)
            if len(roots) > 1 and not (
                geom.overlaps_ring(ring) or geom.contains_ring(ring)
            ):
                continue
            if geom.contains_ring(ring):
                emit_rows.append((name, root))
            elif len(root) <= res_limit:
                frontier_rows.append((name, root))

    schema = "zone string, cell_id string"
    parts: list[DataFrame] = []
    if emit_rows:
        parts.append(spark.createDataFrame(emit_rows, schema))

    @pandas_udf("contains boolean, overlaps boolean, nucleus_in boolean")
    def _classify(zone: pd.Series, cell: pd.Series) -> pd.DataFrame:
        n = len(cell)
        c = np.zeros(n, dtype=bool)
        o = np.zeros(n, dtype=bool)
        nu = np.zeros(n, dtype=bool)
        z = zone.to_numpy(dtype=object)
        s = cell.to_numpy(dtype=object)
        lens = np.array([len(x) for x in s])
        for zname in pd.unique(zone):
            zm = z == zname
            for L in np.unique(lens[zm]):
                m = zm & (lens == L)
                cc, oo, nn = KZ.classify_batch(
                    cfg, s[m].astype(str), geoms[zname]
                )
                c[m], o[m], nu[m] = cc, oo, nn
        return pd.DataFrame(
            {"contains": c, "overlaps": o, "nucleus_in": nu},
            index=cell.index,
        )

    digits = [str(i) for i in range(cfg.N_side**2)]
    frontier = (
        spark.createDataFrame(frontier_rows, schema) if frontier_rows else None
    )
    for _level in range(res_limit):
        if frontier is None:
            break
        children = frontier.select(
            "zone",
            F.explode(
                F.array(*[F.concat(F.col("cell_id"), F.lit(d)) for d in digits])
            ).alias("cell_id"),
        )
        cls = children.withColumn(
            "_c",
            _classify.asNondeterministic()(F.col("zone"), F.col("cell_id")),
        )
        if checkpoint:
            cls = cls.localCheckpoint(eager=True)
        at_limit = (F.length("cell_id") - 1) == res_limit
        parts.append(
            cls.where(
                F.col("_c.contains") | (at_limit & F.col("_c.nucleus_in"))
            ).select("zone", "cell_id")
        )
        frontier = cls.where(
            ~F.col("_c.contains") & ~at_limit & F.col("_c.overlaps")
        ).select("zone", "cell_id")
        if frontier.isEmpty():
            frontier = None
    out = parts[0] if parts else spark.createDataFrame([], schema)
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("cell_id").alias("tile_id"),
        (F.length("cell_id") - 1).cast("int").alias("res"),
        "zone",
    )


def _polys_from_vertex_rows(rows) -> list:
    """Rebuild a zone's [(exterior, holes), ...] part list from its
    sorted (part, ring, vtx, lon, lat) vertex rows — the executor-side
    inverse of polygons_to_df / resolve_fleet_vertices output."""
    parts: dict = {}
    for r in rows:
        parts.setdefault(r["part"], {}).setdefault(r["ring"], []).append(
            (float(r["lon"]), float(r["lat"]))
        )
    out = []
    for p in sorted(parts):
        rings = parts[p]
        out.append(
            (rings[0], [rings[k] for k in sorted(rings) if k != 0])
        )
    return out


def zone_tiles_many_df(
    spark: SparkSession,
    polygons: DataFrame,
    res_limit: int,
    cfg: DggsConfig = WGS84_003,
    checkpoint: bool = True,
    split_dateline: bool | None = None,
) -> DataFrame:
    """DataFrame-NATIVE lock-step CellZoneFromPoly: same semantics as
    zone_tiles_many (one mixed-resolution frontier advances ALL zones
    together, <= res_limit+1 jobs total) but the fleet arrives as a
    VERTEX TABLE (zone, part, ring, vtx, lon, lat) and NOTHING about
    it ever lives on the driver: the geometry reaches the classify
    pass through an equi-join on zone instead of a pickled dict
    closure, and the per-zone root search (finest bounding cell +
    res-0 seeding) runs executor-side in one Arrow pass over the
    per-zone rows. A 10^6-zone fleet is just a bigger input table.

    Per-level plan: frontier children (a column explode) equi-join
    the localCheckpoint'ed per-zone geometry table on zone, and ONE
    pandas UDF classifies the batch — geometry is rebuilt once per
    DISTINCT zone per batch (the join hash-partitions by zone, so
    batches hold few zones and the rebuild amortizes). Trade-off vs
    the dict path: each frontier row carries its zone's vertex array
    through the join (fine for parcel/admin-scale rings; a
    10^6-vertex coastline duplicates per cell — shard such zones into
    parts first). Output: (tile_id, res, zone), same cell sets as
    zone_tiles_many / zone_from_poly_df per zone."""
    from ..kernel import zones as KZ
    from ..kernel.constants import CELLS0

    resolved = resolve_fleet_vertices(
        polygons, cfg, split_dateline, "zone_tiles_many_df"
    )
    # explicit round-robin fan-out: the per-zone geometry table is tiny
    # in BYTES, so AQE's byte-based coalescing would serialize the
    # compute-dense _roots / _classify Arrow passes onto one task (the
    # polyfill GL-centroid lesson); hash keys would be eliminated as
    # redundant with the groupBy's own Exchange, round-robin is not
    fanout = spark.sparkContext.defaultParallelism
    zgeom = resolved.groupBy("zone").agg(
        F.sort_array(
            F.collect_list(F.struct("part", "ring", "vtx", "lon", "lat"))
        ).alias("g")
    ).repartition(fanout)
    if checkpoint:
        zgeom = zgeom.localCheckpoint(eager=True)

    @pandas_udf("array<struct<cell_id:string,kind:string>>")
    def _roots(g_s: pd.Series) -> pd.Series:
        out_all = []
        for rows in g_s:
            polys = _polys_from_vertex_rows(rows)
            geom = KZ._Geometry(polys)
            bc = KZ.get_finest_containing_cell(cfg, polys)
            roots = [bc] if bc is not None else list(CELLS0)
            seeds = []
            for root in roots:
                ring = KZ._cell_ring_ellipsoidal(cfg, root)
                if len(roots) > 1 and not (
                    geom.overlaps_ring(ring) or geom.contains_ring(ring)
                ):
                    continue
                if geom.contains_ring(ring):
                    seeds.append({"cell_id": root, "kind": "emit"})
                elif len(root) <= res_limit:
                    seeds.append({"cell_id": root, "kind": "frontier"})
            out_all.append(seeds)
        return pd.Series(out_all, index=g_s.index)

    seeds = zgeom.select(
        "zone", F.explode(_roots.asNondeterministic()(F.col("g"))).alias("r")
    ).select("zone", F.col("r.cell_id").alias("cell_id"), F.col("r.kind"))
    if checkpoint:
        seeds = seeds.localCheckpoint(eager=True)

    parts: list[DataFrame] = [
        seeds.where(F.col("kind") == "emit").select("zone", "cell_id")
    ]

    @pandas_udf("contains boolean, overlaps boolean, nucleus_in boolean")
    def _classify(zone: pd.Series, cell: pd.Series,
                  g: pd.Series) -> pd.DataFrame:
        n = len(cell)
        c = np.zeros(n, dtype=bool)
        o = np.zeros(n, dtype=bool)
        nu = np.zeros(n, dtype=bool)
        z = zone.to_numpy(dtype=object)
        s = cell.to_numpy(dtype=object)
        lens = np.array([len(x) for x in s])
        for zname in pd.unique(zone):
            zm = z == zname
            first = int(np.flatnonzero(zm)[0])
            geom = KZ._Geometry(_polys_from_vertex_rows(g.iloc[first]))
            for L in np.unique(lens[zm]):
                m = zm & (lens == L)
                cc, oo, nn = KZ.classify_batch(cfg, s[m].astype(str), geom)
                c[m], o[m], nu[m] = cc, oo, nn
        return pd.DataFrame(
            {"contains": c, "overlaps": o, "nucleus_in": nu},
            index=cell.index,
        )

    digits = [str(i) for i in range(cfg.N_side**2)]
    frontier = seeds.where(F.col("kind") == "frontier").select(
        "zone", "cell_id"
    )
    for _level in range(res_limit):
        if frontier is None:
            break
        children = frontier.select(
            "zone",
            F.explode(
                F.array(*[F.concat(F.col("cell_id"), F.lit(d)) for d in digits])
            ).alias("cell_id"),
        )
        # same fan-out before the classify pass: the joined frontier is
        # small in bytes but ~Python-milliseconds per row to classify
        cls = children.join(zgeom, "zone").repartition(fanout).withColumn(
            "_c",
            _classify.asNondeterministic()(
                F.col("zone"), F.col("cell_id"), F.col("g")
            ),
        ).select("zone", "cell_id", "_c")
        if checkpoint:
            cls = cls.localCheckpoint(eager=True)
        at_limit = (F.length("cell_id") - 1) == res_limit
        parts.append(
            cls.where(
                F.col("_c.contains") | (at_limit & F.col("_c.nucleus_in"))
            ).select("zone", "cell_id")
        )
        frontier = cls.where(
            ~F.col("_c.contains") & ~at_limit & F.col("_c.overlaps")
        ).select("zone", "cell_id")
        if frontier.isEmpty():
            frontier = None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("cell_id").alias("tile_id"),
        (F.length("cell_id") - 1).cast("int").alias("res"),
        "zone",
    )


def _interleave_idx(cfg: DggsConfig, res: int, face, i_col, j_col):
    """Level-order index of the res-`res` cell at (row i, col j) of
    planar face `face` — the digit-interleave closed form shared by
    the band and cap candidate generators (same construction as
    region_cover_ell_df's path; cell.py:93-119 index semantics)."""
    base = cfg.num_cells(0, res - 1)
    idx = F.lit(base) + face * F.lit((cfg.N_side**2) ** res)
    spread_i, spread_j = F.lit(0).cast("long"), F.lit(0).cast("long")
    for k in range(res):
        p3, p9 = cfg.N_side**k, (cfg.N_side**2) ** k
        spread_i = spread_i + (F.floor(i_col / F.lit(p3)) % 3) * F.lit(p9)
        spread_j = spread_j + (F.floor(j_col / F.lit(p3)) % 3) * F.lit(p9)
    return idx + F.lit(3) * spread_i + spread_j


def _cap_candidate_cells(
    capdf: DataFrame,
    bboxes: DataFrame,
    cfg: DggsConfig,
    res: int,
) -> DataFrame:
    """Polar-cap candidate cells (zone, face, fi, fj) from square
    annuli: `capdf` rows are (zone, face, a, b) — the annulus
    [a, b] in cell units around the polar face center (see
    polyfill_many's closed form) — and `bboxes` carries the
    per-zone (lam_mid, lam_half) longitude bbox driving the
    nucleus-longitude prune that keeps the Gauss-Legendre centroid
    pass off the ~360/wedge-width over-generation of a lon-narrow
    cap polygon. Shared by the dict- and DataFrame-native polyfill
    fleets; all span math is column expressions."""
    w = cfg.cell_width(res)
    n3 = cfg.N_side**res
    half = F.lit(n3 / 2.0)
    i_lo = F.greatest(F.lit(0), F.floor(half - F.col("b")).cast("long") - 1)
    i_hi = F.least(
        F.lit(n3 - 1), F.ceil(half + F.col("b")).cast("long")
    )
    gi = capdf.select(
        "zone", "face", "a", "b",
        F.explode(F.sequence(i_lo, i_hi)).alias("fi"),
    )
    # Box infinity-distance interval of face row fi from the face
    # center, in cell units: rows whose NEAREST edge is outside B
    # drop; rows whose FARTHEST edge reaches past A keep one full
    # span, interior rows keep the two annulus flanks.
    dlo_i = F.greatest(
        half - (F.col("fi") + 1), F.col("fi") - half, F.lit(0.0)
    )
    dhi_i = F.greatest(
        F.abs(F.col("fi") - half), F.abs(F.col("fi") + 1 - half)
    )
    jl = F.greatest(F.lit(0), F.floor(half - F.col("b")).cast("long") - 1)
    jr = F.least(F.lit(n3 - 1), F.ceil(half + F.col("b")).cast("long"))
    j_in_l = F.floor(half - F.col("a")).cast("long")
    j_in_r = F.ceil(half + F.col("a")).cast("long") - 1
    spans = (
        gi.where(dlo_i <= F.col("b"))
        .select(
            "zone", "face", "fi",
            F.explode(
                F.when(
                    dhi_i >= F.col("a"),
                    F.array(F.struct(jl.alias("j0"), jr.alias("j1"))),
                ).otherwise(
                    F.array(
                        F.struct(
                            jl.alias("j0"),
                            F.least(j_in_l, jr).alias("j1"),
                        ),
                        F.struct(
                            F.greatest(j_in_r, jl).alias("j0"),
                            jr.alias("j1"),
                        ),
                    )
                )
            ).alias("s"),
        )
        .select("zone", "face", "fi", F.col("s.j0"), F.col("s.j1"))
        .where(F.col("j0") <= F.col("j1"))
    )
    gj = spans.select(
        "zone", "face", "fi", F.explode(F.sequence("j0", "j1")).alias("fj")
    )
    # Nucleus-longitude prune BEFORE the expensive Gauss-Legendre
    # centroid pass: a full annulus over-generates ~360/wedge-width
    # for a lon-narrow cap polygon, and each dart/skew centroid
    # costs a 900-point inverse-projection integral. The nucleus
    # is a single inverse projection per cell (straight from the
    # planar center, no suid), and |centroid lon - nucleus lon| is
    # bounded by the cell's lon span <= 45deg/dlo (a ring side of
    # 2*dlo cells maps to 90deg) — the pad HALF/max(dlo, 0.5) is 4x
    # that, so every centroid-inside cell survives the prune.
    # HALF is the cfg-unit half-turn (pi for radians configs): the
    # circular wrap and pad below MUST be in the same units as
    # lam_mid/lam_half (raw polygon lons) and rhealpix_inverse.
    HALF = np.pi if cfg.radians else 180.0
    dlo_j = F.greatest(
        half - (F.col("fj") + 1), F.col("fj") - half, F.lit(0.0)
    )
    dlo_cell = F.greatest(dlo_i, dlo_j)
    pad = F.lit(HALF) / F.greatest(dlo_cell, F.lit(0.5))

    @pandas_udf(T.DoubleType())
    def _cap_nuc_lon(face_s: pd.Series, fi_s: pd.Series,
                     fj_s: pd.Series) -> pd.Series:
        from ..kernel.rhealpix import rhealpix_inverse

        f = face_s.to_numpy(dtype=np.int64)
        i_a = fi_s.to_numpy(dtype=np.int64)
        j_a = fj_s.to_numpy(dtype=np.int64)
        ulx = np.array([cfg.ul_vertex_face(k)[0] for k in range(6)])
        uly = np.array([cfg.ul_vertex_face(k)[1] for k in range(6)])
        x = ulx[f] + (j_a + 0.5) * w
        y = uly[f] - (i_a + 0.5) * w
        lo, _ = rhealpix_inverse(cfg, x, y)
        return pd.Series(lo, index=face_s.index)

    circ = F.abs(
        ((_cap_nuc_lon.asNondeterministic()(
            F.col("face"), F.col("fi"), F.col("fj")
        ) - F.col("lam_mid") + F.lit(3 * HALF)) % F.lit(2 * HALF))
        - F.lit(HALF)
    )
    return gj.join(bboxes, "zone").where(
        circ <= F.col("lam_half") + pad
    ).select("zone", "face", "fi", "fj")


def polyfill_many(
    spark: SparkSession,
    polygons: dict[str, list],
    res: int,
    cfg: DggsConfig = WGS84_003,
    partitions: int | None = None,
    split_dateline: bool | None = None,
) -> DataFrame:
    """Lock-step polyfill for MANY polygons in ONE plan: a single
    band-candidate generator (per-polygon row/column spans,
    sequence-exploded Spark-side) plus ONE cap-row walk generator for
    polygons reaching the polar caps, a shared packed-int64 dedupe,
    one index->suid pass, one centroid decode pass, and one per-zone
    even-odd filter — no per-polygon union, so a mixed 10k-polygon
    fleet rasterizes with one plan. Correctness needs no lattice
    parity: candidates are a PADDED SUPERSET of each bbox cover and
    the centroid-in-polygon filter (rhp_wrappers.py:510-599 semantics,
    same as polyfill_df) decides membership.

    Cap candidates (|planar y| >= R*pi/4) come from a CLOSED FORM: in
    the assembled polar face a parallel's image is the square ring of
    infinity-norm radius u = R*pi/2 - |y| around the face center
    (dggs.py:1060-1094's geometry), so the polygon's cap portion maps
    to a square ANNULUS of cells [A, B] in cell units. A cell whose
    centroid lies in the polygon has its centroid's u inside
    [u(lat_max), u(cap edge)], and the centroid sits inside the cell's
    planar square, so the cell's box-distance interval intersects the
    annulus — candidates are a proven superset, generated as <= 2
    column spans per face row (sequence-exploded, pure column math,
    no per-cell Python; the over-generation for a lon-narrow cap
    polygon is bounded by the annulus area and the centroid filter
    drops it — zone_tiles does perimeter-proportional work if that
    matters).

    Dateline: crossing rings are detected (same unwrap-seam scan as
    split_antimeridian) and auto-split into same-zone parts when
    split_dateline is None (the default); True forces the split path,
    False raises if any ring crosses. Output: (tile_id, res, zone)."""
    from ..functions.udfs import rhp_centroid
    from ..kernel.regions import healpix_forward_cfg

    R = cfg.R_A
    w = cfg.cell_width(res)
    n3 = cfg.N_side**res
    band = R * np.pi / 4
    y_pole = R * np.pi / 2

    polygons = {
        zone: _resolve_split_dateline(
            polys, split_dateline, cfg, f"polyfill_many[{zone}]"
        )
        for zone, polys in polygons.items()
    }

    rows = []
    cap_rows = []
    lookup = {}
    lon_bbox: dict[str, tuple[float, float]] = {}
    for zone, polys in polygons.items():
        lookup[zone] = [
            (
                [(float(x), float(y)) for x, y in ext],
                [[(float(x), float(y)) for x, y in h] for h in holes],
            )
            for ext, holes in polys
        ]
        for ext, _holes in polys:
            arr = np.asarray(ext, dtype=np.float64)
            _, y_lo = healpix_forward_cfg(
                cfg, np.array([0.0]), np.array([arr[:, 1].min()])
            )
            _, y_hi = healpix_forward_cfg(
                cfg, np.array([0.0]), np.array([arr[:, 1].max()])
            )
            y_lo, y_hi = float(y_lo[0]), float(y_hi[0])
            lam0d = float(arr[:, 0].min())
            lam1d = float(arr[:, 0].max())
            if zone in lon_bbox:
                lon_bbox[zone] = (
                    min(lon_bbox[zone][0], lam0d),
                    max(lon_bbox[zone][1], lam1d),
                )
            else:
                lon_bbox[zone] = (lam0d, lam1d)
            row0 = max(0, int((band - y_hi) // w) - 1)
            row1 = min(n3 - 1, int((band - y_lo) // w) + 1)
            lam = np.radians(arr[:, 0]) if not cfg.radians else arr[:, 0]
            gc0 = max(0, int((R * lam.min() + R * np.pi) // w) - 1)
            gc1 = min(4 * n3 - 1, int((R * lam.max() + R * np.pi) // w) + 1)
            if row1 >= row0:  # pure-cap polygons have no band rows
                # (and sequence(row0, row1) would run DESCENDING)
                rows.append((zone, row0, row1, gc0, gc1))
            # Cap portions as square annuli [A, B] in cell units
            # (+/- 1 cell insurance on top of the proven superset).
            if y_hi >= band:  # north cap, face N = 0
                u_in = y_pole - min(y_hi, y_pole)
                u_out = y_pole - max(y_lo, band)
                cap_rows.append(
                    (zone, 0, max(0.0, u_in / w - 1),
                     min(n3 / 2.0, u_out / w + 1))
                )
            if y_lo <= -band:  # south cap, face S = 5
                u_in = min(y_hi, -band) + y_pole
                u_out = max(y_lo, -y_pole) + y_pole
                cap_rows.append(
                    (zone, 5, max(0.0, min(u_in, u_out) / w - 1),
                     min(n3 / 2.0, max(u_in, u_out) / w + 1))
                )

    spans = spark.createDataFrame(
        rows, "zone string, row0 long, row1 long, gc0 long, gc1 long"
    )
    if partitions:
        spans = spans.repartition(partitions)
    g = spans.select(
        "zone",
        F.explode(F.sequence("row0", "row1")).alias("rib"),
        "gc0", "gc1",
    ).select(
        "zone", "rib", F.explode(F.sequence("gc0", "gc1")).alias("gc")
    )
    # level-order index from (row-in-band, global column), same digit
    # interleave as region_cover_ell_df's closed-form path
    face = F.lit(1) + F.floor(F.col("gc") / F.lit(n3)).cast("long")
    cif = F.col("gc") % F.lit(n3)
    idx = _interleave_idx(cfg, res, face, F.col("rib"), cif)

    @pandas_udf(T.StringType())
    def idx_to_suid(ix: pd.Series) -> pd.Series:
        face_a, digits = KC.suid_from_level_order_index(
            cfg, ix.to_numpy(dtype=np.int64), res
        )
        return pd.Series(KC.suid_strings(face_a, digits), index=ix.index)

    # Dedupe multi-part zones on the packed int64 BEFORE decoding:
    # the distinct's shuffle is 8-byte keys, and it spreads the
    # decode + centroid Arrow passes across the full shuffle
    # parallelism instead of the few input partitions of the tiny
    # spans table.
    keyed = g.select("zone", idx.alias("_idx"))
    if cap_rows:
        capdf = spark.createDataFrame(
            cap_rows, "zone string, face long, a double, b double"
        )
        if partitions:
            capdf = capdf.repartition(partitions)
        bbox_rows = [
            (z, (lam0 + lam1) / 2.0, (lam1 - lam0) / 2.0)
            for z, (lam0, lam1) in lon_bbox.items()
        ]
        bboxes = F.broadcast(
            spark.createDataFrame(
                bbox_rows, "zone string, lam_mid double, lam_half double"
            )
        )
        gj = _cap_candidate_cells(capdf, bboxes, cfg, res)
        idxc = _interleave_idx(
            cfg, res, F.col("face"), F.col("fi"), F.col("fj")
        )
        keyed = keyed.unionByName(gj.select("zone", idxc.alias("_idx")))
    # Explicit round-robin fan-out before the Gauss-Legendre centroid
    # pass: the distinct() output is only a few MB, so AQE's
    # BYTE-based coalescing would fold it into one task — but the
    # downstream cost is ~1.75 ms/row of Python COMPUTE (dart/skew GL
    # integrals), which serialized on one core both slows the job
    # ~cores-x and makes wall time hostage to single-task noise (the
    # r4 bench's 6.4 s IQR; BENCH/fleet_mixed_attribution.json).
    # And decode each DISTINCT cell once, not once per (zone, cell)
    # pair:
    # cap-reaching zones SHARE the expensive polar dart/skew cells
    # (the ~1.75 ms/row GL integrals), and band zones share quad
    # cells wherever bboxes overlap, so the GL pass runs on the
    # distinct-cell set and pairs re-attach by the 8-byte _idx
    # equi-join (AQE broadcasts the small cell table). Same pattern
    # as polyfill_many_df; ~1.9x on the 100k-triangle fleet bench.
    fanout = keyed.sparkSession.sparkContext.defaultParallelism
    cells = (
        keyed.select("_idx")
        .distinct()
        .repartition(fanout)
        .select("_idx", idx_to_suid(F.col("_idx")).alias("tile_id"))
        .withColumn("_c", rhp_centroid(F.col("tile_id"), cfg, plane=False))
    )
    cand = keyed.distinct().join(cells, "_idx").select("zone", "tile_id", "_c")

    @pandas_udf(T.BooleanType())
    def _in_zone(zo: pd.Series, lo: pd.Series, la: pd.Series) -> pd.Series:
        out = np.zeros(len(lo), dtype=bool)
        lon = lo.to_numpy(np.float64)
        lat = la.to_numpy(np.float64)
        for z in zo.unique():
            m = (zo == z).to_numpy()
            hit = np.zeros(int(m.sum()), dtype=bool)
            for ext, holes in lookup[z]:
                hit |= KR.points_in_polygon(lon[m], lat[m], ext, holes)
            out[m] = hit
        return pd.Series(out, index=lo.index)

    return (
        cand.where(
            _in_zone.asNondeterministic()(
                F.col("zone"), F.col("_c")["lon"], F.col("_c")["lat"]
            )
        )
        .select(
            "tile_id",
            (F.length("tile_id") - 1).cast("int").alias("res"),
            "zone",
        )
    )


POLYGON_TABLE_SCHEMA = (
    "zone string, part int, ring int, vtx int, lon double, lat double"
)


def polygons_to_df(spark: SparkSession, polygons: dict[str, list]) -> DataFrame:
    """Flatten a polyfill_many polygon dict into the vertex-table
    shape polyfill_many_df consumes: one row per vertex, ring 0 the
    exterior, rings >= 1 the holes, vertices ordered by vtx. A test
    and migration helper — production fleets should build the vertex
    table distributedly (parquet scan, spark.range generator, ...)."""
    rows = []
    for zone, polys in polygons.items():
        for pi, (ext, holes) in enumerate(polys):
            for ri, ring in enumerate([ext, *holes]):
                for vi, (x, y) in enumerate(ring):
                    rows.append((zone, pi, ri, vi, float(x), float(y)))
    return spark.createDataFrame(rows, POLYGON_TABLE_SCHEMA)


def resolve_fleet_vertices(
    polygons: DataFrame,
    cfg: DggsConfig,
    split_dateline: bool | None,
    caller: str,
) -> DataFrame:
    """Dateline-resolve a polygon-fleet VERTEX TABLE
    (zone, part, ring, vtx, lon, lat) — ring 0 the exterior, rings
    >= 1 holes — entirely executor-side: vertices collect_list into
    one array per (zone, part) (a JVM partial-aggregation shuffle)
    and ONE Arrow-batched pandas_udf applies the exact kernel
    split_antimeridian per polygon, exploding back to vertex rows
    with split parts re-keyed as part*64 + i. Shared by
    polyfill_many_df and polygon_join_df; split_dateline semantics
    are the fleet-wide defaults (None detects, True forces, False
    raises inside the distributed stage)."""
    # round-robin fan-out before _split: the grouped vertex table is
    # tiny in bytes, so AQE's byte-based coalescing would run the
    # per-polygon Python split loop on few tasks (measured: 3.85 s ->
    # 2.69 s at a 100k fleet, and the serial share grows with fleet
    # size); downstream consumers all re-shuffle, so the partitioning
    # is free to be round-robin
    fanout = polygons.sparkSession.sparkContext.defaultParallelism
    grouped = polygons.groupBy("zone", "part").agg(
        F.sort_array(
            F.collect_list(F.struct("ring", "vtx", "lon", "lat"))
        ).alias("verts")
    ).repartition(fanout)

    out_t = T.ArrayType(T.StructType([
        T.StructField("part_off", T.IntegerType()),
        T.StructField("ring", T.IntegerType()),
        T.StructField("vtx", T.IntegerType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]))

    @pandas_udf(out_t)
    def _split(verts_s: pd.Series) -> pd.Series:
        out_all = []
        for verts in verts_s:
            rings: list[list] = []
            cur_ring = None
            for v in verts:  # sorted by (ring, vtx) via sort_array
                if v["ring"] != cur_ring:
                    rings.append([])
                    cur_ring = v["ring"]
                rings[-1].append((float(v["lon"]), float(v["lat"])))
            polys = _resolve_split_dateline(
                [(rings[0], rings[1:])], split_dateline, cfg, caller,
            )
            rows = []
            for j, (ext, holes) in enumerate(polys):
                for ri, ring in enumerate([ext, *holes]):
                    for vi, (x, y) in enumerate(ring):
                        rows.append({
                            "part_off": j, "ring": ri, "vtx": vi,
                            "lon": float(x), "lat": float(y),
                        })
            out_all.append(rows)
        return pd.Series(out_all, index=verts_s.index)

    return (
        grouped.select(
            "zone", "part",
            F.explode(_split.asNondeterministic()(F.col("verts"))).alias("v"),
        )
        .select(
            "zone",
            (F.col("part").cast("long") * 64 + F.col("v.part_off"))
            .alias("part"),
            F.col("v.ring").alias("ring"), F.col("v.vtx").alias("vtx"),
            F.col("v.lon").alias("lon"), F.col("v.lat").alias("lat"),
        )
    )


def fleet_candidate_idx(
    resolved: DataFrame, cfg: DggsConfig, res: int
) -> DataFrame:
    """Candidate res-`res` cells per zone for a dateline-RESOLVED
    vertex fleet, as packed int64 level-order indices (zone, _idx) —
    pure column math end to end: per-part exterior bbox stats are a
    JVM aggregation, the HEALPix y of the lat extremes is one tiny
    Arrow pass over the per-part rows, band row/column spans and
    closed-form polar-cap annuli are sequence-exploded exactly like
    polyfill_many's driver loop (shared _interleave_idx /
    _cap_candidate_cells helpers, +/-1-cell padding). The output is a
    SUPERSET of every cell intersecting each part's bbox, so it
    prefilters both centroid membership (polyfill_many_df) and
    point containment (polygon_join_df). May contain duplicates —
    callers dedupe on the 8-byte key."""
    from ..kernel.regions import healpix_forward_cfg

    R = cfg.R_A
    w = cfg.cell_width(res)
    n3 = cfg.N_side**res
    band = R * np.pi / 4
    y_pole = R * np.pi / 2

    @pandas_udf(T.DoubleType())
    def _fwd_y(lat_s: pd.Series) -> pd.Series:
        _, y = healpix_forward_cfg(
            cfg, np.zeros(len(lat_s)), lat_s.to_numpy(np.float64)
        )
        return pd.Series(y, index=lat_s.index)

    heads = (
        resolved.where(F.col("ring") == 0)
        .groupBy("zone", "part")
        .agg(
            F.min("lon").alias("lon_lo"), F.max("lon").alias("lon_hi"),
            F.min("lat").alias("lat_lo"), F.max("lat").alias("lat_hi"),
        )
        .select(
            "zone", "part", "lon_lo", "lon_hi",
            _fwd_y(F.col("lat_lo")).alias("y_lo"),
            _fwd_y(F.col("lat_hi")).alias("y_hi"),
        )
    )

    # Band row/column spans: the same +/-1-padded closed forms as
    # polyfill_many's driver loop, as column expressions.
    lam_lo = F.col("lon_lo") if cfg.radians else F.radians("lon_lo")
    lam_hi = F.col("lon_hi") if cfg.radians else F.radians("lon_hi")
    row0 = F.greatest(
        F.lit(0),
        F.floor((F.lit(band) - F.col("y_hi")) / F.lit(w)).cast("long") - 1,
    )
    row1 = F.least(
        F.lit(n3 - 1),
        F.floor((F.lit(band) - F.col("y_lo")) / F.lit(w)).cast("long") + 1,
    )
    gc0 = F.greatest(
        F.lit(0),
        F.floor((F.lit(R) * lam_lo + F.lit(R * np.pi)) / F.lit(w))
        .cast("long") - 1,
    )
    gc1 = F.least(
        F.lit(4 * n3 - 1),
        F.floor((F.lit(R) * lam_hi + F.lit(R * np.pi)) / F.lit(w))
        .cast("long") + 1,
    )
    spans = heads.select(
        "zone", row0.alias("row0"), row1.alias("row1"),
        gc0.alias("gc0"), gc1.alias("gc1"),
        "y_lo", "y_hi",
    )
    g = (
        spans.where(F.col("row0") <= F.col("row1"))
        .select(
            "zone",
            F.explode(F.sequence("row0", "row1")).alias("rib"),
            "gc0", "gc1",
        )
        .select(
            "zone", "rib", F.explode(F.sequence("gc0", "gc1")).alias("gc")
        )
    )
    face = F.lit(1) + F.floor(F.col("gc") / F.lit(n3)).cast("long")
    cif = F.col("gc") % F.lit(n3)
    keyed = g.select(
        "zone",
        _interleave_idx(cfg, res, face, F.col("rib"), cif).alias("_idx"),
    )

    # Cap annuli [a, b] in cell units (polyfill_many's closed form)
    # as a conditional struct-array explode: 0-2 cap rows per part.
    ycol_lo, ycol_hi = F.col("y_lo"), F.col("y_hi")
    north = F.when(
        ycol_hi >= F.lit(band),
        F.array(F.struct(
            F.lit(0).cast("long").alias("face"),
            F.greatest(
                F.lit(0.0),
                (F.lit(y_pole) - F.least(ycol_hi, F.lit(y_pole)))
                / F.lit(w) - 1,
            ).alias("a"),
            F.least(
                F.lit(n3 / 2.0),
                (F.lit(y_pole) - F.greatest(ycol_lo, F.lit(band)))
                / F.lit(w) + 1,
            ).alias("b"),
        )),
    ).otherwise(F.array().cast("array<struct<face:long,a:double,b:double>>"))
    s_in = F.least(ycol_hi, F.lit(-band)) + F.lit(y_pole)
    s_out = F.greatest(ycol_lo, F.lit(-y_pole)) + F.lit(y_pole)
    south = F.when(
        ycol_lo <= F.lit(-band),
        F.array(F.struct(
            F.lit(5).cast("long").alias("face"),
            F.greatest(
                F.lit(0.0), F.least(s_in, s_out) / F.lit(w) - 1
            ).alias("a"),
            F.least(
                F.lit(n3 / 2.0), F.greatest(s_in, s_out) / F.lit(w) + 1
            ).alias("b"),
        )),
    ).otherwise(F.array().cast("array<struct<face:long,a:double,b:double>>"))
    capdf = (
        spans.select("zone", F.explode(F.concat(north, south)).alias("c"))
        .select("zone", "c.face", "c.a", "c.b")
    )
    bboxes = heads.groupBy("zone").agg(
        ((F.min("lon_lo") + F.max("lon_hi")) / 2.0).alias("lam_mid"),
        ((F.max("lon_hi") - F.min("lon_lo")) / 2.0).alias("lam_half"),
    )
    gj = _cap_candidate_cells(capdf, bboxes, cfg, res)
    return keyed.unionByName(
        gj.select(
            "zone",
            _interleave_idx(
                cfg, res, F.col("face"), F.col("fi"), F.col("fj")
            ).alias("_idx"),
        )
    )


def fleet_edges(resolved: DataFrame) -> DataFrame:
    """Edge table (zone, part, ring, x1, y1, x2, y2) of a resolved
    vertex fleet via lead() + wrap-around closing edge. A duplicated
    closing vertex only adds degenerate y1 == y2 edges, which the
    even-odd crossing predicate ignores — kernel parity. Shared by
    polyfill_many_df (centroid membership) and polygon_join_df
    (point containment)."""
    from pyspark.sql.window import Window

    w_ring = Window.partitionBy("zone", "part", "ring").orderBy("vtx")
    w_all = w_ring.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return resolved.select(
        "zone", "part", "ring",
        F.col("lon").alias("x1"), F.col("lat").alias("y1"),
        F.coalesce(
            F.lead("lon").over(w_ring), F.first("lon").over(w_all)
        ).alias("x2"),
        F.coalesce(
            F.lead("lat").over(w_ring), F.first("lat").over(w_all)
        ).alias("y2"),
    )


def even_odd_membership(
    pts: DataFrame, edges: DataFrame, keys: list[str],
    x_col: str = "cx", y_col: str = "cy",
) -> DataFrame:
    """Relational even-odd point-in-polygon over a (point x zone)
    candidate table: `pts` rows equi-join the edge table on zone,
    each edge contributes the kernel's crossing predicate
    ((y1 > y) != (y2 > y)) AND x < (x2-x1)*(y-y1)/(y2-y1)+x1
    (kernel/regions.py:336-362, bit-identical arithmetic), and a
    two-level parity aggregation applies ext-odd AND NOT hole-odd per
    part, OR over multipolygon parts. Returns the distinct `keys`
    rows that are inside. Everything stays JVM-side whole-stage
    codegen."""
    j = pts.join(edges, "zone")
    yv, xv = F.col(y_col), F.col(x_col)
    crosses = (F.col("y1") > yv) != (F.col("y2") > yv)
    xin = (
        (F.col("x2") - F.col("x1")) * (yv - F.col("y1"))
        / (F.col("y2") - F.col("y1")) + F.col("x1")
    )
    hit = crosses & (xv < xin)
    per_ring = j.groupBy(*keys, "part", "ring").agg(
        ((F.sum(hit.cast("long")) % 2) == 1).alias("odd")
    )
    per_part = per_ring.groupBy(*keys, "part").agg(
        F.max(F.when(F.col("ring") == 0, F.col("odd"))).alias("in_ext"),
        F.coalesce(
            F.max(F.when(F.col("ring") > 0, F.col("odd"))), F.lit(False)
        ).alias("in_hole"),
    )
    return (
        per_part.where(F.col("in_ext") & ~F.col("in_hole"))
        .select(*keys)
        .distinct()
    )


def polyfill_many_df(
    spark: SparkSession,
    polygons: DataFrame,
    res: int,
    cfg: DggsConfig = WGS84_003,
    partitions: int | None = None,
    split_dateline: bool | None = None,
) -> DataFrame:
    """DataFrame-NATIVE polygon-fleet polyfill: same semantics as
    polyfill_many (centroid-in-polygon membership, rhp_wrappers.py:
    510-599; band spans + closed-form cap annuli + nucleus-lon prune)
    but the polygons arrive as a VERTEX TABLE
    (zone, part, ring, vtx, lon, lat) — ring 0 the exterior, rings
    >= 1 holes — so NOTHING about the fleet ever lives on the driver:
    no span loop, no vertex-list closure pickled into tasks. A
    10^6-polygon continental parcel fleet is just a bigger input
    table; driver memory stays flat.

    Plan shape (all equi-joins and aggregations, no nested-loop):
      1. dateline resolve: vertices collect_list into one array per
         (zone, part) — a JVM partial-aggregation shuffle — and ONE
         Arrow-batched pandas_udf applies the exact kernel
         split_antimeridian per polygon (plain Python loops over the
         batch, microseconds per small ring; split parts get ids
         part*64 + i), exploding back to vertex rows. No per-group
         pandas overhead: a 100k-polygon fleet resolves in one pass.
      2. per-part exterior bbox stats are a plain JVM aggregation;
         the HEALPix y of the lat extremes is one tiny Arrow pass
         over the per-part rows; band row/column spans and cap annuli
         are then pure column math, sequence-exploded exactly like
         polyfill_many (shared _interleave_idx / _cap_candidate_cells
         helpers).
      3. membership replaces the driver-closure even-odd UDF with a
         RELATIONAL even-odd: candidates equi-join the edge table on
         zone, each edge contributes the kernel's crossing predicate
         ((y1 > cy) != (y2 > cy)) AND cx < (x2-x1)*(cy-y1)/(y2-y1)+x1
         (kernel/regions.py:336-362, bit-identical arithmetic), and a
         two-level parity aggregation applies ext-odd AND NOT
         hole-odd per part. Everything stays JVM-side whole-stage
         codegen; the only Python is the geometry decode kernels.

    split_dateline=None auto-splits crossing rings; True forces the
    split; False raises (inside the distributed resolve stage) if any
    ring crosses. Output: (tile_id, res, zone), distinct."""
    from ..functions.udfs import rhp_centroid

    if partitions:
        polygons = polygons.repartition(partitions, "zone", "part")

    # resolved feeds THREE consumers (candidate spans, the distinct-
    # cell decode, and the even-odd edge table); persist() — lazily —
    # so the collect_list + Arrow dateline-split + explode runs once
    # per action, not three times. The vertex table is the operator's
    # own input size; MEMORY_AND_DISK spills rather than OOMs.
    from pyspark import StorageLevel

    resolved = resolve_fleet_vertices(
        polygons, cfg, split_dateline, "polyfill_many_df"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    keyed = fleet_candidate_idx(resolved, cfg, res)

    @pandas_udf(T.StringType())
    def idx_to_suid(ix: pd.Series) -> pd.Series:
        face_a, digits = KC.suid_from_level_order_index(
            cfg, ix.to_numpy(dtype=np.int64), res
        )
        return pd.Series(KC.suid_strings(face_a, digits), index=ix.index)

    # Decode each DISTINCT cell once, not once per (zone, cell) pair:
    # overlapping fleets share cells, so the candidate pair table is
    # usually many times larger than the distinct-cell set (100k
    # bench triangles: 1.5M pairs, 486 res-2 cells). The expensive
    # Arrow GL centroid pass runs on the distinct cells only; pairs
    # re-attach by the 8-byte _idx equi-join (AQE broadcasts the cell
    # table when it is small). Round-robin fan-out keeps AQE from
    # serializing the compute-heavy GL pass onto one task (hash keys
    # would dedupe against the distinct's Exchange), same as
    # polyfill_many.
    # The pair table feeds BOTH branches (distinct cells for the
    # decode, pairs for the re-attach join); persist() it — lazily —
    # so the dateline-resolve + candidate-generation lineage runs
    # ONCE per action instead of twice. The cached table is (zone,
    # int64) pairs, bounded by the operator's own output size, and
    # MEMORY_AND_DISK spills rather than OOMs on huge fleets.
    pairs = keyed.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    fanout = keyed.sparkSession.sparkContext.defaultParallelism
    cells = (
        pairs.select("_idx").distinct()
        .repartition(fanout)
        .select("_idx", idx_to_suid(F.col("_idx")).alias("tile_id"))
        .withColumn("_c", rhp_centroid(F.col("tile_id"), cfg, plane=False))
        .select(
            "_idx", "tile_id",
            F.col("_c")["lon"].alias("cx"), F.col("_c")["lat"].alias("cy"),
        )
    )
    cand = pairs.join(cells, "_idx").select("zone", "tile_id", "cx", "cy")

    # Relational even-odd on the candidate CENTROIDS (shared helpers;
    # the edge table's duplicated closing vertices only add degenerate
    # y1==y2 edges, which the crossing predicate ignores — kernel
    # parity).
    inside = even_odd_membership(
        cand, fleet_edges(resolved), ["zone", "tile_id"]
    )
    return inside.select(
        "tile_id",
        (F.length("tile_id") - 1).cast("int").alias("res"),
        "zone",
    )


def region_cover_df(
    spark: SparkSession,
    res: int,
    nw: tuple[float, float],
    se: tuple[float, float],
    cfg: DggsConfig = WGS84_003,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed closed-form planar region cover (the SURVEY section
    2.6 plan): planar res-k cells form a regular lattice over the
    rHEALPix image, so the cover of a planar rect is a 2D spark.range
    cross of the corner cells' row/col spans — no neighbor walking, no
    driver loop. Cell centers outside the image (beyond the polar
    squares) encode to null and are filtered.

    Matches the kernel/reference cells_from_region planar matrix
    (dggs.py:1181-1297 semantics) row-major as (row_i, col_i, cell_id);
    scales to covers of any size (e.g. a whole-planet res-9 cover is
    2.3e9 rows of pure column math + one encode pass)."""
    import math

    from ..functions.udfs import rhp_encode

    w = cfg.cell_width(res)
    x_min, y_max = cfg.R_A * -np.pi, cfg.R_A * (3 * np.pi / 4)
    col0 = math.floor((nw[0] - x_min) / w)
    col1 = math.floor((se[0] - x_min) / w)
    row0 = math.floor((y_max - nw[1]) / w)
    row1 = math.floor((y_max - se[1]) / w)
    ncols = col1 - col0 + 1
    nrows = row1 - row0 + 1
    grid = spark.range(0, nrows * ncols, numPartitions=partitions).select(
        (F.col("id") / ncols).cast("long").alias("row_i"),
        (F.col("id") % ncols).alias("col_i"),
    )
    x = F.lit(x_min) + (F.col("col_i") + col0 + F.lit(0.5)) * F.lit(w)
    y = F.lit(y_max) - (F.col("row_i") + row0 + F.lit(0.5)) * F.lit(w)
    return grid.select(
        "row_i",
        "col_i",
        rhp_encode(x, y, res, cfg, plane=True).alias("cell_id"),
    ).where(F.col("cell_id").isNotNull())
