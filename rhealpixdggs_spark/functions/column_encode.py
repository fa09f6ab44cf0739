"""Pure-JVM rHEALPix encode — whole-stage-codegen, no Python worker.

STATUS: measured, tested, NOT the pipeline default. Read the trade-off
below before using it.

The geodetic -> suid encode (dggs.py:737-831 via the authalic series
utils.py:177-255, HEALPix forward pj_healpix.py:101-155 and the polar
cube-face reassembly pj_rhealpix.py:77-156) is closed-form arithmetic,
so it is expressible entirely as Catalyst column expressions: radians,
a 6-term sine series, one sqrt, a face-dispatch CASE and two floor
divisions. No Python worker, no Arrow transfer — the encode fuses into
the same codegen stage as the scan and aggregation. Measured on bare
scan->encode->aggregate chains at res 9: 17.5 M pts/s at local[8]
vs 11.1 M for the Arrow kernel (1.57x/core), converging to the same
~24 M/s single-box memory-bus ceiling at local[32].

Why it is not the default: Catalyst pays a LARGE fixed planning cost
for the staged expression DAG when this transformer is composed into
bigger plans. The encode needs ~19 chained projections whose aliases
reference earlier intermediates several times; physical planning
(ScanOperation / AliasHelper.trimAliases) substitutes alias chains
into consumers, re-expanding the shared DAG into a tree — measured
seconds per query at res 9 (and minutes for join+cache compositions
before the nondeterministic barrier below was added). The Arrow kernel
(functions.udfs.rhp_encode*) keeps the whole encode opaque in one plan
node, so the production pipeline uses it; this module is the right
choice only for long-running simple chains where +1.6x/core outweighs
a ~5 s one-time planning cost.

API shape: a DataFrame transformer (`with_rhp_index` /
`with_rhp_cell`), NOT a single Column expression — a one-expression
formulation embeds the exponentially-expanded tree directly and stalls
the ANALYZER as well (measured: minutes at res 9).

Numerics: identical operation order to the generated DuckDB oracle SQL
(oracle_sql.rhp_encode_sql), which is bit-exact against the NumPy
kernel. The JVM's trig can differ from glibc libm by <=1 ulp, which
flips a cell only for points within ~1e-10 cell-widths of a boundary —
tests/test_column_encode.py measures 0 mismatches on 10^6 random
points vs the Arrow kernel. The Arrow kernel remains the bit-exactness
reference used by the driver contract queries.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.constants import WGS84_003, DggsConfig
from ..oracle_sql import _series_coeffs

_PI = math.pi
_TMP = [
    "_re_lam", "_re_phi", "_re_beta", "_re_sigma", "_re_hx", "_re_hy",
    "_re_region", "_re_c", "_re_t", "_re_dx0", "_re_dy0", "_re_rx",
    "_re_ry", "_re_x", "_re_y", "_re_band", "_re_face", "_re_drow",
    "_re_dcol",
]


def _ndb(col: Column) -> Column:
    """JVM-side nondeterministic identity (shuffle of a 1-element
    array): a PLANNING BARRIER. ScanOperation/CollapseProject inline
    deterministic alias chains by substitution, which re-expands the
    staged projection DAG into one exponentially-sized scan expression
    (AliasHelper.trimAliases recursion — measured minutes of planning
    on a join of two encode branches). A nondeterministic project is
    never collapsed through, exactly like the asNondeterministic()
    marker on the Arrow kernels, at ~zero runtime cost. Trade-off:
    outer filters cannot push below the encode (the pipeline filters
    before encoding anyway)."""
    return F.element_at(F.shuffle(F.array(col)), 1)


def _project_stages(df: DataFrame, lon: Column, lat: Column,
                    cfg: DggsConfig, wrap: bool) -> DataFrame:
    """Append staged projection columns _re_face/_re_drow/_re_dcol
    (resolution-independent planar coordinates come first).

    The column port hardcodes the default frame: degree input
    (F.radians below), +/-180 wrap, lon_0 = lat_0 = 0, and
    north_square = south_square = 0 in the face dispatch and UL-vertex
    band arithmetic. The Arrow kernel honors cfg.radians / lon_0 /
    north_square (kernel/rhealpix.py, kernel/cells.py); until this
    port derives those from cfg too, reject configs it would silently
    mis-encode (e.g. WGS84_003_RADIANS, UNIT_003_RADIANS, shifted
    polar squares)."""
    if (
        cfg.radians
        or cfg.north_square != 0
        or cfg.south_square != 0
        or cfg.lon_0 != 0.0
        or cfg.lat_0 != 0.0
    ):
        raise ValueError(
            "column_encode supports only degree-input configs with "
            "lon_0=lat_0=0 and north_square=south_square=0; use the "
            "Arrow kernel path (functions.udfs.rhp_encode) for "
            f"config {cfg!r}"
        )
    c2, c4, c6, c8, c10, c12 = _series_coeffs(cfg.e)
    R = float(cfg.R_A)
    Rp4, R3p4 = R * _PI / 4, R * 3 * _PI / 4
    Rp2, Rpi = R * _PI / 2, R * _PI
    if wrap:
        lon = F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
    d = df.withColumns({"_re_lam": F.radians(lon), "_re_phi": F.radians(lat)})
    phi = F.col("_re_phi")
    d = d.withColumns(
        {
            "_re_beta": phi
            + (
                F.lit(c2) * F.sin(2 * phi)
                + F.lit(c4) * F.sin(4 * phi)
                + F.lit(c6) * F.sin(6 * phi)
                + F.lit(c8) * F.sin(8 * phi)
                + F.lit(c10) * F.sin(10 * phi)
                + F.lit(c12) * F.sin(12 * phi)
            )
        }
    )
    beta, lam = F.col("_re_beta"), F.col("_re_lam")
    d = d.withColumns({"_re_sigma": F.sqrt(3 * (1 - F.abs(F.sin(beta))))})
    sigma = F.col("_re_sigma")
    lamc = F.lit(-3 * _PI / 4) + F.lit(_PI / 2) * F.least(
        F.floor(2 * lam / F.lit(_PI) + 2).cast("double"), F.lit(3.0)
    )
    eq = F.abs(beta) <= F.lit(math.asin(2.0 / 3))
    d = d.withColumns(
        {
            "_re_hx": F.when(eq, lam).otherwise(lamc + (lam - lamc) * sigma),
            "_re_hy": F.when(eq, F.lit(3 * _PI / 8) * F.sin(beta)).otherwise(
                F.signum(beta) * F.lit(_PI) / 4 * (2 - sigma)
            ),
        }
    )
    hx, hy = F.col("_re_hx"), F.col("_re_hy")
    p14, p12 = _PI / 4, _PI / 2
    d = d.withColumns(
        {
            "_re_region": F.when(hy > F.lit(p14), F.lit(1))
            .when(hy < F.lit(-p14), F.lit(2))
            .otherwise(F.lit(0)),
            "_re_c": F.least(
                F.greatest(F.floor(hx / F.lit(p12)) + 2, F.lit(0)), F.lit(3)
            ).cast("int"),
        }
    )
    region, c = F.col("_re_region"), F.col("_re_c")
    d = d.withColumns(
        {
            "_re_dx0": hx - (F.lit(-3 * _PI / 4) + F.lit(p12) * c),
            "_re_dy0": F.when(region == 1, hy - F.lit(p12)).otherwise(
                hy + F.lit(p12)
            ),
            "_re_t": F.when(region == 1, c % 4).otherwise((4 - c) % 4),
        }
    )
    dx0, dy0, t = F.col("_re_dx0"), F.col("_re_dy0"), F.col("_re_t")
    rot_x = (
        F.when(t == 0, dx0).when(t == 1, -dy0).when(t == 2, -dx0).otherwise(dy0)
    )
    rot_y = (
        F.when(t == 0, dy0).when(t == 1, dx0).when(t == 2, -dy0).otherwise(-dx0)
    )
    # The unscaled CaseWhen trees get their own projection stage; the
    # R-scaling in the next stage then multiplies a plain ATTRIBUTE.
    # Multiplying a literal into an inline nested CaseWhen instead
    # makes the PushFoldableIntoBranches optimizer rule duplicate the
    # foldable into every (nested) branch — exponential expression
    # growth that stalls optimization for minutes.
    d = d.withColumns(
        {
            "_re_rx": F.when(region == 0, hx).otherwise(
                rot_x + F.lit(-3 * _PI / 4)
            ),
            "_re_ry": F.when(region == 0, hy).otherwise(
                rot_y + F.when(region == 1, F.lit(p12)).otherwise(F.lit(-p12))
            ),
        }
    )
    d = d.withColumns(
        {
            "_re_x": _ndb(F.lit(R) * F.col("_re_rx")),
            "_re_y": _ndb(F.lit(R) * F.col("_re_ry")),
        }
    )
    X, Y = F.col("_re_x"), F.col("_re_y")
    d = d.withColumns(
        {
            "_re_band": F.least(
                F.greatest(F.floor((X + F.lit(Rpi)) / F.lit(Rp2)), F.lit(0)),
                F.lit(3),
            )
        }
    )
    band = F.col("_re_band")
    in_n = (Y > Rp4) & (Y < R3p4) & (X > -Rpi) & (X < -Rp2)
    in_s = (Y > -R3p4) & (Y < -Rp4) & (X > -Rpi) & (X < -Rp2)
    in_eq = (Y >= -Rp4) & (Y <= Rp4) & (X >= -Rpi) & (X < Rpi)
    d = d.withColumns(
        {
            "_re_face": F.when(in_n, F.lit(0))
            .when(in_s, F.lit(5))
            .when(in_eq, (band + 1).cast("int"))
            .otherwise(F.lit(-1))
        }
    )
    return d


def _digit_stage(d: DataFrame, res: int, cfg: DggsConfig) -> DataFrame:
    """Add _re_drow/_re_dcol (within-face digit indices at `res`) with
    the reference's right/bottom-edge smidgen nudge (dggs.py:768-831).
    The UL corner comes from band arithmetic, never from a face CASE."""
    R = float(cfg.R_A)
    Rp4, R3p4 = R * _PI / 4, R * 3 * _PI / 4
    Rp2, Rpi = R * _PI / 2, R * _PI
    X, Y, band = F.col("_re_x"), F.col("_re_y"), F.col("_re_band")
    ul_x = F.lit(-Rpi) + F.lit(Rp2) * band.cast("double")
    ul_y = (
        F.when(Y > Rp4, F.lit(R3p4))
        .when(Y >= -Rp4, F.lit(Rp4))
        .otherwise(F.lit(-Rp4))
    )
    w0 = R * (_PI / 2)
    smidgen = 0.5 * cfg.cell_width(cfg.max_resolution) / w0
    dxf = F.abs(X - ul_x) / F.lit(w0)
    dyf = F.abs(Y - ul_y) / F.lit(w0)
    dxq = F.when(dxf == 1.0, dxf - F.lit(smidgen)).otherwise(dxf)
    dyq = F.when(dyf == 1.0, dyf - F.lit(smidgen)).otherwise(dyf)
    scale = float(cfg.N_side**res)
    hi = cfg.N_side**res - 1
    return d.withColumns(
        {
            "_re_drow": F.least(
                F.greatest(F.floor(dyq * F.lit(scale)), F.lit(0)), F.lit(hi)
            ).cast("long"),
            "_re_dcol": F.least(
                F.greatest(F.floor(dxq * F.lit(scale)), F.lit(0)), F.lit(hi)
            ).cast("long"),
        }
    )


def with_rhp_index(
    df: DataFrame,
    lon: Column,
    lat: Column,
    resolution: int,
    out: str = "cell_idx",
    cfg: DggsConfig = WGS84_003,
    wrap: bool = True,
) -> DataFrame:
    """df + `out` = packed int64 level-order cell index of (lon, lat),
    100% JVM column math (NULL outside the image or for null input).

    idx = base + face*9^res + 3*spread(drow) + spread(dcol), where
    spread() moves base-3 digits to base-9 positions (the cell.py
    260-267 digit interleave)."""
    d = _digit_stage(
        _project_stages(df, lon, lat, cfg, wrap), resolution, cfg
    )
    face, drow, dcol = F.col("_re_face"), F.col("_re_drow"), F.col("_re_dcol")
    base = cfg.num_cells(0, resolution - 1) if resolution > 0 else 0
    idx = F.lit(base) + face.cast("long") * F.lit((cfg.N_side**2) ** resolution)
    spread_r = F.lit(0).cast("long")
    spread_c = F.lit(0).cast("long")
    for i in range(resolution):
        p3 = cfg.N_side**i
        p9 = (cfg.N_side**2) ** i
        spread_r = spread_r + (F.floor(drow / F.lit(p3)) % 3) * F.lit(p9)
        spread_c = spread_c + (F.floor(dcol / F.lit(p3)) % 3) * F.lit(p9)
    idx = idx + 3 * spread_r + spread_c
    return d.withColumn(
        out, F.when(face >= 0, idx).otherwise(F.lit(None).cast("long"))
    ).drop(*_TMP)


def with_rhp_cell(
    df: DataFrame,
    lon: Column,
    lat: Column,
    resolution: int,
    out: str = "cell_id",
    cfg: DggsConfig = WGS84_003,
    wrap: bool = True,
) -> DataFrame:
    """df + `out` = suid string of (lon, lat), 100% JVM column math."""
    d = _digit_stage(
        _project_stages(df, lon, lat, cfg, wrap), resolution, cfg
    )
    face, drow, dcol = F.col("_re_face"), F.col("_re_drow"), F.col("_re_dcol")
    face_char = F.element_at(
        F.array(*[F.lit(ch) for ch in "NOPQRS"]), face.cast("int") + 1
    )
    parts = [face_char]
    for i in range(1, resolution + 1):
        k = cfg.N_side ** (resolution - i)
        dig = (F.floor(drow / F.lit(k)) % 3) * 3 + F.floor(dcol / F.lit(k)) % 3
        parts.append(dig.cast("int").cast("string"))
    suid = F.concat(*parts)
    return d.withColumn(
        out, F.when(face >= 0, suid).otherwise(F.lit(None).cast("string"))
    ).drop(*_TMP)
