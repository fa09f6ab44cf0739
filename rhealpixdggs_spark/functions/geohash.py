"""Geohash encoding as pure column expressions (JVM, whole-stage
codegen) — the third cross-index family next to S2 (kernel/s2.py) and
hex7 (kernel/hex7.py), for joining rHEALPix-tiled tables against the
many web/geo datasets keyed by geohash.

A geohash at precision p is 5*p bits: the longitude span bisected
ceil(5p/2) times and the latitude span floor(5p/2) times, the bit
streams interleaved lon-first, then base32-coded 5 bits per character
(Niemeyer's alphabet, '0123456789bcdefghjkmnpqrstuvwxyz'). The usual
implementation is an iterative bisection loop; both index extractions
are closed-form here (ix = floor((lon+180)/360 * 2^nlon)), and the
interleave is a fixed sum of shift/mask terms, so the whole encode
fuses into the scan's codegen stage — no UDF, no Python. The DuckDB
twin re-derives the identical arithmetic (same op order, so the float
divisions round identically).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _axis_index(coord: Column, lo: float, span: float, nbits: int) -> Column:
    """floor((coord - lo) / span * 2^nbits), clamped to [0, 2^nbits-1].
    The clamp absorbs the coord == hi edge (lon=180, lat=90)."""
    raw = F.floor((coord - F.lit(float(lo))) / F.lit(float(span)) * F.lit(float(1 << nbits))).cast("long")
    return F.greatest(F.least(raw, F.lit((1 << nbits) - 1)), F.lit(0))


def geohash_interleaved(lon: Column, lat: Column, precision: int) -> Column:
    """The 5*precision interleaved bits as one int64 (precision <= 12).
    Bit 0 of the geohash (most significant, an even position) comes
    from the longitude MSB; odd positions from latitude."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    ix = _axis_index(lon, -180.0, 360.0, nlon)
    iy = _axis_index(lat, -90.0, 180.0, nlat)
    g = F.lit(0).cast("long")
    for k in range(nlon):  # lon bit k (0 = MSB) -> geohash bit 2k
        g = g + F.shiftleft(
            F.shiftright(ix, nlon - 1 - k).bitwiseAND(F.lit(1)),
            nbits - 1 - 2 * k,
        )
    for k in range(nlat):  # lat bit k -> geohash bit 2k+1
        g = g + F.shiftleft(
            F.shiftright(iy, nlat - 1 - k).bitwiseAND(F.lit(1)),
            nbits - 2 - 2 * k,
        )
    return g


def geohash_encode(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Geohash string of (lon, lat) at `precision` characters."""
    g = geohash_interleaved(lon, lat, precision)
    chars = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (F.shiftright(g, 5 * (precision - 1 - c)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql_parts(precision: int = 7) -> dict[str, str]:
    """DuckDB SQL fragments computing the IDENTICAL geohash in stages
    (the oracle twin chains them through CTEs so the big shift/mask
    sums are written once): 'ix'/'iy' from columns lon/lat (same
    closed-form axis index, same float op order so the divisions
    round identically), 'g' from columns ix/iy (same interleave), and
    'gh' from column g (same base32 substr decode)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    ix = (
        f"greatest(least(CAST(floor((lon - -180.0) / 360.0 * "
        f"{float(1 << nlon)!r}) AS BIGINT), {(1 << nlon) - 1}), 0)"
    )
    iy = (
        f"greatest(least(CAST(floor((lat - -90.0) / 180.0 * "
        f"{float(1 << nlat)!r}) AS BIGINT), {(1 << nlat) - 1}), 0)"
    )
    terms = [
        f"(((ix >> {nlon - 1 - k}) & 1) << {nbits - 1 - 2 * k})"
        for k in range(nlon)
    ] + [
        f"(((iy >> {nlat - 1 - k}) & 1) << {nbits - 2 - 2 * k})"
        for k in range(nlat)
    ]
    gh = " || ".join(
        f"substr('{GEOHASH_BASE32}', CAST(((g >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    )
    return {"ix": ix, "iy": iy, "g": "(" + " + ".join(terms) + ")", "gh": f"({gh})"}
