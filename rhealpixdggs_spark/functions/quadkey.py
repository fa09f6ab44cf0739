"""Bing-maps quadkey (Web-Mercator tile) encoding as pure column
expressions — the FOURTH cross-index family next to S2 (kernel/s2.py),
hex7 (kernel/hex7.py) and geohash (functions/geohash.py), for joining
rHEALPix-tiled tables against the web-map/tile-server datasets keyed
by z/x/y tiles or quadkeys.

A quadkey at level L names one Web-Mercator tile: the point is
projected to normalized mercator coordinates x = (lon+180)/360,
y = 0.5 - ln((1+sin phi)/(1-sin phi))/(4 pi) with latitude clamped to
+/- 85.05112878 (the square-map cutoff), tile indices are
floor(x * 2^L) clamped to [0, 2^L - 1], and character c of the key is
the base-4 digit (tx_bit | ty_bit << 1) at bit L-1-c — so each prefix
of a quadkey IS the parent tile, exactly like an rHEALPix suid prefix.
The usual implementation loops per level; here both tile indices are
closed-form and the digit extraction is a fixed shift/mask sum, so the
whole encode fuses into the scan's codegen stage — no UDF, no Python.
The DuckDB twin re-derives the identical arithmetic (same op order, so
the float path — sin, ln, the divisions — rounds identically).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Web-Mercator latitude cutoff: the latitude whose mercator y reaches
# the square map edge, atan(sinh(pi)) in degrees (public constant from
# the Bing tile-system documentation).
MERCATOR_MAX_LAT = 85.05112878
_FOUR_PI = repr(4.0 * math.pi)


def _tile_indices(lon: Column, lat: Column, level: int) -> tuple[Column, Column]:
    """Closed-form Web-Mercator tile indices (tx, ty) at `level`,
    clamped to [0, 2^level - 1]. The clamp absorbs both the lat
    cutoff edge and lon == 180."""
    n = 1 << level
    lat_c = F.greatest(
        F.least(lat, F.lit(MERCATOR_MAX_LAT)), F.lit(-MERCATOR_MAX_LAT)
    )
    x = (lon + F.lit(180.0)) / F.lit(360.0)
    sinlat = F.sin(F.radians(lat_c))
    y = F.lit(0.5) - F.log((F.lit(1.0) + sinlat) / (F.lit(1.0) - sinlat)) / F.lit(
        float(_FOUR_PI)
    )
    tx = F.floor(x * F.lit(float(n))).cast("long")
    ty = F.floor(y * F.lit(float(n))).cast("long")
    clamp = lambda c: F.greatest(F.least(c, F.lit(n - 1)), F.lit(0))  # noqa: E731
    return clamp(tx), clamp(ty)


def quadkey_encode(lon: Column, lat: Column, level: int = 12) -> Column:
    """Quadkey string of (lon, lat) at `level` characters (level <= 30).
    Character c is base-4 digit ((tx >> L-1-c) & 1) + 2*((ty >> L-1-c) & 1);
    prefixes are parent tiles, so substring(qk, 1, r) rolls up to
    level r exactly like substring(cell_id, 1, r+1) does for suids."""
    tx, ty = _tile_indices(lon, lat, level)
    chars = []
    for c in range(level):
        b = level - 1 - c
        digit = (
            F.shiftright(tx, b).bitwiseAND(F.lit(1))
            + F.shiftleft(F.shiftright(ty, b).bitwiseAND(F.lit(1)), 1)
        ).cast("int")
        chars.append(F.substring(F.lit("0123"), digit + 1, 1))
    return F.concat(*chars)


def quadkey_sql_parts(level: int = 12) -> dict[str, str]:
    """DuckDB SQL fragments computing the IDENTICAL quadkey in stages
    (the oracle twin chains them through CTEs): 'tx'/'ty' from columns
    lon/lat (same clamp, same float op order — radians() on both
    engines, the same 4*pi literal), and 'qk' from columns tx/ty
    (same shift/mask digit extraction and '0123' substr decode)."""
    n = 1 << level
    lat_c = (
        f"greatest(least(lat, {MERCATOR_MAX_LAT!r}), {-MERCATOR_MAX_LAT!r})"
    )
    x = "((lon + 180.0) / 360.0)"
    sinlat = f"sin(radians({lat_c}))"
    y = f"(0.5 - ln((1.0 + {sinlat}) / (1.0 - {sinlat})) / {_FOUR_PI})"
    tx = (
        f"greatest(least(CAST(floor({x} * {float(n)!r}) AS BIGINT), "
        f"{n - 1}), 0)"
    )
    ty = (
        f"greatest(least(CAST(floor({y} * {float(n)!r}) AS BIGINT), "
        f"{n - 1}), 0)"
    )
    qk = " || ".join(
        f"substr('0123', CAST(((tx >> {level - 1 - c}) & 1) + "
        f"2 * ((ty >> {level - 1 - c}) & 1) + 1 AS INT), 1)"
        for c in range(level)
    )
    return {"tx": tx, "ty": ty, "qk": f"({qk})"}
