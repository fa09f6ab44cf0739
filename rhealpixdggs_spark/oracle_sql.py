"""ANSI-SQL rHEALPix encoder generator (the DuckDB oracle).

Emits a pure-SQL pipeline computing the same point->cell encode as the
NumPy kernel (and hence the reference), for the WGS84_003 DGGS
(N_side=3, north_square=south_square=0, degrees). Every constant is
pre-folded in Python with the exact floating-point op order of the
kernel/reference (utils.py:177-255, pj_healpix.py:30-61,
pj_rhealpix.py:51-117, dggs.py:737-831), so the SQL and the kernel
agree bit-for-bit except at most 1-ulp libm differences — which can
only flip a digit for points within ~1e-10 cell widths of a border.

This gives the driver's correctness gate an implementation of the
encoder that shares no code with the engine."""

from __future__ import annotations

import math

from .kernel.constants import WGS84_003

_E = WGS84_003.e
_R = WGS84_003.R_A
_PI = math.pi


def _series_coeffs(e: float) -> list[float]:
    """Fold the A19 forward-series coefficients exactly as the
    reference nests them (utils.py:182-255)."""
    n = (1 - math.sqrt(1 - e**2)) / (1 + math.sqrt(1 - e**2))
    c2 = n * (
        -4 / 3
        + n * (-4 / 45 + n * (88 / 315 + n * (538 / 4725 + n * (20824 / 467775 + n * (-44732 / 2837835)))))
    )
    c4 = n * (
        n * (34 / 45 + n * (8 / 105 + n * (-2482 / 14175 + n * (-37192 / 467775 + n * (-12467764 / 212837625)))))
    )
    c6 = n * (
        n * (n * (-1532 / 2835 + n * (-898 / 14175 + n * (54968 / 467775 + n * 100320856 / 1915538625))))
    )
    c8 = n * (n * (n * (n * (6007 / 14175 + n * (24496 / 467775 + n * (-5884124 / 70945875))))))
    c10 = n * (n * (n * (n * (n * (-23356 / 66825 + n * (-839792 / 19348875))))))
    c12 = n * (n * (n * (n * (n * (n * 570284222 / 1915538625)))))
    return [c2, c4, c6, c8, c10, c12]


def _r(x: float) -> str:
    """Float literal that DuckDB parses as DOUBLE. Bare decimals parse
    as DECIMAL and make constant subexpressions evaluate in decimal
    arithmetic (caught as a 2-ulp nucleus shift flipping a pole-branch
    CASE); an exponent forces the double parser."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) else s + "e0"


def rhp_encode_sql(source_sql: str, res: int, keep_cols: str = "pid") -> str:
    """Return a SQL query computing `cell_id` at resolution `res` for
    a source relation exposing columns lon, lat (degrees) plus
    `keep_cols` (comma-separated passthrough columns)."""
    c2, c4, c6, c8, c10, c12 = map(_r, _series_coeffs(_E))
    pi = _r(_PI)
    phi0 = _r(math.asin(2.0 / 3))
    y38 = _r(3 * _PI / 8)
    a34 = _r(-3 * _PI / 4)  # -3pi/4
    p12 = _r(_PI / 2)
    p14 = _r(_PI / 4)
    # Face-dispatch thresholds, folded with the kernel's op order
    # (dggs.py:768-795 via encode_planar).
    Rp4 = _r(_R * _PI / 4)
    R3p4 = _r(_R * 3 * _PI / 4)
    Rp2 = _r(_R * (-_PI / 2 + 0 * (_PI / 2)))  # -R*pi/2 (ns=ss=0 fold)
    Rpi = _r(_R * (-_PI + 0 * (_PI / 2)))  # -R*pi
    Rp2_pos = _r(_R * _PI / 2)
    Rpi_pos = _r(_R * _PI)
    # UL vertices (dggs.py:266-277 scaled) and widths.
    ulN = (_r(_R * (-_PI + 0 * _PI / 2)), _r(_R * (3 * _PI / 4)))
    ulO = (_r(_R * -_PI), _r(_R * (_PI / 4)))
    ulP = (_r(_R * (-_PI / 2)), _r(_R * (_PI / 4)))
    ulQ = (_r(_R * 0.0), _r(_R * (_PI / 4)))
    ulR = (_r(_R * (_PI / 2)), _r(_R * (_PI / 4)))
    ulS = (_r(_R * (-_PI + 0 * _PI / 2)), _r(_R * (-_PI / 4)))
    w0 = _R * (_PI / 2) * 3.0 ** (-0)
    smidgen = _r(0.5 * WGS84_003.cell_width(WGS84_003.max_resolution) / w0)
    w0r = _r(w0)
    scale = 3**res

    digit_exprs = []
    for i in range(1, res + 1):
        k = 3 ** (res - i)
        digit_exprs.append(
            f"CAST(((drow // {k}) % 3) * 3 + ((dcol // {k}) % 3) AS VARCHAR)"
        )
    suid_concat = " || ".join(["face_char"] + digit_exprs) if res > 0 else "face_char"

    return f"""
WITH pts AS ({source_sql}),
s1 AS (SELECT {keep_cols}, radians(lon) AS lam, radians(lat) AS phi FROM pts),
s2 AS (SELECT {keep_cols}, lam,
  phi + ({c2}*sin(2*phi) + {c4}*sin(4*phi) + {c6}*sin(6*phi)
       + {c8}*sin(8*phi) + {c10}*sin(10*phi) + {c12}*sin(12*phi)) AS beta
  FROM s1),
s3 AS (SELECT {keep_cols}, lam, beta,
  sqrt(3*(1 - abs(sin(beta)))) AS sigma,
  {a34} + {p12}*least(floor(2*lam/{pi} + 2), 3) AS lamc
  FROM s2),
s4 AS (SELECT {keep_cols},
  CASE WHEN abs(beta) <= {phi0} THEN lam
       ELSE lamc + (lam - lamc)*sigma END AS hx,
  CASE WHEN abs(beta) <= {phi0} THEN {y38}*sin(beta)
       ELSE sign(beta)*{pi}/4*(2 - sigma) END AS hy
  FROM s3),
s5 AS (SELECT {keep_cols}, hx, hy,
  CASE WHEN hy > {p14} THEN 1 WHEN hy < -{p14} THEN 2 ELSE 0 END AS region,
  CASE WHEN hx < -{p12} THEN 0 WHEN hx < 0 THEN 1
       WHEN hx < {p12} THEN 2 ELSE 3 END AS c
  FROM s4),
s6 AS (SELECT {keep_cols}, hx, hy, region, c,
  hx - ({a34} + {p12}*c) AS dx0,
  CASE WHEN region = 1 THEN hy - {p12} ELSE hy + {p12} END AS dy0,
  CASE WHEN region = 1 THEN c % 4 ELSE (4 - c) % 4 END AS t
  FROM s5),
s7 AS (SELECT {keep_cols},
  CASE WHEN region = 0 THEN hx ELSE
    (CASE t WHEN 0 THEN dx0 WHEN 1 THEN -dy0 WHEN 2 THEN -dx0 ELSE dy0 END)
    + {a34} END AS rx,
  CASE WHEN region = 0 THEN hy ELSE
    (CASE t WHEN 0 THEN dy0 WHEN 1 THEN dx0 WHEN 2 THEN -dy0 ELSE -dx0 END)
    + (CASE WHEN region = 1 THEN {p12} ELSE -{p12} END) END AS ry
  FROM s6),
s8 AS (SELECT {keep_cols}, {_r(_R)}*rx AS X, {_r(_R)}*ry AS Y FROM s7),
s9 AS (SELECT {keep_cols}, X, Y,
  CASE
    WHEN Y > {Rp4} AND Y < {R3p4} AND X > {Rpi} AND X < {Rp2} THEN 0
    WHEN Y > -{R3p4} AND Y < -{Rp4} AND X > {Rpi} AND X < {Rp2} THEN 5
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rpi} AND X < {Rp2} THEN 1
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rp2} AND X < 0 THEN 2
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= 0 AND X < {Rp2_pos} THEN 3
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rp2_pos} AND X < {Rpi_pos} THEN 4
    ELSE -1 END AS face
  FROM s8),
s10 AS (SELECT {keep_cols}, face,
  CASE face WHEN 0 THEN 'N' WHEN 1 THEN 'O' WHEN 2 THEN 'P' WHEN 3 THEN 'Q'
            WHEN 4 THEN 'R' WHEN 5 THEN 'S' ELSE NULL END AS face_char,
  abs(X - CASE face WHEN 0 THEN {ulN[0]} WHEN 1 THEN {ulO[0]} WHEN 2 THEN {ulP[0]}
                    WHEN 3 THEN {ulQ[0]} WHEN 4 THEN {ulR[0]} ELSE {ulS[0]} END) / {w0r} AS dxf,
  abs(Y - CASE face WHEN 0 THEN {ulN[1]} WHEN 1 THEN {ulO[1]} WHEN 2 THEN {ulP[1]}
                    WHEN 3 THEN {ulQ[1]} WHEN 4 THEN {ulR[1]} ELSE {ulS[1]} END) / {w0r} AS dyf
  FROM s9),
s11 AS (SELECT {keep_cols}, face, face_char,
  CASE WHEN dxf = 1 THEN dxf - {smidgen} ELSE dxf END AS dxq,
  CASE WHEN dyf = 1 THEN dyf - {smidgen} ELSE dyf END AS dyq
  FROM s10),
s12 AS (SELECT {keep_cols}, face, face_char,
  least(greatest(CAST(floor(dyq * {float(scale)!r}) AS BIGINT), 0), {scale - 1}) AS drow,
  least(greatest(CAST(floor(dxq * {float(scale)!r}) AS BIGINT), 0), {scale - 1}) AS dcol
  FROM s11)
SELECT {keep_cols},
  CASE WHEN face < 0 THEN NULL ELSE {suid_concat} END AS cell_id
FROM s12
"""


def rhp_encode_planar_sql(source_sql: str, res: int, keep_cols: str = "pid") -> str:
    """suid at `res` for a source relation exposing PLANAR columns X, Y
    (metres in the rHEALPix image): the face-dispatch + digit-floor
    tail of rhp_encode_sql (stages s9-s12; dggs.py:768-831 planar
    branch). Cells outside the image yield NULL."""
    Rp4 = _r(_R * _PI / 4)
    R3p4 = _r(_R * 3 * _PI / 4)
    Rp2 = _r(_R * (-_PI / 2 + 0 * (_PI / 2)))
    Rpi = _r(_R * (-_PI + 0 * (_PI / 2)))
    Rp2_pos = _r(_R * _PI / 2)
    Rpi_pos = _r(_R * _PI)
    ulN = (_r(_R * (-_PI + 0 * _PI / 2)), _r(_R * (3 * _PI / 4)))
    ulO = (_r(_R * -_PI), _r(_R * (_PI / 4)))
    ulP = (_r(_R * (-_PI / 2)), _r(_R * (_PI / 4)))
    ulQ = (_r(_R * 0.0), _r(_R * (_PI / 4)))
    ulR = (_r(_R * (_PI / 2)), _r(_R * (_PI / 4)))
    ulS = (_r(_R * (-_PI + 0 * _PI / 2)), _r(_R * (-_PI / 4)))
    w0 = _R * (_PI / 2) * 3.0 ** (-0)
    smidgen = _r(0.5 * WGS84_003.cell_width(WGS84_003.max_resolution) / w0)
    w0r = _r(w0)
    scale = 3**res
    digit_exprs = []
    for i in range(1, res + 1):
        k = 3 ** (res - i)
        digit_exprs.append(
            f"CAST(((drow // {k}) % 3) * 3 + ((dcol // {k}) % 3) AS VARCHAR)"
        )
    suid_concat = " || ".join(["face_char"] + digit_exprs) if res > 0 else "face_char"
    return f"""
WITH pxy AS ({source_sql}),
t9 AS (SELECT {keep_cols}, X, Y,
  CASE
    WHEN Y > {Rp4} AND Y < {R3p4} AND X > {Rpi} AND X < {Rp2} THEN 0
    WHEN Y > -{R3p4} AND Y < -{Rp4} AND X > {Rpi} AND X < {Rp2} THEN 5
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rpi} AND X < {Rp2} THEN 1
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rp2} AND X < 0 THEN 2
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= 0 AND X < {Rp2_pos} THEN 3
    WHEN Y >= -{Rp4} AND Y <= {Rp4} AND X >= {Rp2_pos} AND X < {Rpi_pos} THEN 4
    ELSE -1 END AS face
  FROM pxy),
t10 AS (SELECT {keep_cols}, face,
  CASE face WHEN 0 THEN 'N' WHEN 1 THEN 'O' WHEN 2 THEN 'P' WHEN 3 THEN 'Q'
            WHEN 4 THEN 'R' WHEN 5 THEN 'S' ELSE NULL END AS face_char,
  abs(X - CASE face WHEN 0 THEN {ulN[0]} WHEN 1 THEN {ulO[0]} WHEN 2 THEN {ulP[0]}
                    WHEN 3 THEN {ulQ[0]} WHEN 4 THEN {ulR[0]} ELSE {ulS[0]} END) / {w0r} AS dxf,
  abs(Y - CASE face WHEN 0 THEN {ulN[1]} WHEN 1 THEN {ulO[1]} WHEN 2 THEN {ulP[1]}
                    WHEN 3 THEN {ulQ[1]} WHEN 4 THEN {ulR[1]} ELSE {ulS[1]} END) / {w0r} AS dyf
  FROM t9),
t11 AS (SELECT {keep_cols}, face, face_char,
  CASE WHEN dxf = 1 THEN dxf - {smidgen} ELSE dxf END AS dxq,
  CASE WHEN dyf = 1 THEN dyf - {smidgen} ELSE dyf END AS dyq
  FROM t10),
t12 AS (SELECT {keep_cols}, face, face_char,
  least(greatest(CAST(floor(dyq * {float(scale)!r}) AS BIGINT), 0), {scale - 1}) AS drow,
  least(greatest(CAST(floor(dxq * {float(scale)!r}) AS BIGINT), 0), {scale - 1}) AS dcol
  FROM t11)
SELECT {keep_cols},
  CASE WHEN face < 0 THEN NULL ELSE {suid_concat} END AS cell_id
FROM t12
"""


def _series_coeffs_inverse(e: float) -> list[float]:
    """Fold the A20 inverse-series coefficients exactly as the
    reference nests them (utils.py:267-338)."""
    n = (1 - math.sqrt(1 - e**2)) / (1 + math.sqrt(1 - e**2))
    c2 = n * (
        4 / 3
        + n * (4 / 45 + n * (-16 / 35 + n * (-2582 / 14175 + n * (60136 / 467775 + n * 28112932 / 212837625))))
    )
    c4 = n * (
        n * (46 / 45 + n * (152 / 945 + n * (-11966 / 14175 + n * (-21016 / 51975 + n * 251310128 / 638512875))))
    )
    c6 = n * (
        n * (n * (3044 / 2835 + n * (3802 / 14175 + n * (-94388 / 66825 + n * (-8797648 / 10945935)))))
    )
    c8 = n * (n * (n * (n * (6059 / 4725 + n * (41072 / 93555 + n * (-1472637812 / 638512875))))))
    c10 = n * (n * (n * (n * (n * (768272 / 467775 + n * 455935736 / 638512875)))))
    c12 = n * (n * (n * (n * (n * (n * 4210684958 / 1915538625)))))
    return [c2, c4, c6, c8, c10, c12]


def rhp_nucleus_sql(cells_sql: str, res: int) -> str:
    """SQL pipeline decoding uniform-resolution suids (column cell_id
    in `cells_sql`) to their ellipsoidal nucleus (n_lon, n_lat):
    ul-vertex digit math (cell.py:483-531), nucleus offset
    (cell.py:625-653), combine_triangles inverse (pj_rhealpix.py:
    109-117, 220-257), HEALPix sphere inverse (pj_healpix.py:64-107),
    inverse authalic series (utils.py:261-343). Constants pre-folded
    in the kernel's float op order."""
    i2, i4, i6, i8, i10, i12 = map(_r, _series_coeffs_inverse(_E))
    pi = _r(_PI)
    p12 = _r(_PI / 2)
    p14 = _r(_PI / 4)
    a34 = _r(-3 * _PI / 4)
    eps = "1e-15"
    rad2deg = _r(np_rad2deg_const())
    w0 = _R * (_PI / 2) * 3.0 ** (-0)
    half_w = _r(WGS84_003.cell_width(res) / 2)
    inv_scale = _r(3.0 ** (-res))
    ulx = {
        0: _r(_R * (-_PI + 0 * _PI / 2)), 1: _r(_R * -_PI), 2: _r(_R * (-_PI / 2)),
        3: _r(_R * 0.0), 4: _r(_R * (_PI / 2)), 5: _r(_R * (-_PI + 0 * _PI / 2)),
    }
    uly = {
        0: _r(_R * (3 * _PI / 4)), 1: _r(_R * (_PI / 4)), 2: _r(_R * (_PI / 4)),
        3: _r(_R * (_PI / 4)), 4: _r(_R * (_PI / 4)), 5: _r(_R * (-_PI / 4)),
    }
    # Digit sums: dy_int = sum(row_i * 3^(res-i)), row_i = d_i // 3.
    dy_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) // 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    dx_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) % 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    # Inverse-triangle lines (ns = ss = 0), constants folded.
    An1 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    An2 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As1 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As2 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    return f"""
WITH cells AS ({cells_sql}),
d0 AS (SELECT cell_id,
  CASE substr(cell_id, 1, 1) WHEN 'N' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2
       WHEN 'Q' THEN 3 WHEN 'R' THEN 4 ELSE 5 END AS face,
  ({dy_terms}) AS dy_int, ({dx_terms}) AS dx_int
  FROM cells),
d1 AS (SELECT cell_id,
  (CASE face WHEN 0 THEN {ulx[0]} WHEN 1 THEN {ulx[1]} WHEN 2 THEN {ulx[2]}
             WHEN 3 THEN {ulx[3]} WHEN 4 THEN {ulx[4]} ELSE {ulx[5]} END
   + {_r(w0)} * (dx_int * {inv_scale}) + {half_w}) / {_r(_R)} AS x,
  (CASE face WHEN 0 THEN {uly[0]} WHEN 1 THEN {uly[1]} WHEN 2 THEN {uly[2]}
             WHEN 3 THEN {uly[3]} WHEN 4 THEN {uly[4]} ELSE {uly[5]} END
   - {_r(w0)} * (dy_int * {inv_scale}) - {half_w}) / {_r(_R)} AS y
  FROM d0),
d2 AS (SELECT cell_id, x, y,
  CASE WHEN y > {p14} THEN 1 WHEN y < -{p14} THEN 2 ELSE 0 END AS region
  FROM d1),
d3 AS (SELECT cell_id, x, y, region,
  CASE WHEN region = 1 THEN
    (CASE WHEN y < (x - {An1}) - {eps} AND y >= (-x + {An2}) - {eps} THEN 1
          WHEN y >= (x - {An1}) - {eps} AND y > (-x + {An2}) + {eps} THEN 2
          WHEN y > (x - {An1}) + {eps} AND y <= (-x + {An2}) + {eps} THEN 3
          ELSE 0 END)
  WHEN region = 2 THEN
    (CASE WHEN y <= (x - {As1}) + {eps} AND y > (-x + {As2}) + {eps} THEN 1
          WHEN y < (x - {As1}) - {eps} AND y <= (-x + {As2}) + {eps} THEN 2
          WHEN y >= (x - {As1}) - {eps} AND y < (-x + {As2}) - {eps} THEN 3
          ELSE 0 END)
  ELSE -1 END AS c
  FROM d2),
d4 AS (SELECT cell_id, region, c,
  x - {a34} AS dx0,
  CASE WHEN region = 1 THEN y - {p12} ELSE y + {p12} END AS dy0,
  CASE WHEN region = 1 THEN (4 - c) % 4 ELSE c % 4 END AS t,
  x AS hx0, y AS hy0
  FROM d3),
d5 AS (SELECT cell_id,
  CASE WHEN region = 0 THEN hx0 ELSE
    (CASE t WHEN 0 THEN dx0 WHEN 1 THEN -dy0 WHEN 2 THEN -dx0 ELSE dy0 END)
    + ({a34} + {p12}*c) END AS hx,
  CASE WHEN region = 0 THEN hy0 ELSE
    (CASE t WHEN 0 THEN dy0 WHEN 1 THEN dx0 WHEN 2 THEN -dy0 ELSE -dx0 END)
    + (CASE WHEN region = 1 THEN {p12} ELSE -{p12} END) END AS hy
  FROM d4),
d6 AS (SELECT cell_id, hx, hy, abs(hy) AS ay,
  {a34} + {p12}*least(floor(2*hx/{pi} + 2), 3) AS xc
  FROM d5),
d7 AS (SELECT cell_id,
  CASE WHEN ay <= {p14} THEN hx
       WHEN ay < {p12} THEN
         greatest(least(xc + (hx - xc)/(2 - (4*ay)/{pi}), {pi}), -{pi})
       ELSE -{pi} END AS lam,
  CASE WHEN ay <= {p14} THEN asin((8*hy)/{_r(3 * _PI)})
       WHEN ay < {p12} THEN
         sign(hy) * asin(1 - ((2 - (4*ay)/{pi})*(2 - (4*ay)/{pi}))/3)
       ELSE sign(hy) * {p12} END AS beta
  FROM d6),
d8 AS (SELECT cell_id, lam,
  beta + ({i2}*sin(2*beta) + {i4}*sin(4*beta) + {i6}*sin(6*beta)
        + {i8}*sin(8*beta) + {i10}*sin(10*beta) + {i12}*sin(12*beta)) AS phi
  FROM d7),
d9 AS (SELECT cell_id, lam * {rad2deg} AS lon_d, phi * {rad2deg} AS lat_d FROM d8)
SELECT cell_id,
  CASE WHEN lon_d >= 180 THEN lon_d - 360
       WHEN lon_d < -180 THEN lon_d + 360 ELSE lon_d END AS n_lon,
  lat_d AS n_lat
FROM d9
"""


def _s2_lut_values() -> str:
    """(orientation, ij) -> (pos, next_orientation) rows for the
    single-bit Hilbert step, derived from the published S2 base tables
    (POS_TO_IJ / POS_TO_ORIENTATION). The kernel walks 4 bits per step
    through generated 4-bit lookup tables; this oracle walks ONE bit
    per step through the 16-entry base relation — an independent
    algorithm shape that provably composes to the same curve (the
    4-bit tables are built by recursing this exact step)."""
    from .kernel.s2 import POS_TO_IJ, POS_TO_ORIENTATION

    rows = []
    for o in range(4):
        for pos in range(4):
            ij = int(POS_TO_IJ[o, pos])
            rows.append((o, ij, pos, o ^ int(POS_TO_ORIENTATION[pos])))
    return ", ".join(f"({o},{ij},{p},{no})" for o, ij, p, no in rows)


def s2_tokens_sql(source_sql: str, keep_cols: str = "pid") -> str:
    """Pure-SQL S2 encoder (kernel/s2.py twin, zero shared code): for a
    source relation exposing lon, lat (degrees) plus `keep_cols`,
    computes the canonical S2 hex tokens of the level-2 and level-12
    ancestors of the leaf cell — face selection by dominant axis, the
    quadratic (u,v)->(s,t) transform, 30-level leaf (i,j), and the
    Hilbert position via a 30-step recursive CTE over the 16-entry
    single-bit lookup relation. Verified bit-exact against the kernel
    over 60k lattice points (tests/test_kernel_s2.py pins a sweep).

    Token arithmetic avoids uint64 bit tricks: the level-L id is
    face*2^61 + (n >> 2*(30-L))*2^(2*(30-L)+1) + 2^(2*(30-L)); its
    canonical token (16 hex digits, trailing zeros stripped) is the
    top 16 - 2*(30-L)/4... i.e. the id right-shifted to its lsb
    nibble, zero-padded — the low nibble is odd, so the printf width
    is exact (2 digits at level 2, 7 at level 12)."""
    lut_vals = _s2_lut_values()
    return f"""
WITH RECURSIVE lut(o, ij, pos, no) AS (VALUES {lut_vals}),
pts AS ({source_sql}),
a1 AS (SELECT {keep_cols}, radians(lon) AS lam, radians(lat) AS phi FROM pts),
a2 AS (SELECT {keep_cols}, cos(lam)*cos(phi) AS x, sin(lam)*cos(phi) AS y,
  sin(phi) AS z FROM a1),
a3 AS (SELECT {keep_cols}, x, y, z,
  CASE WHEN abs(x) >= abs(y) THEN (CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END)
       ELSE (CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END) END AS f0
  FROM a2),
a4 AS (SELECT {keep_cols}, x, y, z,
  f0 + 3 * (CASE WHEN f0 = 0 THEN (CASE WHEN x < 0 THEN 1 ELSE 0 END)
                 WHEN f0 = 1 THEN (CASE WHEN y < 0 THEN 1 ELSE 0 END)
                 ELSE (CASE WHEN z < 0 THEN 1 ELSE 0 END) END) AS face
  FROM a3),
a5 AS (SELECT {keep_cols}, face,
  CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
            WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
  CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
            WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM a4),
a6 AS (SELECT {keep_cols}, face,
  CASE WHEN u >= 0 THEN 0.5e0*sqrt(1 + 3*u) ELSE 1 - 0.5e0*sqrt(1 - 3*u) END AS s,
  CASE WHEN v >= 0 THEN 0.5e0*sqrt(1 + 3*v) ELSE 1 - 0.5e0*sqrt(1 - 3*v) END AS t
  FROM a5),
a7 AS (SELECT {keep_cols}, face,
  least(greatest(CAST(floor(s * 1073741824e0) AS BIGINT), 0), 1073741823) AS i,
  least(greatest(CAST(floor(t * 1073741824e0) AS BIGINT), 0), 1073741823) AS j
  FROM a6),
hil AS (
  SELECT {keep_cols}, face, i, j, face % 2 AS o, CAST(0 AS BIGINT) AS n,
    29 AS k
  FROM a7
  UNION ALL
  SELECT {", ".join("h." + c.strip() for c in keep_cols.split(","))},
    h.face, h.i, h.j, l.no AS o, h.n*4 + l.pos AS n, h.k - 1 AS k
  FROM hil h JOIN lut l
    ON l.o = h.o AND l.ij = ((h.i >> h.k) & 1)*2 + ((h.j >> h.k) & 1)
  WHERE h.k >= 0
)
SELECT {keep_cols},
  printf('%02x', face*32 + (n // 72057594037927936)*2 + 1) AS s2_l2,
  printf('%07x', face*33554432 + (n // 68719476736)*2 + 1) AS s2_l12
FROM hil WHERE k = -1
"""


def hex7_tokens_sql(source_sql: str, res: int, keep_cols: str = "pid") -> str:
    """Pure-SQL hex7 encoder (kernel/hex7.py twin): gnomonic projection
    onto the nearest icosahedron face (20-way argmax as a window
    row_number, first-max tie-break like np.argmax), Eisenstein hex
    rounding (banker's round replicated exactly — DuckDB round() is
    half-away), and the aperture-7 GBT digit peel as a `res`-step
    recursive CTE over the 7-digit residue relation. Face bases are
    folded from the kernel with the same float op order (the
    icosahedron construction is deterministic from sqrt(5)); every
    in-SQL arithmetic op is a single IEEE operation, so only libm trig
    could diverge — verified bit-exact over 50k lattice points
    (tests/test_kernel_hex7.py pins a sweep).

    Output: (keep_cols, hex7_tok [16-hex of the packed res-`res` id],
    hex7_l2 [token of the exact aperture-7 parent at res 2])."""
    from .kernel import hex7

    W = hex7.U_C**res
    faces_vals = ", ".join(
        f"({f},{_r(hex7.FACE_N[f, 0])},{_r(hex7.FACE_N[f, 1])},{_r(hex7.FACE_N[f, 2])},"
        f"{_r(hex7.FACE_E1[f, 0])},{_r(hex7.FACE_E1[f, 1])},{_r(hex7.FACE_E1[f, 2])},"
        f"{_r(hex7.FACE_E2[f, 0])},{_r(hex7.FACE_E2[f, 1])},{_r(hex7.FACE_E2[f, 2])})"
        for f in range(20)
    )
    dig_vals = ", ".join(
        f"({i},{int(a)},{int(b)})" for i, (a, b) in enumerate(hex7.DIGITS)
    )
    fill = (1 << (3 * (15 - res))) - 1
    p58, p53, p49, p45 = 1 << 58, 1 << 53, 1 << 49, 1 << 45
    p42, p39 = 1 << 42, 1 << 39
    keep_h = ", ".join("p." + c.strip() for c in keep_cols.split(","))

    def bankers(x: str) -> str:
        return (
            f"CASE WHEN {x} - floor({x}) > 0.5e0 THEN floor({x}) + 1 "
            f"WHEN {x} - floor({x}) < 0.5e0 THEN floor({x}) "
            f"WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 THEN floor({x}) "
            f"ELSE floor({x}) + 1 END"
        )

    return f"""
WITH RECURSIVE faces(fid,nx,ny,nz,e1x,e1y,e1z,e2x,e2y,e2z) AS (VALUES {faces_vals}),
digs(d, da, db) AS (VALUES {dig_vals}),
pts AS ({source_sql}),
b1 AS (SELECT {keep_cols}, radians(lon) AS lam, radians(lat) AS phi FROM pts),
b2 AS (SELECT {keep_cols}, cos(phi)*cos(lam) AS px, cos(phi)*sin(lam) AS py,
  sin(phi) AS pz FROM b1),
b3 AS (SELECT {keep_cols}, px, py, pz, fid, e1x,e1y,e1z,e2x,e2y,e2z,
  (px*nx + py*ny) + pz*nz AS dot,
  row_number() OVER (PARTITION BY {keep_cols}
    ORDER BY (px*nx + py*ny) + pz*nz DESC, fid ASC) AS rn
  FROM b2, faces),
b5 AS (SELECT {keep_cols}, fid AS face, e1x,e1y,e1z,e2x,e2y,e2z,
  px/dot AS qx, py/dot AS qy, pz/dot AS qz FROM b3 WHERE rn = 1),
b6 AS (SELECT {keep_cols}, face,
  ((qx*e1x + qy*e1y) + qz*e1z) / {_r(hex7.S0)} AS cre,
  ((qx*e2x + qy*e2y) + qz*e2z) / {_r(hex7.S0)} AS cim
  FROM b5),
b8 AS (SELECT {keep_cols}, face,
  cre*{_r(W.real)} - cim*{_r(W.imag)} AS wre,
  (2e0*(cre*{_r(W.imag)} + cim*{_r(W.real)}))/{_r(hex7.SQRT3)} AS bb
  FROM b6),
b10 AS (SELECT {keep_cols}, face, wre + bb/2 AS xx,
  -(wre + bb/2) - bb AS yy, bb AS zz FROM b8),
b11 AS (SELECT {keep_cols}, face, xx, yy, zz,
  {bankers("xx")} AS rx0, {bankers("yy")} AS ry0, {bankers("zz")} AS rz0
  FROM b10),
b12 AS (SELECT {keep_cols}, face, rx0, ry0, rz0,
  abs(rx0 - xx) AS dx, abs(ry0 - yy) AS dy, abs(rz0 - zz) AS dz FROM b11),
b13 AS (SELECT {keep_cols}, face,
  CAST(CASE WHEN dx > dy AND dx > dz THEN -ry0 - rz0 ELSE rx0 END AS BIGINT) AS za,
  CAST(CASE WHEN NOT (dx > dy AND dx > dz) AND dz > dy THEN -rx0 - ry0
       ELSE rz0 END AS BIGINT) AS zb
  FROM b12),
peel AS (
  SELECT {keep_cols}, face, za, zb, 0 AS s, CAST(0 AS BIGINT) AS acc FROM b13
  UNION ALL
  SELECT {keep_h}, p.face,
    (2*(p.za - g.da) + (p.zb - g.db)) // 7 AS za,
    (3*(p.zb - g.db) - (p.za - g.da)) // 7 AS zb,
    p.s + 1 AS s,
    p.acc + g.d * CAST(power(8, 15 - {res} + p.s) AS BIGINT) AS acc
  FROM peel p JOIN digs g
    ON (2*(p.za - g.da) + (p.zb - g.db)) % 7 = 0
   AND (3*(p.zb - g.db) - (p.za - g.da)) % 7 = 0
  WHERE p.s < {res}
),
packedT AS (
  SELECT {keep_cols}, face,
    least(greatest(za, -8), 7) AS z0a, least(greatest(zb, -8), 7) AS z0b, acc
  FROM peel WHERE s = {res}
)
SELECT {keep_cols},
  printf('%016x',
    CAST({res} AS BIGINT)*{p58} + face*{p53}
    + (z0a + 8)*{p49} + (z0b + 8)*{p45} + acc + {fill}) AS hex7_tok,
  printf('%016x',
    CAST(2 AS BIGINT)*{p58} + face*{p53}
    + (z0a + 8)*{p49} + (z0b + 8)*{p45}
    + ((acc // {p42}) % 8) * {p42}
    + ((acc // {p39}) % 8) * {p39} + {p39 - 1}) AS hex7_l2
FROM packedT
"""


def np_rad2deg_const() -> float:
    """The constant numpy multiplies by in rad2deg (180/pi as a
    double), matching the kernel's conversion bit-for-bit."""
    import numpy as np

    return float(np.rad2deg(1.0))


# Deterministic synthetic point derivations shared by Spark queries and
# oracles: integer-exact expressions over the orders/customer keys.
ORDERS_POINTS_SQL = (
    "SELECT o_orderkey AS pid, "
    "((o_orderkey * 9973) % 360000) / 1000.0 - 180.0 AS lon, "
    "((o_orderkey * 7919) % 178000) / 1000.0 - 89.0 AS lat "
    "FROM orders"
)

CUSTOMER_POINTS_SQL = (
    "SELECT c_custkey AS pid, "
    "((c_custkey * 9973) % 360000) / 1000.0 - 180.0 AS lon, "
    "((c_custkey * 7919) % 178000) / 1000.0 - 89.0 AS lat "
    "FROM customer"
)


def rhp_xy_range_sql(cells_sql: str, res: int) -> str:
    """SQL twin of Cell.xy_range for uniform-resolution suids:
    ul-vertex digit sums (cell.py:483-531) then +/- the folded cell
    width — same float op order as the kernel."""
    w0 = _R * (math.pi / 2)
    w = w0 * 3.0 ** (-res)
    inv_scale = _r(3.0 ** (-res))
    ulx = {
        0: _r(_R * -math.pi), 1: _r(_R * -math.pi), 2: _r(_R * (-math.pi / 2)),
        3: _r(_R * 0.0), 4: _r(_R * (math.pi / 2)), 5: _r(_R * -math.pi),
    }
    uly = {
        0: _r(_R * (3 * math.pi / 4)), 1: _r(_R * (math.pi / 4)),
        2: _r(_R * (math.pi / 4)), 3: _r(_R * (math.pi / 4)),
        4: _r(_R * (math.pi / 4)), 5: _r(_R * (-math.pi / 4)),
    }
    dy_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) // 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    dx_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) % 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    return f"""
WITH cells AS MATERIALIZED ({cells_sql}),
x0 AS (SELECT cell_id,
  CASE substr(cell_id, 1, 1) WHEN 'N' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2
       WHEN 'Q' THEN 3 WHEN 'R' THEN 4 ELSE 5 END AS face,
  ({dy_terms}) AS dy_int, ({dx_terms}) AS dx_int
  FROM cells),
x1 AS (SELECT cell_id,
  (CASE face WHEN 0 THEN {ulx[0]} WHEN 1 THEN {ulx[1]} WHEN 2 THEN {ulx[2]}
             WHEN 3 THEN {ulx[3]} WHEN 4 THEN {ulx[4]} ELSE {ulx[5]} END
   + {_r(w0)} * (dx_int * {inv_scale})) AS x_min,
  (CASE face WHEN 0 THEN {uly[0]} WHEN 1 THEN {uly[1]} WHEN 2 THEN {uly[2]}
             WHEN 3 THEN {uly[3]} WHEN 4 THEN {uly[4]} ELSE {uly[5]} END
   - {_r(w0)} * (dy_int * {inv_scale})) AS y_max
  FROM x0)
SELECT cell_id, x_min, x_min + {_r(w)} AS x_max,
       y_max - {_r(w)} AS y_min, y_max
FROM x1
"""


def rhp_vertex_sql(cells_sql: str, res: int, corner: str) -> str:
    """SQL twin of one ellipsoidal cell corner (Cell.vertices,
    cell.py:655-732) for uniform-resolution suids: ul-vertex digit
    math with the corner offset (ul/ur/dr/dl), then the same inverse
    pipeline as rhp_nucleus_sql. For equatorial (quad) cells the
    NW-first ordering of rhp_to_geo_boundary is exactly ul,ur,dr,dl
    (cell.py:590-592). Outputs (cell_id, v_lon, v_lat)."""
    i2, i4, i6, i8, i10, i12 = map(_r, _series_coeffs_inverse(_E))
    pi = _r(_PI)
    p12 = _r(_PI / 2)
    p14 = _r(_PI / 4)
    a34 = _r(-3 * _PI / 4)
    eps = "1e-15"
    rad2deg = _r(np_rad2deg_const())
    w0 = _R * (_PI / 2)
    w = _r(WGS84_003.cell_width(res))
    inv_scale = _r(3.0 ** (-res))
    dx_off, dy_off = {
        "ul": ("", ""),
        "ur": (f" + {w}", ""),
        "dr": (f" + {w}", f" - {w}"),
        "dl": ("", f" - {w}"),
    }[corner]
    ulx = {
        0: _r(_R * -math.pi), 1: _r(_R * -math.pi), 2: _r(_R * (-math.pi / 2)),
        3: _r(_R * 0.0), 4: _r(_R * (math.pi / 2)), 5: _r(_R * -math.pi),
    }
    uly = {
        0: _r(_R * (3 * math.pi / 4)), 1: _r(_R * (math.pi / 4)),
        2: _r(_R * (math.pi / 4)), 3: _r(_R * (math.pi / 4)),
        4: _r(_R * (math.pi / 4)), 5: _r(_R * (-math.pi / 4)),
    }
    dy_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) // 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    dx_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) % 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    An1 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    An2 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As1 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As2 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    return f"""
WITH cells AS MATERIALIZED ({cells_sql}),
d0 AS (SELECT cell_id,
  CASE substr(cell_id, 1, 1) WHEN 'N' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2
       WHEN 'Q' THEN 3 WHEN 'R' THEN 4 ELSE 5 END AS face,
  ({dy_terms}) AS dy_int, ({dx_terms}) AS dx_int
  FROM cells),
d1 AS (SELECT cell_id,
  (CASE face WHEN 0 THEN {ulx[0]} WHEN 1 THEN {ulx[1]} WHEN 2 THEN {ulx[2]}
             WHEN 3 THEN {ulx[3]} WHEN 4 THEN {ulx[4]} ELSE {ulx[5]} END
   + {_r(w0)} * (dx_int * {inv_scale}){dx_off}) / {_r(_R)} AS x,
  (CASE face WHEN 0 THEN {uly[0]} WHEN 1 THEN {uly[1]} WHEN 2 THEN {uly[2]}
             WHEN 3 THEN {uly[3]} WHEN 4 THEN {uly[4]} ELSE {uly[5]} END
   - {_r(w0)} * (dy_int * {inv_scale}){dy_off}) / {_r(_R)} AS y
  FROM d0),
d2 AS (SELECT cell_id, x, y,
  CASE WHEN y > {p14} THEN 1 WHEN y < -{p14} THEN 2 ELSE 0 END AS region
  FROM d1),
d3 AS (SELECT cell_id, x, y, region,
  CASE WHEN region = 1 THEN
    (CASE WHEN y < (x - {An1}) - {eps} AND y >= (-x + {An2}) - {eps} THEN 1
          WHEN y >= (x - {An1}) - {eps} AND y > (-x + {An2}) + {eps} THEN 2
          WHEN y > (x - {An1}) + {eps} AND y <= (-x + {An2}) + {eps} THEN 3
          ELSE 0 END)
  WHEN region = 2 THEN
    (CASE WHEN y <= (x - {As1}) + {eps} AND y > (-x + {As2}) + {eps} THEN 1
          WHEN y < (x - {As1}) - {eps} AND y <= (-x + {As2}) + {eps} THEN 2
          WHEN y >= (x - {As1}) - {eps} AND y < (-x + {As2}) - {eps} THEN 3
          ELSE 0 END)
  ELSE -1 END AS c
  FROM d2),
d4 AS (SELECT cell_id, region, c,
  x - {a34} AS dx0,
  CASE WHEN region = 1 THEN y - {p12} ELSE y + {p12} END AS dy0,
  CASE WHEN region = 1 THEN (4 - c) % 4 ELSE c % 4 END AS t,
  x AS hx0, y AS hy0
  FROM d3),
d5 AS (SELECT cell_id,
  CASE WHEN region = 0 THEN hx0 ELSE
    (CASE t WHEN 0 THEN dx0 WHEN 1 THEN -dy0 WHEN 2 THEN -dx0 ELSE dy0 END)
    + ({a34} + {p12}*c) END AS hx,
  CASE WHEN region = 0 THEN hy0 ELSE
    (CASE t WHEN 0 THEN dy0 WHEN 1 THEN dx0 WHEN 2 THEN -dy0 ELSE -dx0 END)
    + (CASE WHEN region = 1 THEN {p12} ELSE -{p12} END) END AS hy
  FROM d4),
d6 AS (SELECT cell_id, hx, hy, abs(hy) AS ay,
  {a34} + {p12}*least(floor(2*hx/{pi} + 2), 3) AS xc
  FROM d5),
d7 AS (SELECT cell_id,
  CASE WHEN ay <= {p14} THEN hx
       WHEN ay < {p12} THEN
         greatest(least(xc + (hx - xc)/(2 - (4*ay)/{pi}), {pi}), -{pi})
       ELSE -{pi} END AS lam,
  CASE WHEN ay <= {p14} THEN asin((8*hy)/{_r(3 * _PI)})
       WHEN ay < {p12} THEN
         sign(hy) * asin(1 - ((2 - (4*ay)/{pi})*(2 - (4*ay)/{pi}))/3)
       ELSE sign(hy) * {p12} END AS beta
  FROM d6),
d8 AS (SELECT cell_id, lam,
  beta + ({i2}*sin(2*beta) + {i4}*sin(4*beta) + {i6}*sin(6*beta)
        + {i8}*sin(8*beta) + {i10}*sin(10*beta) + {i12}*sin(12*beta)) AS phi
  FROM d7),
d9 AS (SELECT cell_id, lam * {rad2deg} AS lon_d, phi * {rad2deg} AS lat_d FROM d8)
SELECT cell_id,
  CASE WHEN lon_d >= 180 THEN lon_d - 360
       WHEN lon_d < -180 THEN lon_d + 360 ELSE lon_d END AS v_lon,
  lat_d AS v_lat
FROM d9
"""


def rhp_vertices_pivot_sql(cells_sql: str, res: int) -> str:
    """All four ellipsoidal corners (Cell.vertices, cell.py:655-732)
    in ONE inverse pipeline: cells cross-joined with a 4-row corner
    offset table, then the rhp_vertex_sql stages once. Adding the
    literal 0e0 offset for the ul corner is exact (x + 0.0 == x for
    finite planar coords), so op order matches the kernel. A single
    pipeline avoids the exponential expression inlining DuckDB's
    optimizer does on a 4-way join of per-corner pipelines. Output:
    (cell_id, nm, v_lon, v_lat), nm in ul/ur/dr/dl."""
    i2, i4, i6, i8, i10, i12 = map(_r, _series_coeffs_inverse(_E))
    pi = _r(_PI)
    p12 = _r(_PI / 2)
    p14 = _r(_PI / 4)
    a34 = _r(-3 * _PI / 4)
    eps = "1e-15"
    rad2deg = _r(np_rad2deg_const())
    w0 = _R * (_PI / 2)
    w = _r(WGS84_003.cell_width(res))
    inv_scale = _r(3.0 ** (-res))
    ulx = {
        0: _r(_R * -math.pi), 1: _r(_R * -math.pi), 2: _r(_R * (-math.pi / 2)),
        3: _r(_R * 0.0), 4: _r(_R * (math.pi / 2)), 5: _r(_R * -math.pi),
    }
    uly = {
        0: _r(_R * (3 * math.pi / 4)), 1: _r(_R * (math.pi / 4)),
        2: _r(_R * (math.pi / 4)), 3: _r(_R * (math.pi / 4)),
        4: _r(_R * (math.pi / 4)), 5: _r(_R * (-math.pi / 4)),
    }
    dy_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) // 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    dx_terms = " + ".join(
        f"(CAST(substr(cell_id, {i + 1}, 1) AS BIGINT) % 3) * {3 ** (res - i)}"
        for i in range(1, res + 1)
    )
    An1 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    An2 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As1 = _r(-3 * _PI / 4 + (0 + 1) * _PI / 2)
    As2 = _r(-3 * _PI / 4 + (0 - 1) * _PI / 2)
    return f"""
WITH corners(nm, dxo, dyo) AS (
  VALUES ('ul', 0e0, 0e0), ('ur', {w}, 0e0), ('dr', {w}, {w}), ('dl', 0e0, {w})),
cells AS MATERIALIZED ({cells_sql}),
d0 AS (SELECT cell_id,
  CASE substr(cell_id, 1, 1) WHEN 'N' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2
       WHEN 'Q' THEN 3 WHEN 'R' THEN 4 ELSE 5 END AS face,
  ({dy_terms}) AS dy_int, ({dx_terms}) AS dx_int
  FROM cells),
d1 AS MATERIALIZED (SELECT cell_id, nm,
  (CASE face WHEN 0 THEN {ulx[0]} WHEN 1 THEN {ulx[1]} WHEN 2 THEN {ulx[2]}
             WHEN 3 THEN {ulx[3]} WHEN 4 THEN {ulx[4]} ELSE {ulx[5]} END
   + {_r(w0)} * (dx_int * {inv_scale}) + dxo) / {_r(_R)} AS x,
  (CASE face WHEN 0 THEN {uly[0]} WHEN 1 THEN {uly[1]} WHEN 2 THEN {uly[2]}
             WHEN 3 THEN {uly[3]} WHEN 4 THEN {uly[4]} ELSE {uly[5]} END
   - {_r(w0)} * (dy_int * {inv_scale}) - dyo) / {_r(_R)} AS y
  FROM d0, corners),
d2 AS (SELECT cell_id, nm, x, y,
  CASE WHEN y > {p14} THEN 1 WHEN y < -{p14} THEN 2 ELSE 0 END AS region
  FROM d1),
d3 AS (SELECT cell_id, nm, x, y, region,
  CASE WHEN region = 1 THEN
    (CASE WHEN y < (x - {An1}) - {eps} AND y >= (-x + {An2}) - {eps} THEN 1
          WHEN y >= (x - {An1}) - {eps} AND y > (-x + {An2}) + {eps} THEN 2
          WHEN y > (x - {An1}) + {eps} AND y <= (-x + {An2}) + {eps} THEN 3
          ELSE 0 END)
  WHEN region = 2 THEN
    (CASE WHEN y <= (x - {As1}) + {eps} AND y > (-x + {As2}) + {eps} THEN 1
          WHEN y < (x - {As1}) - {eps} AND y <= (-x + {As2}) + {eps} THEN 2
          WHEN y >= (x - {As1}) - {eps} AND y < (-x + {As2}) - {eps} THEN 3
          ELSE 0 END)
  ELSE -1 END AS c
  FROM d2),
d4 AS (SELECT cell_id, nm, region, c,
  x - {a34} AS dx0,
  CASE WHEN region = 1 THEN y - {p12} ELSE y + {p12} END AS dy0,
  CASE WHEN region = 1 THEN (4 - c) % 4 ELSE c % 4 END AS t,
  x AS hx0, y AS hy0
  FROM d3),
d5 AS (SELECT cell_id, nm,
  CASE WHEN region = 0 THEN hx0 ELSE
    (CASE t WHEN 0 THEN dx0 WHEN 1 THEN -dy0 WHEN 2 THEN -dx0 ELSE dy0 END)
    + ({a34} + {p12}*c) END AS hx,
  CASE WHEN region = 0 THEN hy0 ELSE
    (CASE t WHEN 0 THEN dy0 WHEN 1 THEN dx0 WHEN 2 THEN -dy0 ELSE -dx0 END)
    + (CASE WHEN region = 1 THEN {p12} ELSE -{p12} END) END AS hy
  FROM d4),
d6 AS (SELECT cell_id, nm, hx, hy, abs(hy) AS ay,
  {a34} + {p12}*least(floor(2*hx/{pi} + 2), 3) AS xc
  FROM d5),
d7 AS (SELECT cell_id, nm,
  CASE WHEN ay <= {p14} THEN hx
       WHEN ay < {p12} THEN
         greatest(least(xc + (hx - xc)/(2 - (4*ay)/{pi}), {pi}), -{pi})
       ELSE -{pi} END AS lam,
  CASE WHEN ay <= {p14} THEN asin((8*hy)/{_r(3 * _PI)})
       WHEN ay < {p12} THEN
         sign(hy) * asin(1 - ((2 - (4*ay)/{pi})*(2 - (4*ay)/{pi}))/3)
       ELSE sign(hy) * {p12} END AS beta
  FROM d6),
d8 AS (SELECT cell_id, nm, lam,
  beta + ({i2}*sin(2*beta) + {i4}*sin(4*beta) + {i6}*sin(6*beta)
        + {i8}*sin(8*beta) + {i10}*sin(10*beta) + {i12}*sin(12*beta)) AS phi
  FROM d7),
d9 AS (SELECT cell_id, nm, lam * {rad2deg} AS lon_d, phi * {rad2deg} AS lat_d FROM d8)
SELECT cell_id, nm,
  CASE WHEN lon_d >= 180 THEN lon_d - 360
       WHEN lon_d < -180 THEN lon_d + 360 ELSE lon_d END AS v_lon,
  lat_d AS v_lat
FROM d9
"""
