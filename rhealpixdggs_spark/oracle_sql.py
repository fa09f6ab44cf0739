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
    return repr(float(x))


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
