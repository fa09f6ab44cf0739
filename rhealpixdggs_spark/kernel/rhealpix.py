"""Vectorized rHEALPix projection: HEALPix + polar-triangle reassembly.

Re-derivation of reference pj_rhealpix.py:51-411 and the projection
wrapper's lon_0/lat_0 handling (projection_wrapper.py:89-121). Scalar
branches become masks; the 2x2 integer rotation matrices (ROTATE table,
pj_rhealpix.py:34-48) become a 4-way sign/swap select, so no float
error is introduced by the rotations themselves.
"""

from __future__ import annotations

import numpy as np

from .healpix import healpix_ellipsoid, healpix_ellipsoid_inverse
from .latitudes import wrap_latitude, wrap_longitude

EPS_INV = 1e-15  # fuzz for the inverse triangle lines (pj_rhealpix.py:231)


def _rotate(t: np.ndarray, dx: np.ndarray, dy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Anticlockwise rotation by t quarter turns, t in {0,1,2,3}.

    Equivalent to dot(ROTATE[t], (dx, dy)) with ROTATE from
    pj_rhealpix.py:34-48 (ROTATE[k] == ROTATE[k % 4]).
    """
    t = np.asarray(t) % 4
    rx = np.select([t == 0, t == 1, t == 2, t == 3], [dx, -dy, -dx, dy])
    ry = np.select([t == 0, t == 1, t == 2, t == 3], [dy, dx, -dy, -dx])
    return rx, ry


def triangle(
    x: np.ndarray,
    y: np.ndarray,
    north_square: int = 0,
    south_square: int = 0,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Polar-triangle number and region of each point.

    Vectorization of pj_rhealpix.py:120-257. Returns
    (triangle_number int array — -1 for equatorial — and region codes
    int array: 0 equatorial, 1 north_polar, 2 south_polar).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ns, ss = north_square % 4, south_square % 4
    region = np.zeros(x.shape, dtype=np.int64)
    region[y > np.pi / 4] = 1
    region[y < -np.pi / 4] = 2
    tri = np.full(x.shape, -1, dtype=np.int64)

    if not inverse:
        # Forward (pj_rhealpix.py:198-219): triangle by x-band.
        tn = np.select(
            [x < -np.pi / 2, x < 0, x < np.pi / 2],
            [0, 1, 2],
            default=3,
        )
        tri = np.where(region != 0, tn, tri)
        return tri, region

    eps = EPS_INV
    north = region == 1
    if np.any(north):
        L1 = x - (-3 * np.pi / 4 + (ns - 1) * np.pi / 2)
        L2 = -x + (-3 * np.pi / 4 + (ns + 1) * np.pi / 2)
        tn = np.select(
            [
                (y < L1 - eps) & (y >= L2 - eps),
                (y >= L1 - eps) & (y > L2 + eps),
                (y > L1 + eps) & (y <= L2 + eps),
            ],
            [(ns + 1) % 4, (ns + 2) % 4, (ns + 3) % 4],
            default=ns,
        )
        tri = np.where(north, tn, tri)
    south = region == 2
    if np.any(south):
        L1 = x - (-3 * np.pi / 4 + (ss + 1) * np.pi / 2)
        L2 = -x + (-3 * np.pi / 4 + (ss - 1) * np.pi / 2)
        tn = np.select(
            [
                (y <= L1 + eps) & (y > L2 + eps),
                (y < L1 - eps) & (y <= L2 + eps),
                (y >= L1 - eps) & (y < L2 - eps),
            ],
            [(ss + 1) % 4, (ss + 2) % 4, (ss + 3) % 4],
            default=ss,
        )
        tri = np.where(south, tn, tri)
    return tri, region


def combine_triangles(
    x: np.ndarray,
    y: np.ndarray,
    north_square: int = 0,
    south_square: int = 0,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Rearrange the 4 polar triangles into/out of the polar squares.

    Vectorization of pj_rhealpix.py:51-117: rotate each polar point
    about its triangle tip tc and translate to/from the square at
    north_square / south_square. Equatorial points pass through.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ns, ss = north_square % 4, south_square % 4
    c, region = triangle(x, y, ns, ss, inverse=inverse)

    out_x, out_y = x.copy(), y.copy()
    polar = region != 0
    if not np.any(polar):
        return out_x, out_y

    tc_x = -3 * np.pi / 4 + c * np.pi / 2
    tc_y = np.sign(y) * np.pi / 2
    north = region == 1
    south = region == 2
    # Tip of the triangle each polar point is assembled upon.
    sq = np.where(north, ns, ss)
    u_x = -3 * np.pi / 4 + sq * np.pi / 2
    u_y = np.where(north, np.pi / 2, -np.pi / 2)

    if not inverse:
        # north: ROTATE[c - ns]; south: ROTATE[-(c - ss)]
        t = np.where(north, c - ns, -(c - ss))
        rx, ry = _rotate(t, x - tc_x, y - tc_y)
        nx, ny = rx + u_x, ry + u_y
    else:
        # north: ROTATE[-(c - ns)]; south: ROTATE[c - ss]
        t = np.where(north, -(c - ns), c - ss)
        rx, ry = _rotate(t, x - u_x, y - u_y)
        nx, ny = rx + tc_x, ry + tc_y

    out_x = np.where(polar, nx, out_x)
    out_y = np.where(polar, ny, out_y)
    return out_x, out_y


def rhealpix_ellipsoid(
    lam: np.ndarray,
    phi: np.ndarray,
    e: float = 0.0,
    north_square: int = 0,
    south_square: int = 0,
    region: str = "none",
) -> tuple[np.ndarray, np.ndarray]:
    """rHEALPix forward on the unit authalic sphere
    (pj_rhealpix.py:336-375, incl. the 'equatorial' shortcut)."""
    x, y = healpix_ellipsoid(lam, phi, e=e)
    if region != "equatorial":
        x, y = combine_triangles(x, y, north_square, south_square)
    return x, y


def rhealpix_ellipsoid_inverse(
    x: np.ndarray,
    y: np.ndarray,
    e: float = 0.0,
    north_square: int = 0,
    south_square: int = 0,
    region: str = "none",
) -> tuple[np.ndarray, np.ndarray]:
    """rHEALPix inverse (pj_rhealpix.py:378-411). Callers guarantee
    in-image inputs; ``in_rhealpix_image`` is exposed for tests."""
    if region != "equatorial":
        x, y = combine_triangles(x, y, north_square, south_square, inverse=True)
    return healpix_ellipsoid_inverse(x, y, e=e)


def in_rhealpix_image(
    x: np.ndarray, y: np.ndarray, north_square: int = 0, south_square: int = 0
) -> np.ndarray:
    """Closed-form replacement for the matplotlib Path test
    (pj_rhealpix.py:414-470): equatorial band + two polar squares,
    expanded by eps=1e-15."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eps = 1e-15
    ns, ss = north_square % 4, south_square % 4
    band = (np.abs(y) <= np.pi / 4 + eps) & (np.abs(x) <= np.pi + eps)
    north = (
        (y > np.pi / 4 - eps)
        & (y <= 3 * np.pi / 4 + eps)
        & (x >= -np.pi + ns * np.pi / 2 - eps)
        & (x <= -np.pi + (ns + 1) * np.pi / 2 + eps)
    )
    south = (
        (y < -np.pi / 4 + eps)
        & (y >= -3 * np.pi / 4 - eps)
        & (x >= -np.pi + ss * np.pi / 2 - eps)
        & (x <= -np.pi + (ss + 1) * np.pi / 2 + eps)
    )
    return band | north | south


# ---------------------------------------------------------------------------
# Scaled, degree-aware projection (the reference's projection factory
# pj_rhealpix.py:511-582 + wrapper translation projection_wrapper.py:89-121).
# ---------------------------------------------------------------------------


def rhealpix_forward(cfg, lon: np.ndarray, lat: np.ndarray, region: str = "none"):
    """(lon, lat) in cfg units -> planar (x, y) meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = wrap_longitude(lon - cfg.lon_0, radians=cfg.radians)
    phi = wrap_latitude(lat - cfg.lat_0, radians=cfg.radians)
    if not cfg.radians:
        lam = np.deg2rad(lam)
        phi = np.deg2rad(phi)
    x, y = rhealpix_ellipsoid(
        lam, phi, e=cfg.e, north_square=cfg.north_square,
        south_square=cfg.south_square, region=region,
    )
    return cfg.R_A * x, cfg.R_A * y


def rhealpix_inverse(cfg, x: np.ndarray, y: np.ndarray, region: str = "none"):
    """Planar (x, y) meters -> (lon, lat) in cfg units."""
    x = np.asarray(x, dtype=np.float64) / cfg.R_A
    y = np.asarray(y, dtype=np.float64) / cfg.R_A
    lam, phi = rhealpix_ellipsoid_inverse(
        x, y, e=cfg.e, north_square=cfg.north_square,
        south_square=cfg.south_square, region=region,
    )
    if not cfg.radians:
        lam = np.rad2deg(lam)
        phi = np.rad2deg(phi)
    lam = wrap_longitude(lam + cfg.lon_0, radians=cfg.radians)
    phi = wrap_latitude(phi + cfg.lat_0, radians=cfg.radians)
    return lam, phi
