"""Vectorized HEALPix projection (Calabretta & Roukema 2007).

Re-derivation of reference pj_healpix.py:30-155 with NumPy masks
replacing the scalar if/else branches. All functions are
array-in/array-out on the unit authalic sphere; the R_A scaling and
degree conversion live in the callers (rhealpix.py / cells.py).
"""

from __future__ import annotations

import numpy as np

PHI0 = np.arcsin(2.0 / 3)  # equatorial/polar boundary latitude


def healpix_sphere(lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HEALPix forward on the unit sphere (reference: pj_healpix.py:30-61)."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    eq = np.abs(phi) <= PHI0

    # Equatorial branch.
    x = lam.copy()
    y = 3 * np.pi / 8 * np.sin(phi)

    # Polar branch (pj_healpix.py:52-60), incl. the cap_number clamp.
    if not np.all(eq):
        po = ~eq
        sigma = np.sqrt(3 * (1 - np.abs(np.sin(phi[po]))))
        cap = np.floor(2 * lam[po] / np.pi + 2)
        cap = np.where(cap >= 4, 3.0, cap)
        lamc = -3 * np.pi / 4 + (np.pi / 2) * cap
        x[po] = lamc + (lam[po] - lamc) * sigma
        y[po] = np.sign(phi[po]) * np.pi / 4 * (2 - sigma)
    return x, y


def healpix_sphere_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HEALPix inverse on the unit sphere (reference: pj_healpix.py:64-107).

    Callers guarantee (x, y) lies in the HEALPix image; the reference's
    matplotlib-based bounds check is exposed separately as
    ``in_healpix_image`` for tests.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ay = np.abs(y)
    lam = x.copy()
    phi = np.arcsin(np.clip(8 * y / (3 * np.pi), -1.0, 1.0))

    polar = (ay > np.pi / 4) & (ay < np.pi / 2)
    if np.any(polar):
        cap = np.floor(2 * x[polar] / np.pi + 2)
        cap = np.where(cap >= 4, 3.0, cap)
        xc = -3 * np.pi / 4 + (np.pi / 2) * cap
        tau = 2 - 4 * ay[polar] / np.pi
        lam_p = xc + (x[polar] - xc) / tau
        # Rounding clamp (pj_healpix.py:98-102).
        lam_p = np.clip(lam_p, -np.pi, np.pi)
        lam[polar] = lam_p
        # The reference squares a numpy *scalar* here (pj_healpix.py:97),
        # which routes through libm pow() and lands 1 ulp off the exact
        # square for ~0.003% of inputs; the array `tau**2` below is the
        # correctly-rounded multiply. Known, bounded divergence: <=1 ulp
        # of latitude on rare polar decode points.
        phi[polar] = np.sign(y[polar]) * np.arcsin(1 - tau**2 / 3)

    pole = ay >= np.pi / 2
    if np.any(pole):
        lam[pole] = -np.pi
        phi[pole] = np.sign(y[pole]) * np.pi / 2
    return lam, phi


def healpix_ellipsoid(
    lam: np.ndarray, phi: np.ndarray, e: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal HEALPix via authalic latitude (pj_healpix.py:110-131)."""
    from .latitudes import auth_lat

    beta = auth_lat(phi, e, radians=True)
    return healpix_sphere(lam, beta)


def healpix_ellipsoid_inverse(
    x: np.ndarray, y: np.ndarray, e: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of healpix_ellipsoid (pj_healpix.py:134-155)."""
    from .latitudes import auth_lat

    lam, beta = healpix_sphere_inverse(x, y)
    phi = auth_lat(beta, e, radians=True, inverse=True)
    return lam, phi


def in_healpix_image(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Closed-form replacement for the matplotlib Path test
    (pj_healpix.py:158-223): the |y|<=pi/4 band plus four polar
    triangles with apexes at (lamc, pi/2), all expanded by eps=1e-10.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eps = 1e-10
    ay = np.abs(y)
    in_band = (ay <= np.pi / 4 + eps) & (np.abs(x) <= np.pi + eps)
    cap = np.clip(np.floor(2 * x / np.pi + 2), 0, 3)
    lamc = -3 * np.pi / 4 + (np.pi / 2) * cap
    in_tri = (ay <= np.pi / 2 + eps) & (np.abs(x - lamc) <= np.pi / 2 + 2 * eps - ay)
    return in_band | in_tri
