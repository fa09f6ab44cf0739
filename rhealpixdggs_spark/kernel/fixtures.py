"""Fixture/sampling utilities completing the SURVEY section 2 surface:
cell interior grids, random points/cells, ellipsoid point lattices,
3D coordinates and the cube fold.

These are test-data generators and visualization aids in the reference
(ellipsoids.py:149-304, cell.py:833-883, cell.py:1448-1487,
dggs.py:505-594, dggs.py:1333-1370); they are deterministic here
(explicit numpy Generator) so fixtures reproduce bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from .cells import encode_planar, suid_strings, ul_vertex, vertices
from .constants import CELLS0, DggsConfig
from .latitudes import auth_lat
from .rhealpix import rhealpix_forward, rhealpix_inverse


def ellipsoid_xyz(cfg: DggsConfig, lon, lat):
    """Geodetic -> 3D rectangular (ellipsoids.py:328-350)."""
    lam = np.asarray(lon, dtype=np.float64)
    phi = np.asarray(lat, dtype=np.float64)
    if not cfg.radians:
        lam, phi = np.deg2rad(lam), np.deg2rad(phi)
    N = cfg.a / np.sqrt(1 - cfg.e**2 * np.sin(phi) ** 2)
    return (
        N * np.cos(lam) * np.cos(phi),
        N * np.sin(lam) * np.cos(phi),
        N * (1 - cfg.e**2) * np.sin(phi),
    )


def cell_interior(cfg: DggsConfig, face, digits, n: int = 2, plane: bool = True):
    """n x n interior sample grid per cell, row-major, as
    (rows, n*n, 2) (cell.py:833-883)."""
    x0, y0 = ul_vertex(cfg, face, digits)
    w = cfg.cell_width(digits.shape[1])
    eps = 1e-6
    delta = (w - 2 * eps) / (n - 1)
    # Flatten order is j-outer/i-inner, association ((ul + eps) +
    # delta*j), both matching cell.py:872-877 bit-for-bit.
    ii, jj = np.meshgrid(np.arange(n), np.arange(n))  # j outer
    px = (x0[:, None] + eps) + (delta * jj).ravel()[None, :]
    py = (y0[:, None] - eps) - (delta * ii).ravel()[None, :]
    if plane:
        return np.stack([px, py], axis=2)
    lo, la = rhealpix_inverse(cfg, px.ravel(), py.ravel())
    return np.stack([lo, la], axis=1).reshape(px.shape[0], n * n, 2)


def random_points(
    cfg: DggsConfig, n: int, seed: int = 42,
    lam_range=None, phi_range=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Area-uniform random lon/lat via the authalic sphere
    (ellipsoids.py:149-209), poles avoided, deterministic generator."""
    rng = np.random.default_rng(seed)
    PI = np.pi if cfg.radians else 180.0
    lam_min, lam_max = lam_range or (-PI, PI)
    phi_min, phi_max = phi_range or (-PI / 2, PI / 2)
    lam = rng.uniform(lam_min, lam_max, n)
    pmin, pmax = (
        (phi_min, phi_max) if cfg.radians else (np.deg2rad(phi_min), np.deg2rad(phi_max))
    )
    b0 = auth_lat(np.array([pmin]), cfg.e, radians=True)[0]
    b1 = auth_lat(np.array([pmax]), cfg.e, radians=True)[0]
    beta = np.arcsin(rng.uniform(np.sin(b0), np.sin(b1), n))
    phi = auth_lat(beta, cfg.e, radians=True, inverse=True)
    delta = np.pi / 360
    phi = np.clip(phi, -np.pi / 2 + delta, np.pi / 2 - delta)
    if not cfg.radians:
        phi = np.rad2deg(phi)
    return lam, phi


def random_cells(cfg: DggsConfig, n: int, resolution: int, seed: int = 42) -> np.ndarray:
    """Uniform random cells at a resolution (dggs.py:1351-1370)."""
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    digits = rng.integers(0, cfg.N_side**2, (n, resolution))
    return suid_strings(face, digits)


def lattice(cfg: DggsConfig, n: int = 90) -> np.ndarray:
    """2n x n lon/lat lattice (ellipsoids.py:211-247)."""
    PI = np.pi if cfg.radians else 180.0
    delta = PI / n
    lon = -PI + delta * (0.5 + np.arange(2 * n))
    lat = -PI / 2 + delta * (0.5 + np.arange(n))
    LO, LA = np.meshgrid(lon, lat, indexing="ij")
    return np.stack([LO.ravel(), LA.ravel()], axis=1)


def meridian(cfg: DggsConfig, lam: float, n: int = 200) -> np.ndarray:
    PI = np.pi if cfg.radians else 180.0
    delta = PI / n
    lat = -PI / 2 + delta * (0.5 + np.arange(n))
    return np.stack([np.full(n, lam), lat], axis=1)


def parallel(cfg: DggsConfig, phi: float, n: int = 200) -> np.ndarray:
    PI = np.pi if cfg.radians else 180.0
    delta = PI / n
    lon = -PI + delta * (0.5 + np.arange(2 * n))
    return np.stack([lon, np.full(2 * n, phi)], axis=1)


def graticule(cfg: DggsConfig, n: int = 400, spacing: float | None = None) -> np.ndarray:
    """Meridian/parallel sample grid (ellipsoids.py:268-304)."""
    PI = np.pi if cfg.radians else 180.0
    if spacing is None:
        spacing = PI / 16
    out = []
    lam = -PI
    while lam < PI:
        out.append(meridian(cfg, lam, n))
        lam += spacing
    eps = PI / 360
    phi = -PI / 2 + eps
    while phi < PI / 2:
        out.append(parallel(cfg, phi, n))
        phi += spacing
    return np.concatenate(out, axis=0)


def dggs_xyz(cfg: DggsConfig, u, v, lonlat: bool = False):
    """Planar rHEALPix point -> 3D on the ellipsoid (dggs.py:505-525)."""
    if lonlat:
        lam, phi = np.asarray(u, np.float64), np.asarray(v, np.float64)
    else:
        lam, phi = rhealpix_inverse(cfg, u, v)
    return ellipsoid_xyz(cfg, lam, phi)


def xyz_cube(cfg: DggsConfig, u, v, lonlat: bool = False):
    """Fold the planar projection onto the cube (dggs.py:527-594),
    vectorized with masks; visualization aid."""
    if lonlat:
        x, y = rhealpix_forward(cfg, u, v)
    else:
        x = np.asarray(u, dtype=np.float64).copy()
        y = np.asarray(v, dtype=np.float64).copy()
    w = cfg.cell_width(0)
    north, south = cfg.north_square, cfg.south_square
    x = x + 2 * w
    y = y + w / 2
    qx = np.empty_like(x)
    qy = np.empty_like(x)
    qz = np.empty_like(x)

    def setq(mask, xs, ys, zs):
        qx[mask], qy[mask], qz[mask] = (
            np.broadcast_to(xs, x[mask].shape),
            np.broadcast_to(ys, x[mask].shape),
            np.broadcast_to(zs, x[mask].shape),
        )

    m_s = y < 0
    xs = x[m_s] - south * w
    ys = y[m_s]
    table_s = {
        0: (xs, 0.0, ys),
        1: (ys + w, 0.0, -xs),
        2: (w - xs, 0.0, -ys - w),
        3: (-ys, 0.0, xs - w),
    }
    setq(m_s, *table_s[south])
    m_n = (~m_s) & (y > w)
    xn = x[m_n] - north * w
    yn = y[m_n]
    table_n = {
        0: (xn, w, -yn + w),
        1: (-yn + 2 * w, w, -xn),
        2: (-xn + w, w, yn - 2 * w),
        3: (yn - w, w, xn - w),
    }
    setq(m_n, *table_n[north])
    m_eq = (~m_s) & (~m_n)
    xe, ye = x[m_eq], y[m_eq]
    fo = xe < w
    fp = (xe >= w) & (xe < 2 * w)
    fq = (xe >= 2 * w) & (xe < 3 * w)
    fr = xe >= 3 * w
    ex = np.where(fo, xe, np.where(fp, w, np.where(fq, w - (xe - 2 * w), 0.0)))
    ez = np.where(fo, 0.0, np.where(fp, -(xe - w), np.where(fq, -w, (xe - 3 * w) - w)))
    qx[m_eq], qy[m_eq], qz[m_eq] = ex, ye, ez
    return qx - w / 2, qy - w / 2, qz + w / 2


def cell_random_points(cfg: DggsConfig, suid: str, n: int, seed: int = 42,
                       plane: bool = True):
    """n random points inside one cell (cell.py:1448-1487); rejection
    sampling on the ellipsoid for non-rectangular polar cells."""
    from .cells import parse_suids
    from .regions import encode1

    rng = np.random.default_rng(seed)
    f, d = parse_suids(np.array([suid]))
    if plane:
        v = vertices(cfg, f, d, plane=True)[0]
        xs = rng.uniform(v[:, 0].min(), v[:, 0].max(), n)
        ys = rng.uniform(v[:, 1].min(), v[:, 1].max(), n)
        return xs, ys
    v = np.asarray(vertices(cfg, f, d, plane=False)[0])
    lo_min, lo_max = v[:, 0].min(), v[:, 0].max()
    la_min, la_max = v[:, 1].min(), v[:, 1].max()
    res = len(suid) - 1
    out_lon, out_lat = [], []
    while len(out_lon) < n:
        lam = rng.uniform(lo_min, lo_max, 4 * n)
        phi = rng.uniform(la_min, la_max, 4 * n)
        from .cells import encode as kencode

        cells = kencode(cfg, lam, phi, res)
        ok = cells == suid
        out_lon.extend(lam[ok])
        out_lat.extend(phi[ok])
    return np.array(out_lon[:n]), np.array(out_lat[:n])
