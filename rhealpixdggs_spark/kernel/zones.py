"""Multi-resolution cell zones from polygons (reference conversion.py).

get_finest_containing_cell (conversion.py:7-36) and CellZoneFromPoly
(conversion.py:40-111) re-derived without shapely: polygon-polygon
predicates are implemented with vectorized even-odd containment and
orientation-sign proper-crossing tests over the coordinate rings.

Geometry is (exterior_ring, holes) pairs in lon/lat degrees, the same
shape polyfill takes. Cell polygons are the 4-vertex ellipsoidal
rings the reference builds with Polygon(cell.vertices(plane=False)).
"""

from __future__ import annotations

import numpy as np

from .cells import nucleus, parse_suids, vertices
from .constants import CELLS0, DggsConfig
from .regions import points_in_polygon, subcells


def _edges(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring, np.roll(ring, -1, axis=0)


def _proper_crossings(ring_a, ring_b) -> bool:
    """Any pair of edges (one from each ring) crossing properly
    (interiors intersect transversally)."""
    a0, a1 = _edges(ring_a)
    b0, b1 = _edges(ring_b)

    # Orientation of point c relative to segment (a0, a1), vectorized
    # over all (edge_a, edge_b) pairs.
    def orient(p0, p1, q):
        return np.sign(
            (p1[:, None, 0] - p0[:, None, 0]) * (q[None, :, 1] - p0[:, None, 1])
            - (p1[:, None, 1] - p0[:, None, 1]) * (q[None, :, 0] - p0[:, None, 0])
        )

    o1 = orient(a0, a1, b0)
    o2 = orient(a0, a1, b1)
    o3 = orient(b0, b1, a0).T
    o4 = orient(b0, b1, a1).T
    return bool(np.any((o1 * o2 < 0) & (o3 * o4 < 0)))


class _Geometry:
    """A (multi)polygon with precomputed edge arrays."""

    def __init__(self, polygons):
        # polygons: list of (exterior, holes)
        self.polys = [
            (np.asarray(ext, dtype=np.float64), [np.asarray(h, np.float64) for h in holes])
            for ext, holes in polygons
        ]

    def contains_points(self, px, py) -> np.ndarray:
        out = np.zeros(np.shape(px), dtype=bool)
        for ext, holes in self.polys:
            out |= points_in_polygon(px, py, ext, holes)
        return out

    def rings(self):
        for ext, holes in self.polys:
            yield ext
            yield from holes

    def contains_ring(self, ring) -> bool:
        """shapely-style A.contains(B) for B a simple 4-ish-gon: all of
        B inside A's interior closure, no proper boundary crossings."""
        ring = np.asarray(ring, dtype=np.float64)
        if not self.contains_points(ring[:, 0], ring[:, 1]).all():
            return False
        return not any(_proper_crossings(r, ring) for r in self.rings())

    def overlaps_ring(self, ring) -> bool:
        """shapely-style A.overlaps(B): interiors partially intersect.
        In the zone recursion B never contains A's full geometry at the
        call sites (children of the finest containing cell), so partial
        intersection reduces to: a proper crossing, or a B vertex
        strictly inside A while another is outside, or an A vertex
        strictly inside B."""
        ring = np.asarray(ring, dtype=np.float64)
        inside = self.contains_points(ring[:, 0], ring[:, 1])
        if inside.any() and not inside.all():
            return True
        if any(_proper_crossings(r, ring) for r in self.rings()):
            return True
        if not inside.any():
            gins = [
                points_in_polygon(ext[:, 0], ext[:, 1], ring)
                for ext, _holes in self.polys
            ]
            # Interiors intersect iff some geometry vertex is in the
            # cell; shapely overlaps is False only when the cell
            # contains the ENTIRE (multi)geometry — every part's
            # vertices inside. One part wholly inside the cell with
            # another part elsewhere IS an overlap (dateline-split
            # geometries hit this).
            if any(g.any() for g in gins) and not all(g.all() for g in gins):
                return True
            return False
        # All ring vertices inside with no crossing -> A contains B.
        return False


def _unwrap_rings(rings: np.ndarray, half: float) -> np.ndarray:
    """Make each ring's longitudes continuous (consecutive deltas
    within +/-half). Cells in the seam column decode their east edge
    as -180 where +180 is meant (wrap_longitude), which inverts the
    ring for every planar predicate; unwrapping restores the true
    shape (possibly extending past +/-180 — see _ring_variants)."""
    rings = np.array(rings, dtype=np.float64)
    lon = rings[..., 0]
    d = np.diff(lon, axis=-1)
    step = np.where(d > half, -2 * half, np.where(d < -half, 2 * half, 0.0))
    lon[..., 1:] += np.cumsum(step, axis=-1)
    return rings


def _ring_variants(ring: np.ndarray, half: float):
    """The ring plus, for seam-spanning rings that extend past
    +/-half after unwrapping, its 360-degree-shifted copy — a
    predicate against geometry in [-180, 180] must hold for EITHER
    representation (they are a full revolution apart, so at most one
    can intersect the geometry)."""
    out = [ring]
    if ring[:, 0].max() > half:
        out.append(ring - np.array([2 * half, 0.0]))
    if ring[:, 0].min() < -half:
        out.append(ring + np.array([2 * half, 0.0]))
    return out


def _cell_ring_ellipsoidal(cfg: DggsConfig, suid: str) -> np.ndarray:
    f, d = parse_suids(np.array([suid]))
    half = np.pi if cfg.radians else 180.0
    return _unwrap_rings(
        np.asarray(vertices(cfg, f, d, plane=False)), half
    )[0]


def _points_in_rings_batch(px, py, rings: np.ndarray) -> np.ndarray:
    """Even-odd ray crossing of M points against N 4-vertex rings,
    broadcast to (N, M) — the same formula as regions.points_in_ring,
    with horizontal edges contributing no crossing."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    a0 = rings
    a1 = np.roll(rings, -1, axis=1)
    x1, y1 = a0[:, :, 0][:, :, None], a0[:, :, 1][:, :, None]  # (N,4,1)
    x2, y2 = a1[:, :, 0][:, :, None], a1[:, :, 1][:, :, None]
    crosses = (y1 > py) != (y2 > py)  # (N,4,M)
    # over=: near-horizontal edges can overflow the quotient; masked
    # by `crosses` so the value is never used
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    return np.bitwise_xor.reduce(crosses & (px < xin), axis=1)  # (N,M)


def _crossings_batch(rings: np.ndarray, geom_rings) -> np.ndarray:
    """Proper-crossing test (same orientation-sign predicate as
    _proper_crossings) between each of N cell rings and any geometry
    ring, vectorized to (N, 4, M) per geometry ring."""
    a0 = rings
    a1 = np.roll(rings, -1, axis=1)
    ax0, ay0 = a0[:, :, 0][:, :, None], a0[:, :, 1][:, :, None]  # (N,4,1)
    ax1, ay1 = a1[:, :, 0][:, :, None], a1[:, :, 1][:, :, None]
    out = np.zeros(rings.shape[0], dtype=bool)

    def orient(p0x, p0y, p1x, p1y, qx, qy):
        return np.sign((p1x - p0x) * (qy - p0y) - (p1y - p0y) * (qx - p0x))

    for ring in geom_rings:
        b0, b1 = _edges(ring)
        bx0, by0 = b0[:, 0], b0[:, 1]  # (M,)
        bx1, by1 = b1[:, 0], b1[:, 1]
        o1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
        o2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
        o3 = orient(bx0, by0, bx1, by1, ax0, ay0)
        o4 = orient(bx0, by0, bx1, by1, ax1, ay1)
        out |= ((o1 * o2 < 0) & (o3 * o4 < 0)).any(axis=(1, 2))
    return out


def classify_batch(cfg: DggsConfig, suids: np.ndarray, geom: _Geometry):
    """(contains, overlaps, nucleus_in) for a batch of cells against one
    geometry — the per-level predicate of the distributed zone loop
    (operators/tiling.zone_from_poly_df). Bitwise-identical semantics
    to contains_ring / overlaps_ring / the nucleus test in
    zone_from_poly below, evaluated for N cells at once: one
    points-in-polygon pass over the 4N vertices, one (N,4,M)
    orientation-sign crossing pass per geometry ring."""
    suids = np.asarray(suids, dtype=str)
    n = suids.shape[0]
    if n == 0:
        z = np.zeros(0, dtype=bool)
        return z, z.copy(), z.copy()
    half = np.pi if cfg.radians else 180.0
    f, d = parse_suids(suids)
    rings = _unwrap_rings(
        np.asarray(vertices(cfg, f, d, plane=False)), half
    )  # (N,4,2), lon-continuous (see _unwrap_rings)

    def classify_rings(rg, nsub):
        inside = geom.contains_points(
            rg[:, :, 0].ravel(), rg[:, :, 1].ravel()
        ).reshape(nsub, 4)
        allin = inside.all(axis=1)
        anyin = inside.any(axis=1)
        cross = _crossings_batch(rg, list(geom.rings()))
        cont = allin & ~cross
        # Disjoint-vertex case of overlaps_ring: some geometry vertex
        # is in the cell but the cell does not contain the ENTIRE
        # (multi)geometry (matching the scalar predicate — one part
        # wholly inside with another part elsewhere IS an overlap).
        g_any = np.zeros(nsub, dtype=bool)
        g_all = np.ones(nsub, dtype=bool)
        for ext, _holes in geom.polys:
            gin = _points_in_rings_batch(ext[:, 0], ext[:, 1], rg)
            g_any |= gin.any(axis=1)
            g_all &= gin.all(axis=1)
        poke = g_any & ~g_all
        return cont, (anyin & ~allin) | cross | (~anyin & poke)

    contains, overlaps = classify_rings(rings, n)
    # Seam-spanning rings (extend past +/-half after unwrap) must also
    # be tested a full revolution away — the geometry may be given on
    # the other side of the dateline (see _ring_variants).
    for mask, shift in (
        (rings[:, :, 0].max(axis=1) > half, -2 * half),
        (rings[:, :, 0].min(axis=1) < -half, 2 * half),
    ):
        if mask.any():
            r2 = rings[mask].copy()
            r2[:, :, 0] += shift
            c2, o2 = classify_rings(r2, int(mask.sum()))
            contains[mask] |= c2
            overlaps[mask] |= o2
    lo, la = nucleus(cfg, f, d, plane=False)
    nucleus_in = geom.contains_points(np.asarray(lo), np.asarray(la))
    return contains, overlaps, nucleus_in


def get_finest_containing_cell(cfg: DggsConfig, polygons) -> str | None:
    """Finest single cell wholly containing the geometry
    (conversion.py:7-36): recursive descent picking the first child
    whose polygon contains the geometry."""
    geom = _Geometry(polygons)
    half = np.pi if cfg.radians else 180.0

    def geom_inside_one(cell_ring) -> bool:
        for ext, holes in geom.polys:
            if not points_in_polygon(ext[:, 0], ext[:, 1], cell_ring).all():
                return False
            if _proper_crossings(cell_ring, ext):
                return False
        return True

    def geom_inside_cell(suid: str) -> bool:
        ring = _cell_ring_ellipsoidal(cfg, suid)
        return any(geom_inside_one(v) for v in _ring_variants(ring, half))

    def descend(suid: str) -> str | None:
        for child in subcells(cfg, suid):
            if child != suid and geom_inside_cell(child):
                return descend(child)
        return suid if geom_inside_cell(suid) else None

    for face in CELLS0:
        found = descend(face)
        if found is not None:
            return found
    return None


def zone_from_poly(
    cfg: DggsConfig,
    polygons,
    res_limit: int,
    bounding_cell: str | None = None,
) -> list[str]:
    """Compact multi-resolution zone covering the geometry
    (CellZoneFromPoly, conversion.py:40-111): recursive subdivision
    keeping fully-contained children, nucleus test at res_limit."""
    geom = _Geometry(polygons)
    half = np.pi if cfg.radians else 180.0

    def contains_any(ring) -> bool:
        return any(geom.contains_ring(v) for v in _ring_variants(ring, half))

    def overlaps_any(ring) -> bool:
        return any(geom.overlaps_ring(v) for v in _ring_variants(ring, half))

    roots: list[str]
    if bounding_cell is None:
        bounding_cell = get_finest_containing_cell(cfg, polygons)
        # Geometry spanning several res-0 faces has no single bounding
        # cell; recurse from every face that overlaps it.
        roots = [bounding_cell] if bounding_cell is not None else list(CELLS0)
    else:
        roots = [bounding_cell]
    out: list[str] = []

    def nucleus_inside(suid: str) -> bool:
        f, d = parse_suids(np.array([suid]))
        lo, la = nucleus(cfg, f, d, plane=False)
        return bool(geom.contains_points(np.array(lo), np.array(la))[0])

    def get_dggs_poly(cell: str):
        ring = _cell_ring_ellipsoidal(cfg, cell)
        if contains_any(ring):
            out.append(cell)
            return
        if len(cell) - 1 + 1 > res_limit:
            return
        for child in subcells(cfg, cell):
            if child == cell:
                continue
            cring = _cell_ring_ellipsoidal(cfg, child)
            if contains_any(cring):
                out.append(child)
            elif len(child) - 1 == res_limit:
                if nucleus_inside(child):
                    out.append(child)
            else:
                if overlaps_any(cring):
                    get_dggs_poly(child)

    for root in roots:
        ring = _cell_ring_ellipsoidal(cfg, root)
        if len(roots) == 1 or overlaps_any(ring) or contains_any(ring):
            get_dggs_poly(root)
    return out
