"""Import the reference library at /root/reference as a test oracle.

The sandbox lacks pyproj/shapely/scipy/matplotlib, so we install
minimal stand-ins into sys.modules before importing the reference.
The stubs only cover what the exercised code paths touch:

- pyproj.get_ellps_map: WGS84/sphere constants (public values).
- matplotlib.path.Path.contains_point: even-odd ray crossing.
- shapely Point/LineString/Polygon: minimal planar geometry
  (even-odd containment, orientation-sign segment intersection) —
  enough for cells_from_line, rhp_wrappers.polyfill/linetrace and
  conversion.CellZoneFromPoly.
- scipy.integrate.dblquad: fixed-order Gauss-Legendre quadrature
  (Cell.centroid dart/skew integrals).

This file is TEST-ONLY; the engine itself never imports the reference.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types


def _mod(name: str) -> types.ModuleType:
    """Stub module with a real ModuleSpec: importlib.util.find_spec
    on an installed stub must not raise (pyspark.testing probes
    scipy/numpy at SparkSession creation and ValueErrors on
    __spec__ = None)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


# --- minimal planar geometry stand-ins for shapely (test-only) -----------
#
# The reference's cells_from_line and conversion.CellZoneFromPoly use a
# small subset of shapely: 2-point LineString.intersects, Polygon
# contains/overlaps, Point. These stand-ins implement exactly that
# subset with the textbook predicates (even-odd ray crossing for
# point-in-polygon, orientation signs for segment intersection) — the
# same approach the matplotlib.path.Path stub above already takes.
# Shapely's exact boundary semantics (touch vs cross) differ only on
# measure-zero float coincidences that the exercised fixtures avoid.


def _orient(ax, ay, bx, by, cx, cy):
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _segments_intersect(p1, p2, q1, q2) -> bool:
    """Inclusive segment intersection (touching counts), matching
    shapely's LineString.intersects."""
    o1 = _orient(*p1, *p2, *q1)
    o2 = _orient(*p1, *p2, *q2)
    o3 = _orient(*q1, *q2, *p1)
    o4 = _orient(*q1, *q2, *p2)
    if o1 != o2 and o3 != o4:
        return True

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    if o1 == 0 and on_seg(p1, p2, q1):
        return True
    if o2 == 0 and on_seg(p1, p2, q2):
        return True
    if o3 == 0 and on_seg(q1, q2, p1):
        return True
    if o4 == 0 and on_seg(q1, q2, p2):
        return True
    return False


class Point:
    def __init__(self, *args):
        if len(args) == 1:
            self.coords_pt = (float(args[0][0]), float(args[0][1]))
        else:
            self.coords_pt = (float(args[0]), float(args[1]))


class LineString:
    def __init__(self, coords):
        self.coords_ls = [(float(x), float(y)) for x, y in coords]

    def _segs(self):
        return list(zip(self.coords_ls, self.coords_ls[1:]))

    def intersects(self, other) -> bool:
        return any(
            _segments_intersect(a0, a1, b0, b1)
            for a0, a1 in self._segs()
            for b0, b1 in other._segs()
        )


class Polygon:
    geom_type = "Polygon"
    is_valid = True  # fixtures are simple valid rings

    def __init__(self, shell):
        self.verts = [(float(x), float(y)) for x, y in shell]
        if self.verts and self.verts[0] == self.verts[-1]:
            self.verts = self.verts[:-1]

    @property
    def is_empty(self):
        return len(self.verts) < 3

    @property
    def area(self):
        v = self.verts
        n = len(v)
        a2 = sum(
            v[i][0] * v[(i + 1) % n][1] - v[(i + 1) % n][0] * v[i][1]
            for i in range(n)
        )
        return abs(a2) / 2.0

    @property
    def bounds(self):
        xs = [x for x, _ in self.verts]
        ys = [y for _, y in self.verts]
        return (min(xs), min(ys), max(xs), max(ys))

    def _inside(self, x, y) -> bool:
        inside = False
        v = self.verts
        n = len(v)
        for i in range(n):
            x1, y1 = v[i]
            x2, y2 = v[(i + 1) % n]
            if (y1 > y) != (y2 > y):
                xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                if x < xin:
                    inside = not inside
        return inside

    def _edges(self):
        v = self.verts
        return [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))]

    def _proper_cross(self, other) -> bool:
        for a0, a1 in self._edges():
            for b0, b1 in other._edges():
                o1 = _orient(*a0, *a1, *b0)
                o2 = _orient(*a0, *a1, *b1)
                o3 = _orient(*b0, *b1, *a0)
                o4 = _orient(*b0, *b1, *a1)
                if o1 * o2 < 0 and o3 * o4 < 0:
                    return True
        return False

    def contains(self, other) -> bool:
        if isinstance(other, Point):
            return self._inside(*other.coords_pt)
        return (
            all(self._inside(x, y) for x, y in other.verts)
            and not self._proper_cross(other)
        )

    def overlaps(self, other) -> bool:
        a_in = [self._inside(x, y) for x, y in other.verts]
        b_in = [other._inside(x, y) for x, y in self.verts]
        if self._proper_cross(other):
            return True
        if all(a_in) or all(b_in):
            return False  # containment either way, not an overlap
        return any(a_in) or any(b_in)


def _install_stubs():
    if "pyproj" not in sys.modules:
        pyproj = _mod("pyproj")
        pyproj.get_ellps_map = lambda: {
            "WGS84": {"a": 6378137.0, "rf": 298.257223563},
            "sphere": {"a": 6371000.0},
        }

        class _Proj:  # pragma: no cover - never used by oracle paths
            def __init__(self, *a, **k):
                raise RuntimeError("PROJ projections unavailable in sandbox")

        pyproj.Proj = _Proj
        sys.modules["pyproj"] = pyproj

    if "matplotlib" not in sys.modules:
        mpl = _mod("matplotlib")
        mpath = _mod("matplotlib.path")

        class Path:
            def __init__(self, vertices):
                self.vertices = [tuple(v) for v in vertices]

            def contains_point(self, p):
                x, y = p
                inside = False
                v = self.vertices
                n = len(v)
                for i in range(n):
                    x1, y1 = v[i]
                    x2, y2 = v[(i + 1) % n]
                    if (y1 > y) != (y2 > y):
                        xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                        if x < xin:
                            inside = not inside
                return inside

        mpath.Path = Path
        mpl.path = mpath
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.path"] = mpath

    if "scipy" not in sys.modules:
        scipy = _mod("scipy")
        integrate = _mod("scipy.integrate")

        def _dblquad(func, a, b, gfun, hfun, order=24):
            """Fixed-order Gauss-Legendre stand-in for
            scipy.integrate.dblquad: integrates func(inner, outer)
            over outer in [a, b], inner in [gfun(outer), hfun(outer)].
            The reference only integrates the smooth rHEALPix inverse
            over one cell (cell.py Cell.centroid dart/skew), where
            24x24 nodes are exact to ~1e-12."""
            import numpy as np

            x, w = np.polynomial.legendre.leggauss(order)
            ou = 0.5 * (b - a) * x + 0.5 * (b + a)
            ow = 0.5 * (b - a) * w
            total = 0.0
            for u, wu in zip(ou, ow):
                lo, hi = gfun(u), hfun(u)
                iv = 0.5 * (hi - lo) * x + 0.5 * (hi + lo)
                iw = 0.5 * (hi - lo) * w
                total += wu * sum(
                    wv * func(v, u) for v, wv in zip(iv, iw)
                )
            return total, 0.0

        integrate.dblquad = _dblquad
        scipy.integrate = integrate
        sys.modules["scipy"] = scipy
        sys.modules["scipy.integrate"] = integrate

    if "shapely" not in sys.modules:
        shapely = _mod("shapely")
        geometry = _mod("shapely.geometry")
        for name, cls in (
            ("Point", Point),
            ("Polygon", Polygon),
            ("MultiPolygon", type("MultiPolygon", (), {})),
            ("LineString", LineString),
            ("MultiLineString", type("MultiLineString", (), {})),
        ):
            setattr(shapely, name, cls)
            setattr(geometry, name, cls)
        shapely.is_valid_reason = lambda g: "Valid Geometry"
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry


def load_reference():
    """Return the reference modules (utils, pj_healpix, pj_rhealpix,
    dggs, cell) or None if unavailable."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import rhealpixdggs.cell as cell
        import rhealpixdggs.dggs as dggs
        import rhealpixdggs.pj_healpix as pj_healpix
        import rhealpixdggs.pj_rhealpix as pj_rhealpix
        import rhealpixdggs.utils as utils

        return types.SimpleNamespace(
            utils=utils,
            pj_healpix=pj_healpix,
            pj_rhealpix=pj_rhealpix,
            dggs=dggs,
            cell=cell,
        )
    except Exception:
        return None
