"""Import the reference library at /root/reference as a test oracle.

The sandbox lacks pyproj/shapely/scipy/matplotlib, so we install
minimal stand-ins into sys.modules before importing the reference.
The stubs only cover what the exercised code paths touch:

- pyproj.get_ellps_map: WGS84/sphere constants (public values).
- matplotlib.path.Path.contains_point: even-odd ray crossing.
- scipy.integrate / shapely symbols: attribute placeholders (the
  oracle tests avoid code paths that call them).

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

        def _dblquad(*a, **k):  # pragma: no cover
            raise RuntimeError("scipy unavailable in sandbox")

        integrate.dblquad = _dblquad
        scipy.integrate = integrate
        sys.modules["scipy"] = scipy
        sys.modules["scipy.integrate"] = integrate

    if "shapely" not in sys.modules:
        shapely = _mod("shapely")
        geometry = _mod("shapely.geometry")
        for name in (
            "Point",
            "Polygon",
            "MultiPolygon",
            "LineString",
            "MultiLineString",
        ):
            cls = type(name, (), {})
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
