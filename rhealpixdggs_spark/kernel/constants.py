"""Ellipsoid and DGGS configuration constants.

Re-derivation of the reference's ``Ellipsoid`` / ``RHEALPixDGGS``
constructors (reference: ellipsoids.py:67-112, dggs.py:215-234) as a
frozen dataclass of plain floats, suitable for capture inside a pandas
UDF closure (broadcast once per executor, no object graph).

WGS84 parameters are the public defining constants (semi-major axis
6378137.0 m, inverse flattening 298.257223563); the reference reads the
same values out of pyproj (ellipsoids.py:33-38) which is unavailable
offline, so they are hardcoded here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# Level 0 cell IDs (reference: cell.py:11).
CELLS0 = ("N", "O", "P", "Q", "R", "S")

WGS84_A = 6378137.0
WGS84_RF = 298.257223563
WGS84_F = 1.0 / WGS84_RF
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E = math.sqrt(WGS84_F * (2.0 - WGS84_F))


def auth_rad(a: float, e: float, inverse: bool = False) -> float:
    """Radius of the authalic sphere (reference: utils.py:346-380)."""
    if e == 0:
        return a
    k = math.sqrt(0.5 * (1 - (1 - e**2) / (2 * e) * math.log((1 - e) / (1 + e))))
    return a * k if not inverse else a / k


WGS84_R_A = auth_rad(WGS84_A, WGS84_E)  # 6371007.180918476


@dataclass(frozen=True)
class DggsConfig:
    """All scalars a kernel needs. Mirrors RHEALPixDGGS.__init__
    (reference: dggs.py:215-234) without any object graph.

    Only N_side=3 is exercised by the engine's public API (suid strings
    concatenate face+digits only when N_side**2 < 10, cell.py:181-188),
    but the math keeps N_side symbolic.
    """

    a: float = WGS84_A
    e: float = WGS84_E
    f: float = WGS84_F
    R_A: float = WGS84_R_A
    N_side: int = 3
    north_square: int = 0
    south_square: int = 0
    max_areal_resolution: float = 1.0  # square metres
    radians: bool = False
    lon_0: float = 0.0
    lat_0: float = 0.0
    max_resolution: int = field(init=False, default=0)

    def __post_init__(self):
        # reference: dggs.py:229-234
        object.__setattr__(
            self,
            "max_resolution",
            int(
                math.ceil(
                    math.log(self.R_A**2 * (2 * math.pi / 3) / self.max_areal_resolution)
                    / (2 * math.log(self.N_side))
                )
            ),
        )

    # --- closed-form grid metrics (no UDF needed on the Spark side) ---

    def cell_width(self, resolution: int) -> float:
        """Planar cell width (reference: dggs.py:671-687)."""
        return self.R_A * (math.pi / 2) * self.N_side ** (-resolution)

    def cell_area(self, resolution: int, plane: bool = True) -> float:
        """Planar / ellipsoidal cell area (reference: dggs.py:689-708)."""
        w = self.cell_width(resolution)
        return w**2 if plane else 8 / (3 * math.pi) * w**2

    def num_cells(self, res_1: int, res_2: int | None = None, subcells: bool = False) -> int:
        """Closed-form cell counts (reference: dggs.py:633-669)."""
        k = self.N_side**2
        if subcells:
            if res_2 is None or res_2 < res_1:
                res_2 = self.max_resolution
            return int((k ** (res_2 - res_1 + 1) - 1) / (k - 1))
        if res_2 is None or res_2 < res_1:
            res_2 = res_1
        return int(6 * (k ** (res_2 + 1) - k**res_1) / (k - 1))

    def ul_vertex_face(self, face_index: int) -> tuple[float, float]:
        """Upper-left vertex of a resolution-0 cell, scaled by R_A
        (reference: dggs.py:266-277)."""
        pi = math.pi
        table = {
            0: (-pi + self.north_square * pi / 2, 3 * pi / 4),
            1: (-pi, pi / 4),
            2: (-pi / 2, pi / 4),
            3: (0.0, pi / 4),
            4: (pi / 2, pi / 4),
            5: (-pi + self.south_square * pi / 2, -pi / 4),
        }
        x, y = table[face_index]
        return (self.R_A * x, self.R_A * y)


WGS84_003 = DggsConfig()
WGS84_003_RADIANS = DggsConfig(radians=True)
UNIT_003 = DggsConfig(a=1.0, e=0.0, f=0.0, R_A=1.0)
UNIT_003_RADIANS = DggsConfig(a=1.0, e=0.0, f=0.0, R_A=1.0, radians=True)
