#!/usr/bin/env python
"""Depth scaling of the single-zone distributed rasterizer
(zone_from_poly_df) on a continental-scale polygon (~40x35 deg): wall
time and emitted-cell count at res_limit 7..11. The frontier is the
zone's perimeter (O(3^level) boundary cells), so wall should grow far
slower than the emitted cell count. Also records the negative result
that motivated leaving this path WITHOUT a per-level round-robin
fan-out: the classify is one vectorized kernel call per batch
(~us/cell), so an exchange per level costs more than the Python it
parallelizes (measured res-7: 5.0 s without vs 16.4 s with).

Writes BENCH/zone_raster_depth.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POLY = [([(-10.0, 35.0), (30.0, 33.0), (32.0, 68.0), (-12.0, 70.0)], [])]


def main() -> None:
    from rhealpixdggs_spark.operators.tiling import zone_from_poly_df
    from rhealpixdggs_spark.session import get_spark

    spark = get_spark(app_name="zone-raster-depth", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    zone_from_poly_df(spark, POLY, 3).count()  # warm
    out = {"polygon": "europe-scale quad ~40x35 deg", "runs": {}}
    prev = None
    for rl in (7, 8, 9, 10, 11):
        t0 = time.time()
        n = zone_from_poly_df(spark, POLY, rl).count()
        w = time.time() - t0
        rec = {"cells": n, "wall_sec": round(w, 2)}
        if prev:
            rec["cells_x"] = round(n / prev["cells"], 2)
            rec["wall_x"] = round(w / prev["wall_sec"], 2)
        out["runs"][str(rl)] = rec
        prev = rec
        print(rl, rec, flush=True)

    out["note"] = (
        "Perimeter-frontier recursion: each +1 res_limit multiplies "
        "emitted cells ~3x but wall far less (fixed per-level job cost "
        "dominates; the vectorized classify is ~us/cell). Per-level "
        "round-robin fan-out was MEASURED and rejected for this path: "
        "res-7 run 5.0 s without vs 16.4 s with (an exchange per level "
        "costs more than the Python it parallelizes). Contrast "
        "zone_tiles_many_df where per-zone Python is ms-per-row and "
        "the fan-out pays (BENCH/zone_tiles_df_scale.json)."
    )
    path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH", "zone_raster_depth.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()
