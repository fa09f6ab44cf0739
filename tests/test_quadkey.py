"""Quadkey column encoder vs the textbook per-level algorithm.

functions/quadkey.py computes Bing/Web-Mercator quadkeys with
closed-form tile indices and a fixed shift/mask digit extraction (one
codegen-fused expression); the reference algorithm (the public Bing
tile-system pseudocode) projects, scales to pixels, and emits one
base-4 digit per level. Both must agree exactly — the closed form is
the same arithmetic with the per-level loop unrolled.
"""

import math

from pyspark.sql import functions as F

from rhealpixdggs_spark.functions.quadkey import (
    MERCATOR_MAX_LAT,
    quadkey_encode,
)


def _qk_ref(lon: float, lat: float, level: int) -> str:
    """Textbook Bing tile-system algorithm: clamp, project, floor to
    tile indices, then per-level base-4 digits from the x/y bits."""
    lat = min(max(lat, -MERCATOR_MAX_LAT), MERCATOR_MAX_LAT)
    x = (lon + 180.0) / 360.0
    sin_lat = math.sin(math.radians(lat))
    y = 0.5 - math.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * math.pi)
    n = 1 << level
    tx = min(max(int(math.floor(x * float(n))), 0), n - 1)
    ty = min(max(int(math.floor(y * float(n))), 0), n - 1)
    digits = []
    for i in range(level, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if tx & mask:
            digit += 1
        if ty & mask:
            digit += 2
        digits.append(str(digit))
    return "".join(digits)


class TestQuadkey:
    def test_level1_quadrants(self, spark):
        # level-1 tiles are the four map quadrants, NW=0 NE=1 SW=2 SE=3
        quads = [(-90.0, 40.0, "0"), (90.0, 40.0, "1"),
                 (-90.0, -40.0, "2"), (90.0, -40.0, "3")]
        df = spark.createDataFrame(
            [(lo, la) for lo, la, _ in quads], "lon double, lat double"
        ).select("lon", "lat", quadkey_encode(F.col("lon"), F.col("lat"), 1).alias("qk"))
        got = {(r.lon, r.lat): r.qk for r in df.collect()}
        for lo, la, want in quads:
            assert got[(lo, la)] == want

    def test_prefix_is_parent_tile(self, spark):
        df = spark.createDataFrame(
            [(13.4, 52.5)], "lon double, lat double"
        ).select(
            quadkey_encode(F.col("lon"), F.col("lat"), 12).alias("qk12"),
            quadkey_encode(F.col("lon"), F.col("lat"), 5).alias("qk5"),
        )
        r = df.first()
        assert r.qk12[:5] == r.qk5

    def test_matches_textbook_on_fixture(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        pts = entrymod._points(spark, sf_dir)
        rows = pts.select(
            "pid", "lon", "lat",
            quadkey_encode(F.col("lon"), F.col("lat"), 12).alias("qk"),
        ).collect()
        assert rows
        for r in rows:
            assert r.qk == _qk_ref(r.lon, r.lat, 12), (r.pid, r.lon, r.lat)

    def test_poles_and_dateline_clamp(self, spark):
        edges = [(-180.0, 0.0), (180.0, 0.0), (0.0, 90.0), (0.0, -90.0),
                 (179.999, MERCATOR_MAX_LAT), (-179.999, -MERCATOR_MAX_LAT)]
        df = spark.createDataFrame(edges, "lon double, lat double").select(
            "lon", "lat", quadkey_encode(F.col("lon"), F.col("lat"), 8).alias("qk")
        )
        for r in df.collect():
            assert len(r.qk) == 8
            assert set(r.qk) <= set("0123")
            assert r.qk == _qk_ref(r.lon, r.lat, 8)
