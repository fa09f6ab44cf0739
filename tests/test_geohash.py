"""Geohash column encoder vs the textbook iterative bisection.

functions/geohash.py computes geohashes with closed-form axis indices
and a fixed shift/mask interleave (one codegen-fused expression); the
reference algorithm bisects the lon/lat spans bit by bit. Both must
agree exactly — the closed form is the same arithmetic with the
bisection unrolled.
"""

from pyspark.sql import functions as F

from rhealpixdggs_spark.functions.geohash import (
    GEOHASH_BASE32,
    geohash_encode,
)


def _gh_ref(lon: float, lat: float, precision: int) -> str:
    lo_lat, hi_lat = -90.0, 90.0
    lo_lon, hi_lon = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2.0
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2.0
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    return "".join(
        GEOHASH_BASE32[int("".join(map(str, bits[i : i + 5])), 2)]
        for i in range(0, 5 * precision, 5)
    )


class TestGeohash:
    def test_known_value(self, spark):
        # the canonical geohash example cell
        df = spark.range(1).select(
            geohash_encode(
                F.lit(-5.60302734375), F.lit(42.60498046875), 5
            ).alias("gh")
        )
        assert df.first()["gh"] == "ezs42"

    def test_matches_iterative_reference_on_fixture(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        pts = entrymod._points(spark, sf_dir)
        rows = pts.select(
            "pid",
            "lon",
            "lat",
            geohash_encode(F.col("lon"), F.col("lat"), 7).alias("gh"),
        ).collect()
        assert rows
        for r in rows:
            assert r.gh == _gh_ref(r.lon, r.lat, 7), (r.pid, r.lon, r.lat)

    def test_poles_and_dateline_clamp(self, spark):
        edges = [(-180.0, 0.0), (180.0, 0.0), (0.0, 90.0), (0.0, -90.0)]
        df = spark.createDataFrame(edges, "lon double, lat double").select(
            "lon", "lat", geohash_encode(F.col("lon"), F.col("lat"), 6).alias("gh")
        )
        for r in df.collect():
            assert len(r.gh) == 6
            assert all(c in GEOHASH_BASE32 for c in r.gh)
