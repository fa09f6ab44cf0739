"""spark-submit entry point: points/pages -> res-R rHEALPix encode ->
multi-resolution zone assignment (distributed CellZoneFromPoly +
single-scan containment join) -> per-tile counts written as a
resumable snapshot table.

Deployment surface, same shape as grid_rollup_job:

    cd <repo> && zip -qr rhp_pkg.zip rhealpixdggs_spark
    spark-submit --master <cluster> --py-files rhp_pkg.zip \
        jobs/zone_assign_job.py --output /data/zone_counts \
        --zones /data/zones.json --res-limit 9 --resolution 9

`--zones` is a JSON file {zone_name: [[exterior_ring, [holes...]]...]}
with rings as [[lon, lat], ...]; omitted -> the vendored reference
catchment polygon (and synthesized points in its bbox) so the job is
self-contained for smoke runs. Zone rasterization runs lock-step
across all zones (zone_tiles_many: <= res_limit+1 jobs total); the
assignment join scans the big side once and broadcasts the zone table.

Prints ONE JSON metrics line (points in, assignments, tiles, wall
seconds, points/sec, partitions written vs skipped).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=None,
                   help="points parquet (pid, lon, lat); omitted -> "
                        "synthesize --n-points in the zones' bbox")
    p.add_argument("--n-points", type=int, default=1_000_000)
    p.add_argument("--zones", default=None,
                   help="JSON zones file; omitted -> vendored catchment")
    p.add_argument("--output", required=True, help="snapshot table dir")
    p.add_argument("--resolution", type=int, default=9)
    p.add_argument("--res-limit", type=int, default=9)
    p.add_argument("--fresh", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("rhp-zone-assign").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rhealpixdggs_spark.session import tune_sql_conf

    tune_sql_conf(spark)

    from rhealpixdggs_spark.functions.udfs import rhp_encode
    from rhealpixdggs_spark.operators.joins import containment_join
    from rhealpixdggs_spark.operators.tiling import zone_tiles_many
    from rhealpixdggs_spark.sources.snapshots import SnapshotTable

    if args.zones:
        with open(args.zones) as f:
            zones = {
                name: [(poly[0], poly[1] if len(poly) > 1 else [])
                       for poly in polys]
                for name, polys in json.load(f).items()
            }
    else:
        import importlib.resources as res

        with res.files("rhealpixdggs_spark").joinpath(
            "data/catchment_12104622.json"
        ).open() as f:
            zones = {"catchment": [(json.load(f)["polygon"], [])]}

    if args.input:
        pts = spark.read.parquet(args.input)
    else:
        # deterministic points in the zones' bbox
        allv = [v for polys in zones.values() for ext, _h in polys for v in ext]
        lo0, lo1 = min(v[0] for v in allv), max(v[0] for v in allv)
        la0, la1 = min(v[1] for v in allv), max(v[1] for v in allv)
        base = spark.range(0, args.n_points)
        pts = base.select(
            F.col("id").alias("pid"),
            (F.col("id") * 9973 % 100000 / 100000.0 * (lo1 - lo0) + lo0
             ).alias("lon"),
            (F.col("id") * 7919 % 100000 / 100000.0 * (la1 - la0) + la0
             ).alias("lat"),
        )
    n_in = pts.count()

    t0 = time.time()
    tiles = zone_tiles_many(spark, zones, args.res_limit)
    enc = pts.withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), args.resolution)
    )
    assigned = containment_join(enc, tiles)
    counts = (
        assigned.groupBy("zone", "tile_id", "res")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .withColumn("face", F.substring("tile_id", 1, 1))
    )

    table = SnapshotTable(args.output)
    if args.fresh:
        import shutil

        shutil.rmtree(f"{args.output}/partitions", ignore_errors=True)
        table = SnapshotTable(args.output)
    result = table.write_partitioned(counts, "face")
    wall = time.time() - t0

    out = table.read_partitioned(spark)
    n_tiles = out.count()
    n_assigned = out.agg(F.sum("n_points")).first()[0] or 0
    print(json.dumps({
        "job": "zone_assign",
        "points_in": n_in,
        "assignments": int(n_assigned),
        "tiles_out": n_tiles,
        "resolution": args.resolution,
        "res_limit": args.res_limit,
        "seconds": round(wall, 3),
        "points_per_sec": round(n_in / wall, 1),
        "partitions_written": result["written"],
        "partitions_skipped": result["skipped"],
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
