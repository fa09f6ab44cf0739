"""spark-submit entry point: pages -> geotag extract -> res-R rHEALPix
encode -> tile-grid rollup, written as a resumable snapshot table.

This is the north-rule deployment surface. Package the engine and
submit the same command at both cluster sizes (N and 4N executors):

    cd <repo> && zip -qr rhp_pkg.zip rhealpixdggs_spark
    spark-submit --master <cluster-N>  --py-files rhp_pkg.zip \
        jobs/grid_rollup_job.py --input /data/pages \
        --output /data/tiles_r2 --resolution 9 --tile-res 2
    spark-submit --master <cluster-4N> --py-files rhp_pkg.zip ...

The job prints ONE JSON metrics line (rows in/out, wall seconds,
pages/sec, partitions written vs skipped) — diffing the two runs'
pages/sec gives the scaling efficiency. `bench.py --scaling` is the
single-box stand-in for this two-cluster protocol (BENCH/BASELINE.md).

Resume: output is a SnapshotTable partitioned by res-0 face; a rerun
after interruption skips completed partitions (per-partition lineage
manifests carry row counts + wall time).
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
                   help="pages parquet path (url, warc_ts, html, text, lang); "
                        "omitted -> synthesize --n-pages deterministic pages")
    p.add_argument("--n-pages", type=int, default=1_000_000)
    p.add_argument("--output", required=True, help="snapshot table dir")
    p.add_argument("--resolution", type=int, default=9)
    p.add_argument("--tile-res", type=int, default=2)
    p.add_argument("--fresh", action="store_true",
                   help="ignore completed partitions (no resume)")
    p.add_argument("--timed-repeats", type=int, default=1,
                   help="steady-state protocol: pages_per_sec is the best "
                        "of K compute passes (noop sink) after one untimed "
                        "warm-up; the snapshot is then written once and its "
                        "wall reported separately as snapshot_seconds. With "
                        "the default K=1 there is no warm-up pass — the "
                        "single cold compute is what's timed.")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("rhp-grid-rollup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rhealpixdggs_spark.session import tune_sql_conf

    tune_sql_conf(spark)

    # Imports resolve from --py-files on a real cluster.
    from rhealpixdggs_spark.pipeline import full_grid_rollup
    from rhealpixdggs_spark.sources.pages import synthesize_pages
    from rhealpixdggs_spark.sources.snapshots import SnapshotTable

    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = synthesize_pages(spark, args.n_pages)
    n_in = pages.count()

    def build():
        return full_grid_rollup(
            spark, pages, resolution=args.resolution, tile_res=args.tile_res
        ).withColumn("face", F.substring("tile_id", 1, 1))

    if args.timed_repeats > 1:
        build().write.format("noop").mode("overwrite").save()  # warm-up
        wall = float("inf")
        for _ in range(args.timed_repeats):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            wall = min(wall, time.time() - t0)
    else:
        t0 = time.time()
    tiles = build()

    table = SnapshotTable(args.output)
    if args.fresh:
        import shutil

        shutil.rmtree(f"{args.output}/partitions", ignore_errors=True)
        table = SnapshotTable(args.output)
    t1 = time.time()
    result = table.write_partitioned(tiles, "face")
    snapshot_seconds = time.time() - t1
    if args.timed_repeats <= 1:
        wall = time.time() - t0

    n_out = table.read_partitioned(spark).count()
    print(json.dumps({
        "job": "grid_rollup",
        "pages_in": n_in,
        "tiles_out": n_out,
        "resolution": args.resolution,
        "tile_res": args.tile_res,
        "seconds": round(wall, 3),
        "pages_per_sec": round(n_in / wall, 1),
        "snapshot_seconds": round(snapshot_seconds, 3),
        "timed_repeats": args.timed_repeats,
        "partitions_written": result["written"],
        "partitions_skipped": result["skipped"],
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
