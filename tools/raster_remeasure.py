"""Targeted re-measure of the `raster_to_vector` contract query.

Round-4 verdict item 6: r4 read 0.765 s vs r3's 0.516 s (IQR 0.137),
the only above-noise movement in the headline suite, but the two
rounds ran under DIFFERENT pure-CPU controls (851.5M vs 729.9M
ops/s), so the delta needed a matched-control re-measure before being
read as a regression.

Protocol: one untimed warm-up, then N timed noop-sink runs of the
exact contract plan at sf0.1 / local[32], stamped with the same
32-process pure-CPU control `bench.py` uses, plus a cumulative
phase breakdown (grid-only -> +encode -> +rollup) to locate any real
cost. Findings live in BENCH/raster_remeasure.json and the round-5
section of BENCH/BASELINE.md.

Usage: python tools/raster_remeasure.py [reps] [> BENCH/raster_remeasure.json]
"""

import importlib.util
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402


def _median_iqr(runs):
    qs = statistics.quantiles(runs, n=4)
    return {
        "median": round(statistics.median(runs), 3),
        "iqr": round(qs[2] - qs[0], 3),
        "min": round(min(runs), 3),
        "max": round(max(runs), 3),
        "runs": len(runs),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("raster_remeasure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    import bench as benchmod

    cpu32 = benchmod._cpu_control(32)

    spec = importlib.util.spec_from_file_location(
        "entrymod", str(REPO / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    q = m.queries()["raster_to_vector"]
    sf = "/root/testdata/sf0.1"

    def timed(df_fn):
        df_fn().write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(reps):
            t0 = time.monotonic()
            df_fn().write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return _median_iqr(runs)

    full = timed(lambda: q(spark, sf))

    print(
        json.dumps(
            {
                "query": "raster_to_vector",
                "sf": 0.1,
                "master": "local[32]",
                **full,
                "cpu_control_procs_32": round(cpu32, 1),
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
