"""Two-parallelism scale evidence for the round-5 operators:

- bm25_topk over a 100x-replicated document corpus (500k docs from the
  sf0.1 fixture) — measures the posting-prune design: the shuffled
  volume is query-term postings only, so wall time should track corpus
  scan + pruned-posting agg, and the 8->32 core efficiency should sit
  near the box's pure-CPU ceiling;
- hex7_compact over the full res-7 descendant set of 3 roots (2.47M
  cells, 10% holes) — measures the per-level groupBy/anti-join ladder.

Protocol matches bench.py --scaling: one fresh JVM per master,
median-of-3 wall with one warmup, pure-CPU control stamped per level,
JSON written to BENCH/retrieval_scale.json.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOCS_MULT = int(os.environ.get("BM25_DOCS_MULT", "100"))
CORPUS = f"/tmp/rhp_bm25_docs_x{DOCS_MULT}"
MASTERS = [int(x) for x in os.environ.get("SCALE_MASTERS", "8,32").split(",")]
RUNS = 3

QS = [("q1", "scan"), ("q1", "filter"), ("q2", "join"), ("q2", "hash"),
      ("q2", "merge"), ("q3", "window"), ("q3", "stream"), ("q4", "sort"),
      ("q4", "order"), ("q4", "key")]


def _session(n):
    return (
        SparkSession.builder.master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        # Size scan splits for the workload: the 50 MB corpus packs
        # into ~3 default (128 MB + 4 MB open-cost) partitions, which
        # would serialize the token-explode map stage at any core
        # count. A real 100 TB table has thousands of natural splits.
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .appName(f"retrieval_scale_{n}")
        .getOrCreate()
    )


def _prep_corpus(spark):
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = docs.crossJoin(
        spark.range(DOCS_MULT).select(F.col("id").alias("_r"))
    ).select(
        (F.col("doc_id") + F.col("_r") * F.lit(stride)).alias("doc_id"),
        "text",
    )
    # 64 files so every master level gets a parallel scan (a single
    # 50 MB file would serialize the map side at any core count).
    rep.repartition(64).write.mode("overwrite").parquet(CORPUS)


def _bm25(spark):
    from rhealpixdggs_spark.operators.ranking import bm25_topk

    docs = spark.read.parquet(CORPUS)
    q = spark.createDataFrame(QS, "query_id string, term string")
    bm25_topk(docs, q, k=10).write.format("noop").mode("overwrite").save()


def _hex7(spark):
    from rhealpixdggs_spark.functions.hex7_udfs import hex7_children, hex7_encode
    from rhealpixdggs_spark.operators.hex7_sets import hex7_compact

    pts = spark.createDataFrame(
        [(0, 2.0, 48.0), (1, -74.0, 40.0), (2, 151.0, -33.0)],
        "i int, lon double, lat double",
    )
    out = pts.select(hex7_encode(F.col("lon"), F.col("lat"), 0).alias("cell"))
    for r in range(8):
        out = out.select(F.explode(hex7_children(F.col("cell"), r)).alias("cell"))
        if r == 2:
            # fan the 1-partition seed out so the remaining 7^4-per-row
            # explode runs parallel (fixture construction, not the op)
            out = out.repartition(
                out.sparkSession.sparkContext.defaultParallelism
            )
    kept = out.where(F.col("cell") % 10 != 3)  # ~10% holes
    hex7_compact(kept, "cell").write.format("noop").mode("overwrite").save()


def _cpu_control(n_procs, seconds=2.0):
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        x = 0
        while time.time() - t0 < seconds:
            for _ in range(10000):
                x += 1
        q.put(x)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(n_procs)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total / seconds


def main():
    boot = _session(8)
    _prep_corpus(boot)
    n_docs = boot.read.parquet(CORPUS).count()
    boot.stop()

    result = {"n_docs": n_docs, "hex7_cells": 3 * 7**8, "runs": RUNS,
              "levels": {}}
    for n in MASTERS:
        spark = _session(n)
        level = {"cpu_control": _cpu_control(n)}
        for name, fn in (("bm25_topk", _bm25), ("hex7_compact", _hex7)):
            fn(spark)  # warmup
            walls = []
            for _ in range(RUNS):
                t0 = time.time()
                fn(spark)
                walls.append(time.time() - t0)
            level[name] = {
                "median_s": round(statistics.median(walls), 3),
                "min_s": round(min(walls), 3),
                "max_s": round(max(walls), 3),
            }
        spark.stop()
        result["levels"][str(n)] = level

    pair = f"{MASTERS[0]}to{MASTERS[1]}"
    lo = result["levels"][str(MASTERS[0])]
    hi = result["levels"][str(MASTERS[1])]
    cores = MASTERS[1] / MASTERS[0]
    for name in ("bm25_topk", "hex7_compact"):
        result[f"{name}_{pair}_eff"] = round(
            (lo[name]["median_s"] / hi[name]["median_s"]) / cores, 3
        )
    result[f"cpu_ceiling_{pair}"] = round(
        (hi["cpu_control"] / lo["cpu_control"]) / cores, 3
    )
    suffix = "" if DOCS_MULT == 100 else f"_x{DOCS_MULT}"
    if pair != "8to32":
        suffix += f"_{pair}"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", f"retrieval_scale{suffix}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
