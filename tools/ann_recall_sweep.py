#!/usr/bin/env python
"""ANN recall-vs-cost sweep (round-4 verdict item 3, table half).

The `ann_recall` contract query gates the recall AGGREGATION itself
(bit-exact DuckDB twin at 3 queries / k=5). This sweep produces the
decision table a user picks a path by: recall@10 over 64 queries on
the sf0.1 embeddings fixture for every ANN path and its tuning knob,
plus the two costs that matter —

  cand_frac  — candidate pairs scored / (n_vectors x n_queries): the
               fraction of the corpus each query actually scans. This
               is the 100-TB cost (scan + shuffle volume); on a
               2k-row fixture it is the signal, wall time is not.
  wall_sec   — median-of-3 local wall seconds (noop write), honest
               but fixture-sized.

Methods: brute (recall 1.0 by construction), RP-LSH at n_planes in
{2, 4, 6, 8}, IVF (Lloyd-trained k=16 codebook) at nprobe in
{1, 2, 4, 8}, int8 quantized brute. Output: one JSON blob; --write
stores BENCH/ann_recall.json and prints a markdown table for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rhealpixdggs_spark.operators.similarity import (
        cosine_topk_brute,
        cosine_topk_ivf,
        cosine_topk_lsh,
        cosine_topk_quantized,
        ivf_assign_expr,
        ivf_probes_expr,
        ivf_train,
        rp_bucket_expr,
        _hyperplanes,
    )

    spark = (
        SparkSession.builder.appName("ann_recall_sweep").master(args.master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    emb = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
            .alias("embedding"),
        )
        .cache()
    )
    n_vec = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    ).cache()
    n_q = queries.count()
    dim = len(emb.select("embedding").first()[0])

    brute_df = cosine_topk_brute(emb, queries, K).select(
        "query_id", "vec_id"
    ).cache()
    brute_total = brute_df.count()

    cents = ivf_train(emb, k=16, iters=3)

    def recall_of(df) -> float:
        hits = (
            df.select("query_id", "vec_id")
            .join(brute_df, ["query_id", "vec_id"])
            .count()
        )
        return round(hits / brute_total, 4)

    def wall_of(build) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return round(statistics.median(runs), 3)

    all_pairs = n_vec * n_q
    rows = []

    rows.append({
        "method": "brute", "param": "-", "recall_at_10": 1.0,
        "cand_frac": 1.0,
        "wall_sec": wall_of(lambda: cosine_topk_brute(emb, queries, K)),
    })

    for n_planes in [2, 4, 6, 8]:
        planes = _hyperplanes(dim, n_planes, seed=42)
        cand = (
            emb.withColumn("b", rp_bucket_expr(F.col("embedding"), planes))
            .join(
                F.broadcast(queries.withColumn(
                    "b", rp_bucket_expr(F.col("q_embedding"), planes)
                )),
                "b",
            ).count()
        )
        df = cosine_topk_lsh(emb, queries, K, dim=dim, n_planes=n_planes)
        rows.append({
            "method": "rp_lsh", "param": f"n_planes={n_planes}",
            "recall_at_10": recall_of(df),
            "cand_frac": round(cand / all_pairs, 4),
            "wall_sec": wall_of(
                lambda n=n_planes: cosine_topk_lsh(
                    emb, queries, K, dim=dim, n_planes=n
                )
            ),
        })

    for nprobe in [1, 2, 4, 8]:
        cand = (
            emb.withColumn("c", ivf_assign_expr(F.col("embedding"), cents))
            .join(
                F.broadcast(queries.withColumn(
                    "c",
                    F.explode(ivf_probes_expr(
                        F.col("q_embedding"), cents, nprobe
                    )),
                )),
                "c",
            ).count()
        )
        df = cosine_topk_ivf(emb, queries, K, centroids=cents, nprobe=nprobe)
        rows.append({
            "method": "ivf_k16", "param": f"nprobe={nprobe}",
            "recall_at_10": recall_of(df),
            "cand_frac": round(cand / all_pairs, 4),
            "wall_sec": wall_of(
                lambda p=nprobe: cosine_topk_ivf(
                    emb, queries, K, centroids=cents, nprobe=p
                )
            ),
        })

    rows.append({
        "method": "int8_quantized", "param": "-",
        "recall_at_10": recall_of(cosine_topk_quantized(emb, queries, K)),
        "cand_frac": 1.0,
        "wall_sec": wall_of(
            lambda: cosine_topk_quantized(emb, queries, K)
        ),
    })

    out = {
        "sf_dir": SF_DIR, "n_vectors": n_vec, "n_queries": n_q,
        "k": K, "dim": dim, "ivf_codebook": "k=16, lloyd iters=3",
        "rows": rows,
        "note": (
            "cand_frac is the scale cost (fraction of corpus scored per "
            "query); wall_sec is fixture-sized. int8 quantized scans "
            "everything but moves 4x fewer bytes."
        ),
    }
    print(json.dumps(out))
    if args.write:
        with open(os.path.join(REPO, "BENCH", "ann_recall.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("\n| method | param | recall@10 | cand_frac | wall_sec |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['method']} | {r['param']} | {r['recall_at_10']} "
                f"| {r['cand_frac']} | {r['wall_sec']} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
