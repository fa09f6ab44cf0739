"""Snapshot manifests: Iceberg-semantics emulation on plain Parquet
(SURVEY.md section 7.6).

No Iceberg runtime jars ship in the offline pyspark install, so the
required semantics — atomic snapshot promote, resumable writes that
skip completed partitions, per-partition lineage/metrics — are
emulated with JSON manifests + os.replace (atomic on POSIX). The API
shape mirrors what a writeTo(...).createOrReplace() catalog swap-in
would need on a networked cluster.

Layout:
    <table>/data/snap-<id>/...            parquet data files
    <table>/manifests/<id>.json           file list, row counts, schema
    <table>/SNAPSHOT                      current snapshot pointer
    <table>/partitions/<key>.json         per-partition completion +
                                          lineage metrics (resume unit)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "partitions"), exist_ok=True)

    # -- whole-table snapshots -------------------------------------------

    def write(self, df: DataFrame, mode: str = "overwrite") -> str:
        """Write df as a new snapshot and atomically promote it."""
        snap_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        data_dir = os.path.join(self.path, "data", f"snap-{snap_id}")
        df.write.mode("errorifexists").parquet(data_dir)
        spark = df.sparkSession
        written = spark.read.parquet(data_dir)
        manifest = {
            "snapshot_id": snap_id,
            "data_dir": data_dir,
            "row_count": written.count(),
            "schema": written.schema.jsonValue(),
            "files": sorted(
                f for f in os.listdir(data_dir) if f.endswith(".parquet")
            ),
            "created_unix": time.time(),
        }
        _atomic_write_json(
            os.path.join(self.path, "manifests", f"{snap_id}.json"), manifest
        )
        _atomic_write_json(os.path.join(self.path, "SNAPSHOT"), {"current": snap_id})
        return snap_id

    def current_snapshot(self) -> str | None:
        p = os.path.join(self.path, "SNAPSHOT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["current"]

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snap = snapshot_id or self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        with open(os.path.join(self.path, "manifests", f"{snap}.json")) as f:
            manifest = json.load(f)
        return spark.read.parquet(manifest["data_dir"])

    def manifest(self, snapshot_id: str | None = None) -> dict:
        snap = snapshot_id or self.current_snapshot()
        with open(os.path.join(self.path, "manifests", f"{snap}.json")) as f:
            return json.load(f)

    # -- resumable partitioned writes ------------------------------------

    def completed_partitions(self) -> dict[str, dict]:
        d = os.path.join(self.path, "partitions")
        out = {}
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out[name[:-5]] = json.load(f)
        return out

    def write_partitioned(
        self,
        df: DataFrame,
        partition_col: str,
        partition_values: list | None = None,
    ) -> dict:
        """Idempotent per-partition write: each partition value lands in
        its own directory with a completion manifest carrying lineage
        metrics (row count, wall time). A rerun after a crash skips
        completed partitions — the resume contract.

        Returns {"written": [...], "skipped": [...]}.
        """
        # Materialize the upstream plan ONCE before anything slices
        # it: the value-discovery distinct and the per-partition
        # slice-writes below would otherwise each recompute the full
        # pipeline (1 + #partitions passes over the source — measured
        # 9x wall on the 16M-page rollup job). The checkpointed set is
        # the job's OUTPUT, the small side by construction. When the
        # caller passes partition_values and every one is already
        # complete (pure-resume rerun), nothing is computed at all.
        done = self.completed_partitions()
        if partition_values is None:
            df = df.localCheckpoint(eager=True)
            partition_values = [
                r[0] for r in df.select(partition_col).distinct().collect()
            ]
        elif any(str(v) not in done for v in partition_values):
            df = df.localCheckpoint(eager=True)
        written, skipped = [], []
        for val in sorted(map(str, partition_values)):
            if val in done:
                skipped.append(val)
                continue
            t0 = time.time()
            part_dir = os.path.join(self.path, "data", f"{partition_col}={val}")
            part_df = df.where(F.col(partition_col).cast("string") == val)
            part_df.write.mode("overwrite").parquet(part_dir)
            n = part_df.sparkSession.read.parquet(part_dir).count()
            _atomic_write_json(
                os.path.join(self.path, "partitions", f"{val}.json"),
                {
                    "partition": val,
                    "rows": n,
                    "seconds": time.time() - t0,
                    "dir": part_dir,
                    "completed_unix": time.time(),
                },
            )
            written.append(val)
        return {"written": written, "skipped": skipped}

    def read_partitioned(self, spark: SparkSession) -> DataFrame:
        dirs = [m["dir"] for m in self.completed_partitions().values()]
        return spark.read.option("basePath", os.path.join(self.path, "data")).parquet(*dirs)


def lineage_metrics(df: DataFrame) -> DataFrame:
    """Per-Spark-partition lineage counters (rows per partition id) —
    the metrics-table feed. Uses spark_partition_id, no Python."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("_pid")
    )


def observed(df: DataFrame, name: str, *metrics):
    """df.observe wrapper: attach named aggregate metrics that are
    reported with the job (driver-side lineage without extra passes)."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
