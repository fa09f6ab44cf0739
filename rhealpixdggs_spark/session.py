"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set cluster-side: AQE on (runtime
skew-join splitting and partition coalescing), shuffle partitions sized
to cores rather than the 200 default, Arrow batches large enough to
amortize the JVM->Python hop for the tiny encode kernel
(SURVEY.md section 4.2: ArrowEvalPythonExec is the engine's only
process boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tune_sql_conf(spark: SparkSession, shuffle_partitions: int | None = None) -> None:
    """Apply the engine's runtime-settable SQL tuning to an EXISTING
    session — for spark-submit jobs, where the session master/memory
    come from the submit command and must not be overridden. Sets
    shuffle partitions to the cluster's default parallelism (cores in
    local mode, total executor cores on a cluster), AQE with skew-join
    splitting, and the measured-optimal 64k Arrow batch (BENCH/
    BASELINE.md config sweep)."""
    if shuffle_partitions is None:
        shuffle_partitions = spark.sparkContext.defaultParallelism
    for k, v in {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    }.items():
        spark.conf.set(k, v)


def get_spark(
    app_name: str = "rhealpixdggs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[len("local[") : -1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = (os.cpu_count() or 8) if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
