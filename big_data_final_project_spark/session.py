"""SparkSession factory.

One session per process (the reference cached its Mongo/Kafka
connections with a 5-minute TTL, app.py:98/:147; here the session is
simply process-lived). All configs below are scale posture, not local
hacks: AQE + skew handling, UTC session time zone (timestamp parity
with the DuckDB oracle), Arrow for every pandas edge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "big-data-final-project-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the process SparkSession.

    ``local[$SPARK_GRAFT_CPUS]`` locally; on a real cluster the same
    builder picks up master/deploy config from the environment, and the
    configs here remain correct (AQE resizes shuffle partitions at run
    time, so ``spark.sql.shuffle.partitions`` is only an upper hint).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.parquet is TIMESTAMP(NANOS), which Spark's reader
        # rejects; read nanos as long session-wide and convert in
        # data.load_table. Declared here (not toggled per-read) so the
        # session's parquet typing is consistent for its whole life.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
