"""Table loaders and schemas.

The driver materializes a deterministic TPC-H-ish star schema plus
``events``/``documents``/``embeddings`` as one parquet file per table
(TESTDATA.md). All loads go through :func:`load_table` so every query
reads through the same path (and a future move to a partitioned /
bucketed lakehouse layout is a one-function change).

The weather-observation schema of the reference
(producer.py:90-101, README.md:36-45) is declared here too for the
streaming pipeline and its tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Reference weather record (reference producer.py:90-101; types per
# SURVEY.md §1.2). Used by the streaming pipeline + parity tests.
WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("producer_timestamp", T.TimestampType(), True),
        T.StructField("location_name", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("temp_c", T.DoubleType(), True),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("wind_kph", T.DoubleType(), True),
        T.StructField("condition_text", T.StringType(), True),
        T.StructField("is_day", T.BooleanType(), True),
        T.StructField("api_time", T.LongType(), True),
    ]
)

# Required-key subset enforced by the reference consumer (app.py:251-252).
WEATHER_REQUIRED = ("producer_timestamp", "temp_c", "humidity", "location_name")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Column pruning + predicate pushdown reach
    the parquet scan because this stays fully declarative.

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    reader rejects; it is read as raw nanos (legacy conf) and converted
    to a microsecond timestamp with exact integer division — same
    truncation DuckDB applies, so oracle parity holds.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Session-wide conf, also set (documented) in session.get_spark's
        # builder; re-asserted here so load_table works on any session.
        # Scope note: this types EVERY nanos-timestamp parquet column in
        # the session as long — fine here because `events` is the only
        # table that has ever shipped nanos and the repo always wants the
        # raw-long + explicit µs-conversion read path below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) parquet read as raw nanos: truncate to µs
            # with exact integer division — same truncation DuckDB applies.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # TIMESTAMP(MICROS, no tz) parquet: reinterpret in the session
            # tz (UTC) so downstream tz-aware ops behave identically to the
            # nanos path. Values are bit-identical under UTC.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (SQL surface, M3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
