"""Table loaders and schemas.

The driver materializes a deterministic TPC-H-ish star schema plus
``events``/``documents``/``embeddings`` as one parquet file per table
(TESTDATA.md). All loads go through :func:`load_table` so every query
reads through the same path (and a future move to a partitioned /
bucketed lakehouse layout is a one-function change).

Ingest compaction (round 3): the driver ships each table as ONE
parquet row group. A single row group is unsplittable, so every
scan-side stage (decimal partial aggregates, per-row text/vector
work) runs on ONE core no matter how many the session has — measured
2-4x on the sf0.1 bench. A real lakehouse never serves analytics off
a raw single-blob drop; it compacts/re-chunks at ingest. load_table
does the same: tables above a row threshold are rewritten ONCE per
source version (content-keyed on path+mtime+size, shared across
processes, atomically published) into a multi-file mirror under /tmp
(a few seconds, amortized across every subsequent query), and all
queries read the mirror. Superseded mirrors and dead-pid write
scratch are swept on first load.
Same rows, same types, same pushdown/pruning — only the split count
changes. Disable with SPARK_GRAFT_MIRROR=0. At 100 TB the threshold
is never hit per-file because real ingest already writes right-sized
row groups — this is local-bench insurance, not a scale crutch.

The weather-observation schema of the reference
(producer.py:90-101, README.md:36-45) is declared here too for the
streaming pipeline and its tests.
"""

from __future__ import annotations

import os
import tempfile

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

# Mirror (re-chunk) a table when the source file gives the scan fewer
# splits than this many rows per split would imply. ~25k rows per
# output file: lineitem@sf0.1 -> 24 files, events@sf0.1 -> 4.
_MIRROR_MIN_ROWS = 90_000
_MIRROR_ROWS_PER_FILE = 25_000
_MIRROR_MAX_FILES = 32

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


def _raw_load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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


def sf_dir_tag(sf_dir: str) -> str:
    """Collision-safe tag for per-sf_dir scratch paths: basename for
    readability + a short hash of the FULL path, so two directories
    that share a basename (e.g. an override dir also called sf0.1)
    can never alias each other's cache."""
    import hashlib

    full = os.path.abspath(sf_dir.rstrip("/"))
    h = hashlib.md5(full.encode()).hexdigest()[:8]
    return f"{os.path.basename(full)}_{h}"


def source_key(sf_dir: str, name: str) -> str:
    """Short content key for one source table: full path + mtime + size.
    Regenerated testdata (same path, new bytes) gets a new key, so a
    shared cache can never serve a stale mirror."""
    import hashlib

    path = os.path.join(os.path.abspath(sf_dir.rstrip("/")), f"{name}.parquet")
    st = os.stat(path)
    raw = f"{path}|{st.st_mtime_ns}|{st.st_size}"
    return hashlib.md5(raw.encode()).hexdigest()[:10]


def _mirror_root(sf_dir: str, name: str) -> str:
    # Content-keyed (NOT pid-keyed): every process that sees the same
    # source bytes shares one mirror, built once, atomically published.
    # The content key is PER TABLE, so the key lives on the leaf dir
    # (one shared parent per sf_dir) — cleanup of one table's stale
    # versions can never touch a sibling table's live mirror.
    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_mirror_{sf_dir_tag(sf_dir)}",
        f"{name}_{source_key(sf_dir, name)}",
    )


def _clean_stale_mirrors(sf_dir: str, name: str) -> None:
    """Drop THIS table's mirrors built from superseded source bytes."""
    import glob
    import shutil

    keep = _mirror_root(sf_dir, name)
    pattern = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_mirror_{sf_dir_tag(sf_dir)}",
        f"{name}_*",
    )
    for d in glob.glob(pattern):
        if d != keep:
            shutil.rmtree(d, ignore_errors=True)


def clean_dead_pid_scratch() -> None:
    """Remove spark_graft_* scratch dirs whose trailing _<pid> points at
    a process that no longer exists (write-side scratch — bucketed /
    stream / store / evo — stays pid-keyed for writer isolation, so
    dead runs would otherwise accumulate under /tmp unboundedly)."""
    import glob
    import shutil

    pid_keyed = ("bucketed", "stream", "store", "evo")
    dirs = [
        d
        for kind in pid_keyed
        for d in glob.glob(
            os.path.join(tempfile.gettempdir(), f"spark_graft_{kind}_*_*")
        )
    ]
    for d in dirs:
        tail = d.rsplit("_", 1)[-1]
        if not tail.isdigit():
            continue
        pid = int(tail)
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid: leave it


_SCRATCH_CLEANED = False


def _source_layout(sf_dir: str, name: str) -> tuple[int, int]:
    """(num_rows, num_row_groups) from the parquet footer — no Spark job."""
    import pyarrow.parquet as pq

    meta = pq.read_metadata(os.path.join(sf_dir, f"{name}.parquet"))
    return meta.num_rows, meta.num_row_groups


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Column pruning + predicate pushdown reach
    the parquet scan because this stays fully declarative (the mirror,
    when active, is itself plain parquet — scans behave identically).

    ``events.ts`` has shipped as TIMESTAMP(NANOS) (rounds 1-2) and
    TIMESTAMP(MICROS, ntz) (round 3+); ``_raw_load`` branches on the
    physical type so both read identically.
    """
    global _SCRATCH_CLEANED
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if not _SCRATCH_CLEANED:
        _SCRATCH_CLEANED = True
        clean_dead_pid_scratch()
    if os.environ.get("SPARK_GRAFT_MIRROR", "1") == "0":
        return _raw_load(spark, sf_dir, name)
    rows, groups = _source_layout(sf_dir, name)
    want_files = min(_MIRROR_MAX_FILES, max(1, rows // _MIRROR_ROWS_PER_FILE))
    if rows < _MIRROR_MIN_ROWS or groups >= want_files:
        return _raw_load(spark, sf_dir, name)
    mirror = _mirror_root(sf_dir, name)
    if not os.path.exists(mirror):
        _clean_stale_mirrors(sf_dir, name)
        # Build under a pid-private staging path, then publish with one
        # atomic rename: concurrent processes race harmlessly (loser
        # discards its staging copy), and readers only ever see a
        # complete mirror — no marker file needed.
        staging = f"{mirror}.build{os.getpid()}"
        (
            _raw_load(spark, sf_dir, name)
            .repartition(want_files)
            .write.mode("overwrite")
            .parquet(staging)
        )
        os.makedirs(os.path.dirname(mirror), exist_ok=True)
        try:
            os.rename(staging, mirror)
        except OSError:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(mirror)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (SQL surface, M3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
