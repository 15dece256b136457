"""Batch source/sink format coverage (SURVEY.md §2.1): the engine's
store is parquet, but an engine users switch to must also ingest the
interchange formats the reference's ecosystem produces (JSON lines on
the wire — producer.py:122 — plus the CSV/ORC lake formats).

Round-trip contract: write(format) → read(format, explicit schema) is
value-identical for the event schema. Explicit schemas everywhere —
schema inference is a scan of its own at 100 TB and produces unstable
types; `TS_FORMAT` carries microseconds through text formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..streaming.pipeline import EVENT_SCHEMA, TS_FORMAT

_TEXT_OPTS = {"timestampFormat": TS_FORMAT}
# XML (built-in since Spark 4) is row-tagged; avro needs the external
# spark-avro jar — test_formats skips it when the jar is absent.
_XML_OPTS = {"rowTag": "event", "timestampFormat": TS_FORMAT}


def write_events(df: DataFrame, path: str, fmt: str) -> None:
    w = df.write.mode("overwrite")
    if fmt in ("csv", "json"):
        w = w.options(**_TEXT_OPTS)
        if fmt == "csv":
            w = w.option("header", "true")
    elif fmt == "xml":
        w = w.options(rootTag="events", **_XML_OPTS)
    w.format(fmt).save(path)


def read_events(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    r = spark.read.schema(EVENT_SCHEMA)
    if fmt in ("csv", "json"):
        r = r.options(**_TEXT_OPTS)
        if fmt == "csv":
            r = r.option("header", "true")
    elif fmt == "xml":
        r = r.options(**_XML_OPTS)
    return r.format(fmt).load(path)


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the session can resolve the format's data source
    (avro/xml ship outside core in some distributions)."""
    # DATA_SOURCE_NOT_FOUND: the current structured class;
    # _LEGACY_ERROR_TEMP_1139: Spark 4's actual class for "Failed to
    # find data source: avro" (still a legacy template); the others
    # cover neighboring versions.
    missing_classes = {
        "DATA_SOURCE_NOT_FOUND",
        "CLASS_NOT_FOUND",
        "CANNOT_FIND_DATA_SOURCE",
        "_LEGACY_ERROR_TEMP_1139",
    }
    try:
        spark.read.format(fmt).schema(EVENT_SCHEMA).load("/nonexistent")
    except Exception as ex:  # noqa: BLE001
        # Classify by the structured error class (stable across Spark
        # versions/locales), falling back to the message only when the
        # exception carries no class (non-AnalysisException wrappers).
        cond = getattr(ex, "getCondition", None) or getattr(ex, "getErrorClass", None)
        if cond is not None:
            try:
                klass = cond()
            except Exception:  # noqa: BLE001
                klass = None
            if klass:
                return klass not in missing_classes
        return "Failed to find data source" not in str(ex)
    return True


def roundtrip(spark: SparkSession, df: DataFrame, base_dir: str, fmt: str) -> DataFrame:
    path = os.path.join(base_dir, fmt)
    write_events(df, path, fmt)
    return read_events(spark, path, fmt)
