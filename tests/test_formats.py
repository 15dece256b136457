"""Format round-trip parity (SURVEY.md §2.1): events survive
write→read through every supported batch format value-identically."""

from __future__ import annotations

from collections import Counter

import pytest

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.sources.formats import (
    format_available,
    roundtrip,
)

FORMATS = ("parquet", "json", "csv", "orc", "xml", "avro")


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_roundtrip(spark, sf_dir, fmt, tmp_path_factory):
    if fmt in ("xml", "avro") and not format_available(spark, fmt):
        pytest.skip(f"{fmt} data source not on the classpath")
    base = str(tmp_path_factory.mktemp(f"fmt_{fmt}"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    back = roundtrip(spark, ev, base, fmt)
    key = lambda r: (
        r["event_id"],
        r["ts"],
        r["user_id"],
        r["event_type"],
        r["value"],
        r["props"],
    )
    assert Counter(map(key, back.collect())) == Counter(map(key, ev.collect()))
