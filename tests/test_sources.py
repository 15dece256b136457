"""Source-parity tests (SURVEY.md §2.1 S1/S4 and §5.3 unit tests):
nested-response flattening incl. missing-key nulls, batch fetch
schema, and the rate-source weather stream."""

from __future__ import annotations

from datetime import datetime, timezone

from big_data_final_project_spark.data import WEATHER_REQUIRED, WEATHER_SCHEMA
from big_data_final_project_spark.sources.weather import (
    fetch_weather_batch,
    flatten_weather_response,
    stub_fetch,
    weather_rate_stream,
)

NOW = datetime(2026, 1, 1, tzinfo=timezone.utc)


def test_flatten_full_response():
    rec = flatten_weather_response(stub_fetch("Manila"), now=NOW)
    assert rec["location_name"] == "Manila"
    assert isinstance(rec["temp_c"], float)
    assert isinstance(rec["is_day"], bool)
    assert rec["producer_timestamp"] == NOW


def test_flatten_missing_keys_yield_none_not_error():
    """Reference semantics (producer.py:92-100): .get() chains mean a
    sparse upstream response degrades to nulls, never raises."""
    rec = flatten_weather_response({"location": {"name": "X"}}, now=NOW)
    assert rec["location_name"] == "X"
    assert rec["temp_c"] is None
    assert rec["is_day"] is None
    assert rec["condition_text"] is None
    assert flatten_weather_response(None) is None


def test_fetch_batch_schema_and_failures(spark):
    def flaky(loc):
        return None if loc == "BAD" else stub_fetch(loc)

    df = fetch_weather_batch(spark, ["Manila", "BAD", "Cebu"], flaky, now=NOW)
    assert df.schema == WEATHER_SCHEMA
    rows = df.collect()
    assert len(rows) == 2  # failed fetch dropped, reference error path
    for c in WEATHER_REQUIRED:
        assert all(r[c] is not None for r in rows)


def test_rate_stream_schema_matches_canonical(spark):
    stream = weather_rate_stream(spark, rows_per_second=10)
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in WEATHER_SCHEMA.fields
    ]
