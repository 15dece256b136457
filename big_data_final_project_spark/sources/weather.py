"""Weather ingest sources (SURVEY.md §2.1 S1-S4): the reference
producer's pipeline — poll an HTTP weather API, flatten the nested
response, serialize, emit at a fixed rate (producer.py:67-210,
reference repo) — re-expressed for Spark.

Spark has no HTTP source, so S1 is a driver-side generator feeding
``spark.createDataFrame`` (SURVEY §2.1 table). The HTTP call itself
is injected (``fetch_fn``) and STUBBED by default: this container has
no network access, and the engine's tests exercise the flatten /
schema / validation plumbing, which is the part with semantics. The
rate-limited loop (S4) maps to Spark's built-in ``rate`` streaming
source.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import WEATHER_SCHEMA

# Upstream response shape (WeatherAPI current.json, see reference
# producer.py:90-101): nested {location: {...}, current: {...}}.


def flatten_weather_response(
    resp: dict[str, Any] | None, *, now: datetime | None = None
) -> dict[str, Any] | None:
    """Nested API response → flat 10-field record (P1 semantics,
    producer.py:90-101): chained .get() so missing upstream keys
    become None, never KeyError; is_day normalized 0/1 → bool."""
    if resp is None:
        return None
    loc = resp.get("location") or {}
    cur = resp.get("current") or {}
    cond = cur.get("condition") or {}
    is_day = cur.get("is_day")
    return {
        "producer_timestamp": now or datetime.now(timezone.utc),
        "location_name": loc.get("name"),
        "region": loc.get("region"),
        "country": loc.get("country"),
        "temp_c": _as_double(cur.get("temp_c")),
        "humidity": _as_double(cur.get("humidity")),
        "wind_kph": _as_double(cur.get("wind_kph")),
        "condition_text": cond.get("text"),
        "is_day": None if is_day is None else bool(is_day),
        "api_time": cur.get("last_updated_epoch"),
    }


def _as_double(v: Any) -> float | None:
    return None if v is None else float(v)


def stub_fetch(location: str) -> dict[str, Any]:
    """Deterministic stand-in for the HTTPS GET (producer.py:85).
    A real deployment injects `lambda q: requests.get(URL, params={
    "key": ..., "q": q}).json()` here; the container has no network,
    so this synthesizes a stable response per location."""
    h = sum(ord(c) for c in location)
    return {
        "location": {"name": location, "region": f"R{h % 7}", "country": "PH"},
        "current": {
            "temp_c": 20.0 + (h % 150) / 10.0,
            "humidity": 40 + h % 55,
            "wind_kph": (h % 300) / 10.0,
            "condition": {"text": ["Sunny", "Cloudy", "Rain"][h % 3]},
            "is_day": h % 2,
            "last_updated_epoch": 1_700_000_000 + (h % 86_400),
        },
    }


def http_fetch(
    base_url: str,
    api_key: str,
    *,
    timeout_s: float = 10.0,
    retries: int = 2,
    opener: Callable[..., Any] | None = None,
) -> Callable[[str], dict[str, Any] | None]:
    """The LIVE fetch path (producer.py:85-88: requests.get + .json),
    on stdlib urllib so it needs no extra packages. Returns a
    ``fetch_fn`` for :func:`fetch_weather_batch` / :func:`poll_weather_loop`.

    Error envelope mirrors the producer (producer.py:105-113): any
    HTTP/parse failure after `retries` attempts yields None (the
    caller logs-and-skips), never an exception into the poll loop.
    ``opener`` injects the transport for tests (the sandbox has no
    network); by default it is ``urllib.request.urlopen``.
    """
    import json as _json
    import urllib.parse
    import urllib.request

    open_fn = opener or urllib.request.urlopen

    def fetch(location: str) -> dict[str, Any] | None:
        qs = urllib.parse.urlencode({"key": api_key, "q": location})
        url = f"{base_url}?{qs}"
        for _ in range(retries + 1):
            try:
                with open_fn(url, timeout=timeout_s) as resp:
                    return _json.loads(resp.read().decode("utf-8"))
            except Exception:
                continue
        return None

    return fetch


def poll_weather_loop(
    spark: SparkSession,
    locations: Iterable[str],
    *,
    n_polls: int,
    interval_s: float,
    fetch_fn: Callable[[str], dict[str, Any] | None] = stub_fetch,
    sleep_fn: Callable[[float], None] | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
) -> DataFrame:
    """The producer's timer loop (producer.py:169-210: poll every
    interval, emit a batch per tick), bounded to ``n_polls`` so it is
    testable. Each tick fetches every location once and hands the
    typed batch to ``sink`` (e.g. a parquet append or Kafka publish);
    the final batch is returned. ``sleep_fn`` injects the clock —
    tests pass a no-op and assert cadence; the default is
    ``time.sleep``, the real rate limiter.

    At scale this loop is superseded by :func:`weather_rate_stream`
    (backpressure, checkpointing); it exists for fidelity with the
    reference's hand-rolled producer."""
    import time as _time

    sleep = sleep_fn or _time.sleep
    locs = list(locations)
    batch: DataFrame | None = None
    for tick in range(n_polls):
        if tick:
            sleep(interval_s)
        batch = fetch_weather_batch(spark, locs, fetch_fn)
        if sink is not None:
            sink(batch, tick)
    assert batch is not None, "n_polls must be >= 1"
    return batch


def fetch_weather_batch(
    spark: SparkSession,
    locations: Iterable[str],
    fetch_fn: Callable[[str], dict[str, Any] | None] = stub_fetch,
    *,
    now: datetime | None = None,
) -> DataFrame:
    """S1 as a batch: one API poll per location → typed DataFrame
    with the canonical weather schema. Failed fetches (None) are
    dropped, mirroring the producer's error path
    (producer.py:105-113 logs-and-skips)."""
    rows = []
    for loc in locations:
        rec = flatten_weather_response(fetch_fn(loc), now=now)
        if rec is not None:
            rows.append(rec)
    return spark.createDataFrame(rows, WEATHER_SCHEMA)


def weather_rate_stream(
    spark: SparkSession,
    rows_per_second: float = 1.0,
    locations: tuple[str, ...] = ("Manila", "Cebu", "Davao"),
) -> DataFrame:
    """S4, the rate-limited generation loop (producer.py:169-210,
    default 1 rec/s), as Spark's built-in rate source: unbounded,
    backpressure-aware, checkpointable — none of which the hand-rolled
    sleep loop had. Record fields derive deterministically from the
    rate source's (timestamp, value)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    loc = F.element_at(
        F.array(*[F.lit(x) for x in locations]),
        (F.col("value") % len(locations) + 1).cast("int"),
    )
    return rate.select(
        F.col("timestamp").alias("producer_timestamp"),
        loc.alias("location_name"),
        F.concat(F.lit("R"), (F.col("value") % 7).cast("string")).alias("region"),
        F.lit("PH").alias("country"),
        (20.0 + (F.col("value") % 150) / 10.0).alias("temp_c"),
        (40 + F.col("value") % 55).cast("double").alias("humidity"),
        ((F.col("value") % 300) / 10.0).alias("wind_kph"),
        F.element_at(
            F.array(F.lit("Sunny"), F.lit("Cloudy"), F.lit("Rain")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("condition_text"),
        (F.col("value") % 2 == 0).alias("is_day"),
        F.unix_timestamp("timestamp").alias("api_time"),
    )
