"""Weather HTTP API as a REAL Spark source (Spark 4 Python DataSource
API) — the proper closure of SURVEY §2.1 S1.

Round 1 noted "Spark has no HTTP source" and polled on the driver into
``createDataFrame``. Spark 4's ``pyspark.sql.datasource`` API removes
that limitation: this registers a ``weather_api`` format whose reads
run ON EXECUTORS, partitioned by location chunk — the distributed
shape an API-backed dimension feed actually needs (each executor polls
its own slice of the location list; the driver never touches payload
data).

    spark.dataSource.register(WeatherAPIDataSource)
    df = (spark.read.format("weather_api")
          .option("locations", "Manila,Cebu,Davao")
          .option("locations_per_partition", "2")
          .load())

Transport: with a ``base_url``/``api_key`` option pair the partition
reader builds the urllib fetcher (sources/weather.http_fetch) on the
executor; without them it uses the deterministic stub — the same
injection seam as the batch helpers, serialization-safe because the
choice is re-made from plain string options inside ``read()``.
``fixed_now`` (ISO timestamp) pins producer_timestamp for
deterministic tests; unset, it is the real poll time.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Column order must match sources/weather.flatten_weather_response.
_SCHEMA_DDL = (
    "producer_timestamp timestamp, location_name string, region string, "
    "country string, temp_c double, humidity double, wind_kph double, "
    "condition_text string, is_day boolean, api_time long"
)

DEFAULT_LOCATIONS = "Manila,Cebu,Davao"


class _LocationChunk(InputPartition):
    def __init__(self, locations: list[str]):
        self.locations = locations


class WeatherAPIReader(DataSourceReader):
    def __init__(self, options: dict):
        self.locations = [
            s.strip()
            for s in options.get("locations", DEFAULT_LOCATIONS).split(",")
            if s.strip()
        ]
        self.per_partition = int(options.get("locations_per_partition", "1"))
        self.base_url = options.get("base_url")
        self.api_key = options.get("api_key")
        self.fixed_now = options.get("fixed_now")

    def partitions(self):
        n = max(1, self.per_partition)
        return [
            _LocationChunk(self.locations[i : i + n])
            for i in range(0, len(self.locations), n)
        ]

    def read(self, partition: _LocationChunk):
        # Executed on the executor: build the fetcher from plain-string
        # options (nothing unpicklable crosses the driver boundary).
        from datetime import datetime

        from .weather import flatten_weather_response, http_fetch, stub_fetch

        if self.base_url and self.api_key:
            fetch = http_fetch(self.base_url, self.api_key)
        else:
            fetch = stub_fetch
        now = (
            datetime.fromisoformat(self.fixed_now) if self.fixed_now else None
        )
        for loc in partition.locations:
            rec = flatten_weather_response(fetch(loc), now=now)
            if rec is None:
                continue  # log-and-skip envelope (producer.py:105-113)
            yield (
                rec["producer_timestamp"],
                rec["location_name"],
                rec["region"],
                rec["country"],
                rec["temp_c"],
                rec["humidity"],
                rec["wind_kph"],
                rec["condition_text"],
                rec["is_day"],
                rec["api_time"],
            )


class WeatherAPIStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch is one poll of every location
    (the reference producer's timer loop, producer.py:169-210, as a
    checkpointable source — offsets are the poll counter, so restarts
    resume at the right poll and ``readBetweenOffsets`` replays any
    batch IDENTICALLY, which a hand-rolled sleep loop cannot do).

    Rows are a deterministic function of (location, poll), so replay
    determinism is by construction; a live deployment swaps the stub
    for http_fetch exactly as in the batch reader, accepting that a
    replayed poll re-fetches (at-least-once at the source, made
    exactly-once downstream by the keyed dedup — streaming/pipeline).
    The Simple reader API buffers a batch on the driver — correct for
    a low-rate API poll (3-1000 locations), not a firehose; a
    partition-planned DataSourceStreamReader is the firehose shape."""

    def __init__(self, options: dict):
        self.locations = [
            s.strip()
            for s in options.get("locations", DEFAULT_LOCATIONS).split(",")
            if s.strip()
        ]
        self.fixed_now = options.get("fixed_now")

    def initialOffset(self):
        return {"poll": 0}

    def _rows_for_poll(self, poll: int):
        from datetime import datetime

        from .weather import flatten_weather_response, stub_fetch

        now = (
            datetime.fromisoformat(self.fixed_now) if self.fixed_now else None
        )
        out = []
        for loc in self.locations:
            # deterministic per-(location, poll) variation: the stub
            # response shifted by the poll counter
            resp = stub_fetch(loc)
            resp["current"]["temp_c"] += poll * 0.1
            resp["current"]["last_updated_epoch"] += poll * 60
            rec = flatten_weather_response(resp, now=now)
            out.append(
                (
                    rec["producer_timestamp"],
                    rec["location_name"],
                    rec["region"],
                    rec["country"],
                    rec["temp_c"],
                    rec["humidity"],
                    rec["wind_kph"],
                    rec["condition_text"],
                    rec["is_day"],
                    rec["api_time"],
                )
            )
        return out

    def read(self, start: dict):
        poll = start["poll"]
        return iter(self._rows_for_poll(poll)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for poll in range(start["poll"], end["poll"]):
            rows.extend(self._rows_for_poll(poll))
        return iter(rows)


class WeatherAPIDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> WeatherAPIReader:
        return WeatherAPIReader(self.options)

    def simpleStreamReader(self, schema) -> WeatherAPIStreamReader:
        return WeatherAPIStreamReader(self.options)
