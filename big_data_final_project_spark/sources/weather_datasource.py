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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class WeatherAPIDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> WeatherAPIReader:
        return WeatherAPIReader(self.options)
