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


def test_http_fetch_url_building_and_retry():
    """The live HTTP path (injected transport — no network in the
    sandbox): URL carries key+location, a flaky opener is retried,
    and persistent failure yields None (log-and-skip envelope), never
    an exception."""
    import io
    from contextlib import contextmanager

    from big_data_final_project_spark.sources.weather import http_fetch

    seen = []

    @contextmanager
    def ok_opener(url, timeout):
        seen.append((url, timeout))
        yield io.BytesIO(b'{"location": {"name": "Manila"}}')

    fetch = http_fetch("https://api.example.com/v1/current.json", "K123",
                       opener=ok_opener)
    resp = fetch("Manila")
    assert resp == {"location": {"name": "Manila"}}
    url, timeout = seen[0]
    assert url.startswith("https://api.example.com/v1/current.json?")
    assert "key=K123" in url and "q=Manila" in url
    assert timeout == 10.0

    calls = {"n": 0}

    @contextmanager
    def flaky_opener(url, timeout):
        calls["n"] += 1
        if calls["n"] < 2:
            raise OSError("connection reset")
        yield io.BytesIO(b'{"current": {"temp_c": 30}}')

    fetch = http_fetch("https://api.example.com", "K", opener=flaky_opener)
    assert fetch("Cebu") == {"current": {"temp_c": 30}}
    assert calls["n"] == 2

    @contextmanager
    def dead_opener(url, timeout):
        raise OSError("no route to host")
        yield

    fetch = http_fetch("https://api.example.com", "K", retries=1,
                       opener=dead_opener)
    assert fetch("Davao") is None


def test_poll_loop_cadence_and_sink(spark):
    """The bounded producer loop: one batch per tick, sleep between
    ticks only (not before the first), every batch reaches the sink."""
    from big_data_final_project_spark.sources.weather import poll_weather_loop

    sleeps, batches = [], []
    final = poll_weather_loop(
        spark,
        ["Manila", "Cebu"],
        n_polls=3,
        interval_s=0.5,
        sleep_fn=sleeps.append,
        sink=lambda df, tick: batches.append((tick, df.count())),
    )
    assert sleeps == [0.5, 0.5]
    assert batches == [(0, 2), (1, 2), (2, 2)]
    assert final.count() == 2


def test_weather_api_datasource(spark):
    """The weather_api custom Spark source (Spark 4 Python DataSource
    API): executor-side reads partitioned by location chunk, rows
    identical to the driver-side batch helper with the same stub
    fetch and pinned timestamp."""
    from big_data_final_project_spark.sources.weather import (
        fetch_weather_batch,
        stub_fetch,
    )
    from big_data_final_project_spark.sources.weather_datasource import (
        WeatherAPIDataSource,
    )
    from datetime import datetime, timezone

    spark.dataSource.register(WeatherAPIDataSource)
    now = "2026-01-01T00:00:00+00:00"
    df = (
        spark.read.format("weather_api")
        .option("locations", "Manila,Cebu,Davao,Baguio,Iloilo")
        .option("locations_per_partition", "2")
        .option("fixed_now", now)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(5/2) location chunks
    got = {r["location_name"]: r for r in df.collect()}
    ref = {
        r["location_name"]: r
        for r in fetch_weather_batch(
            spark,
            ["Manila", "Cebu", "Davao", "Baguio", "Iloilo"],
            stub_fetch,
            now=datetime.fromisoformat(now).astimezone(timezone.utc),
        ).collect()
    }
    assert got.keys() == ref.keys()
    for loc in got:
        for f in ("region", "country", "temp_c", "humidity", "wind_kph",
                  "condition_text", "is_day", "api_time"):
            assert got[loc][f] == ref[loc][f], (loc, f)


def test_weather_api_stream_source(spark, tmp_path_factory):
    """The weather_api STREAMING source: poll-counter offsets survive
    a checkpointed restart (batch 2 resumes where batch 1 stopped),
    and each poll's rows are the deterministic (location, poll)
    function — the reference's producer loop as a replayable source."""
    from big_data_final_project_spark.sources.weather_datasource import (
        WeatherAPIDataSource,
    )

    spark.dataSource.register(WeatherAPIDataSource)
    ckpt = str(tmp_path_factory.mktemp("weather_stream_ckpt"))

    def drain(name):
        rows = []
        df = (
            spark.readStream.format("weather_api")
            .option("locations", "Manila,Cebu")
            .option("fixed_now", "2026-01-01T00:00:00+00:00")
            .load()
        )
        (
            df.writeStream.foreachBatch(
                lambda batch, bid: rows.extend(batch.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return rows

    first = drain("weather_poll_1")
    assert len(first) >= 2  # at least one poll of both locations
    temps_first = {
        (r["location_name"], r["api_time"]): r["temp_c"] for r in first
    }

    second = drain("weather_poll_2")
    # restart resumed from the checkpointed offset: new polls only,
    # no replay of poll 0
    temps_second = {
        (r["location_name"], r["api_time"]): r["temp_c"] for r in second
    }
    assert set(temps_second).isdisjoint(set(temps_first))
    # deterministic (location, poll) content: Manila's poll-0 temp is
    # the stub value exactly
    from big_data_final_project_spark.sources.weather import stub_fetch

    base = stub_fetch("Manila")["current"]["temp_c"]
    manila_first = [r for r in first if r["location_name"] == "Manila"]
    assert any(abs(r["temp_c"] - base) < 1e-9 for r in manila_first)


def test_jsonl_sink_two_phase_commit(tmp_path):
    """The jsonl_audit writer's commit protocol, exercised directly:
    write() publishes nothing visible (temp only); abort() removes the
    temp; commit() renames and stamps _SUCCESS with the row count —
    so a failed job can never leave partial output behind."""
    import glob
    import os

    from pyspark.sql import Row

    from big_data_final_project_spark.sources.jsonl_sink import JsonlAuditWriter

    d = str(tmp_path / "sink")
    w = JsonlAuditWriter({"path": d})

    # task attempt that will be aborted
    msg = w.write(iter([Row(a=1), Row(a=2)]))
    assert msg.tmp_path.endswith(".tmp") and msg.n_rows == 2
    assert not glob.glob(os.path.join(d, "part-*.jsonl"))  # nothing visible
    w.abort([msg])
    assert not os.path.exists(msg.tmp_path)

    # successful attempt
    m1 = w.write(iter([Row(a=1)]))
    m2 = w.write(iter([Row(a=2), Row(a=3)]))
    w.commit([m1, m2])
    finals = glob.glob(os.path.join(d, "part-*.jsonl"))
    assert len(finals) == 2
    assert not glob.glob(os.path.join(d, "*.tmp"))
    with open(os.path.join(d, "_SUCCESS")) as fh:
        assert fh.read() == "3"


def test_jsonl_sink_overwrite_replaces_old_output(spark, tmp_path):
    """mode("overwrite") through the real Spark write path: the second
    job's rows fully replace the first job's, with no appended
    duplicates and no leftover temps or retirees."""
    import glob
    import os

    from big_data_final_project_spark.sources.jsonl_sink import register

    register(spark)
    d = str(tmp_path / "sink")
    for lo, hi in ((0, 5), (100, 104)):
        (
            spark.range(lo, hi)
            .selectExpr("id AS a")
            .write.format("jsonl_audit")
            .option("path", d)
            .mode("overwrite")
            .save()
        )
    rows = sorted(
        r.a for r in spark.read.schema("a long")
        .option("pathGlobFilter", "part-*.jsonl")
        .json(d)
        .collect()
    )
    assert rows == [100, 101, 102, 103]
    assert not glob.glob(os.path.join(d, "*.tmp"))
    assert not glob.glob(os.path.join(d, "*.old"))
    with open(os.path.join(d, "_SUCCESS")) as fh:
        assert fh.read() == "4"


def test_jsonl_sink_crash_mid_commit_then_rerun_exactly_once(
    tmp_path, monkeypatch
):
    """VERDICT r5 #6 / r6 #2: a commit that dies AFTER retiring the
    old output and publishing some (not all) new parts must (a) leave
    every old byte recoverable on disk, and (b) converge on rerun —
    the read-back after the rerun matches the exactly-once oracle,
    with the crashed job's orphan temp swept and no duplicates."""
    import glob
    import os

    from pyspark.sql import Row

    from big_data_final_project_spark.sources.jsonl_sink import JsonlAuditWriter

    d = str(tmp_path / "sink")

    def read_back():
        rows = []
        for path in glob.glob(os.path.join(d, "part-*.jsonl")):
            with open(path) as fh:
                rows.extend(
                    __import__("json").loads(line)["a"] for line in fh
                )
        return sorted(rows)

    # job 1: publish rows {1, 2}
    w1 = JsonlAuditWriter({"path": d}, overwrite=True)
    w1.commit([w1.write(iter([Row(a=1)])), w1.write(iter([Row(a=2)]))])
    assert read_back() == [1, 2]

    # job 2: rows {10..13}, crash on the SECOND publish rename (after
    # both old parts were retired and one new part went visible)
    w2 = JsonlAuditWriter({"path": d}, overwrite=True)
    msgs = [
        w2.write(iter([Row(a=10), Row(a=11)])),
        w2.write(iter([Row(a=12), Row(a=13)])),
    ]
    real_rename = os.rename
    seen = {"publish_renames": 0}

    def flaky_rename(src, dst):
        if src.endswith(".tmp"):  # publish rename (retire renames keep .jsonl->.old)
            seen["publish_renames"] += 1
            if seen["publish_renames"] == 2:
                raise OSError("injected crash mid-commit")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        w2.commit(msgs)
    monkeypatch.setattr(os, "rename", real_rename)

    # old output survived the crash (retired, not destroyed) and the
    # crashed job left one visible part + one orphan temp
    olds = glob.glob(os.path.join(d, "part-*.jsonl.old"))
    assert len(olds) == 2
    assert len(glob.glob(os.path.join(d, "part-*.jsonl"))) == 1
    assert len(glob.glob(os.path.join(d, "*.tmp"))) == 1
    # ADVICE r7: job 1's _SUCCESS must be GONE after the crashed
    # commit — a _SUCCESS-respecting reader sees the directory as
    # uncommitted, never a stale stamp over a partial new part set
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))

    # rerun the job fresh (Spark would retry the whole write): the
    # rerun retires the crashed job's partial part, sweeps its orphan
    # temp, republishes, and the read-back is exactly-once
    w3 = JsonlAuditWriter({"path": d}, overwrite=True)
    w3.commit(
        [
            w3.write(iter([Row(a=10), Row(a=11)])),
            w3.write(iter([Row(a=12), Row(a=13)])),
        ]
    )
    assert read_back() == [10, 11, 12, 13]
    assert not glob.glob(os.path.join(d, "*.tmp"))
    assert not glob.glob(os.path.join(d, "*.old"))
    with open(os.path.join(d, "_SUCCESS")) as fh:
        assert fh.read() == "4"


def test_jsonl_sink_stamp_retired_before_any_publish(tmp_path, monkeypatch):
    """ADVICE r7 (the commit-window half): the previous job's
    _SUCCESS is removed BEFORE the first retire/publish rename, so at
    no instant does a stale stamp coexist with a changed part set —
    crash on the very first rename and the stamp is already gone
    while both old parts are still intact and visible."""
    import glob
    import os

    from pyspark.sql import Row

    from big_data_final_project_spark.sources.jsonl_sink import JsonlAuditWriter

    d = str(tmp_path / "sink")
    w1 = JsonlAuditWriter({"path": d}, overwrite=True)
    w1.commit([w1.write(iter([Row(a=1)])), w1.write(iter([Row(a=2)]))])
    assert os.path.exists(os.path.join(d, "_SUCCESS"))

    w2 = JsonlAuditWriter({"path": d}, overwrite=True)
    msgs = [w2.write(iter([Row(a=10)]))]
    real_rename = os.rename

    def crash_first_rename(src, dst):
        raise OSError("injected crash before any rename")

    monkeypatch.setattr(os, "rename", crash_first_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        w2.commit(msgs)
    monkeypatch.setattr(os, "rename", real_rename)

    # stamp gone, old parts untouched: reader sees "uncommitted", not
    # a stale success over mutating output
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))
    assert len(glob.glob(os.path.join(d, "part-*.jsonl"))) == 2


def test_jsonl_sink_zero_partition_overwrite(tmp_path):
    """A write whose job ran zero tasks (empty 0-partition frame)
    still publishes: commit() creates the directory and stamps
    _SUCCESS=0 instead of raising FileNotFoundError (ADVICE r6)."""
    import os

    from big_data_final_project_spark.sources.jsonl_sink import JsonlAuditWriter

    d = str(tmp_path / "never_created")
    w = JsonlAuditWriter({"path": d}, overwrite=True)
    w.commit([])
    with open(os.path.join(d, "_SUCCESS")) as fh:
        assert fh.read() == "0"
