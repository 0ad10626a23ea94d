"""Window-semantics goldens ported from the reference's most precise
test (flow/sliding_window_test.go:116-177), re-based on pure event-time
semantics, plus the late-data drop contract via watermark."""

import os
import time

import pytest
from pyspark.sql import functions as F

from go_streams_spark.api import Source
from go_streams_spark.operators import sliding_window, tumbling_window
from go_streams_spark.streaming import file_stream_source, memory_sink


def test_sliding_window_event_time_assignment(spark):
    """Reference golden events (a..i at ms offsets 2,17,26,35,77,93,118,
    135,118) through a 50ms/20ms sliding window.

    Expected contents under PURE event-time assignment. Delta vs the
    reference's [[a b c d] [c d] [e] [e f] [f g] [g i] [h]]: the
    reference emits window [100,150) by wall-clock BEFORE h arrives
    (arrival-timing artifact of its goroutine scheduler,
    flow/sliding_window.go:213-246); event-time semantics put h=135ms in
    [100,150) as well. Windows before the first element (start < 0) are
    excluded to match the reference's first-element alignment
    (flow/sliding_window.go:309-326).
    """
    events = [("a", 2), ("b", 17), ("c", 26), ("d", 35), ("e", 77),
              ("f", 93), ("g", 118), ("h", 135), ("i", 118)]
    df = spark.createDataFrame(events, "v string, ms long") \
        .select("v", F.timestamp_millis(F.col("ms")).alias("ts"))
    out = Source(df).via(sliding_window(
        "ts", "50 milliseconds", "20 milliseconds",
        F.sort_array(F.collect_list(F.struct("ts", "v"))).alias("items"),
    )).to_df()
    got = {r["window_start"].microsecond // 1000
           + r["window_start"].second * 1000:
           [x["v"] for x in r["items"]]
           for r in out.collect()
           if r["window_start"].year >= 1970}  # drop pre-epoch starts
    assert got == {
        0: ["a", "b", "c", "d"],
        20: ["c", "d"],
        40: ["e"],
        60: ["e", "f"],
        80: ["f", "g", "i"],   # i included: event-time, not arrival-time
        100: ["g", "i", "h"],  # h included: event-time, not arrival-time
        120: ["h"],
    }


def test_streaming_watermark_late_event_delta(spark, tmp_path):
    """Late-data delta vs the reference, pinned by observation.

    The reference HARD-DROPS events below the window lower boundary
    (flow/sliding_window.go:162-165). Spark's watermark contract is
    one-directional: data within the threshold is never dropped, but
    data beyond it only *may* be — and on Spark 4.1 a late event whose
    window state no longer exists creates fresh state and still emits
    (observed in both update and append modes). Deterministic
    micro-batch sequencing via our replay data source (rowsPerBatch=1).
    Reference-strict dropping, when required, is a pre-filter against a
    tracked high-water mark (e.g. in foreachBatch) — documented in
    COVERAGE.md, not silently assumed from the watermark.
    """
    import json
    from go_streams_spark.sources import register_replay_source

    path = str(tmp_path / "rows.jsonl")
    rows = [
        {"ts": "2024-01-01 00:10:00", "tag": "on_time"},   # batch 1: watermark -> 00:09:30
        {"ts": "2024-01-01 00:00:01", "tag": "late_drop"}, # batch 2: below watermark
        {"ts": "2024-01-01 00:10:30", "tag": "keep"},      # batch 3: current
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    fmt = register_replay_source(spark)
    src = (spark.readStream.format(fmt)
           .option("path", path).option("ddl", "ts string, tag string")
           .option("rowsPerBatch", "1").load()
           .select(F.col("ts").cast("timestamp").alias("ts"), "tag"))
    windowed = Source(src).via(tumbling_window(
        "ts", "1 minute",
        F.collect_list("tag").alias("tags"),
        watermark="30 seconds")).to_df()
    name = "late_" + os.urandom(4).hex()
    q = (windowed.writeStream.format("memory").queryName(name)
         .outputMode("update").start())
    deadline = time.time() + 90
    while time.time() < deadline:
        tags = {t for r in spark.table(name).collect() for t in r["tags"]}
        if "keep" in tags:
            break
        time.sleep(1)
    q.stop()
    tags = {t for r in spark.table(name).collect() for t in r["tags"]}
    # Spark does NOT drop the below-watermark event (one-directional
    # guarantee) — all three appear; the reference would drop late_drop.
    assert tags == {"on_time", "late_drop", "keep"}
