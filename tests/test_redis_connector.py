"""Redis Streams / Pub-Sub connector tests.

The connector code under test is the real Data Source implementation
(go_streams_spark/sources/redis_stream.py); only the network client is
swapped for the file-backed FakeRedis via the clientFactory option, so
the offset planning, executor-side range reads, consumer-group
bookkeeping, and XADD sink paths all execute for real.
"""

import os
import time
import uuid

import pytest

from go_streams_spark.sources.redis_stream import (
    RedisPubSubStreamReader,
    RedisStreamStreamReader,
    register_redis_sources,
)
from go_streams_spark.testing.fake_redis import BusyGroupError, FakeRedis

FACTORY = "go_streams_spark.testing.fake_redis:fake_redis_factory"


@pytest.fixture
def fake_path(tmp_path):
    return str(tmp_path / "redis.json")


def _opts(fake_path, **kw):
    opts = {"clientfactory": FACTORY, "fakepath": fake_path}
    opts.update(kw)
    return opts


def test_fake_redis_semantics(fake_path):
    r = FakeRedis(fake_path)
    i1 = r.xadd("s", {"k": "a"})
    i2 = r.xadd("s", {"k": "b"})
    assert r.xlen("s") == 2
    # exclusive lower bound: "(id" skips that entry (redis 6.2 semantics)
    assert [e[0] for e in r.xrange("s", f"({i1}", "+")] == [i2]
    assert r.xrange("s", "-", "+", count=1)[0][1] == {"k": "a"}
    r.xgroup_create("s", "g", id="0", mkstream=True)
    with pytest.raises(BusyGroupError):
        r.xgroup_create("s", "g", id="0")
    r.xgroup_setid("s", "g", i2)
    assert r._read()["streams"]["s"]["groups"]["g"]["last_delivered"] == i2


def test_stream_reader_offsets_and_replay(fake_path):
    """Offset planning + range replay without Spark in the loop: the
    contract Spark's checkpoint recovery depends on (same start/end →
    same rows)."""
    r = FakeRedis(fake_path)
    ids = [r.xadd("s", {"n": str(i)}) for i in range(7)]
    reader = RedisStreamStreamReader(
        _opts(fake_path, stream="s", maxentriespertrigger="3", group="g"))

    start = reader.initialOffset()
    assert start == {"s": "0-0"}
    end1 = reader.latestOffset()
    assert end1 == {"s": ids[2]}  # capped at 3 entries per trigger
    [p1] = reader.partitions(start, end1)
    batch1 = list(reader.read(p1))
    assert [b[0] for b in batch1] == ids[:3]
    assert batch1[0][2] == {"n": "0"}

    end2 = reader.latestOffset()
    assert end2 == {"s": ids[5]}
    # replaying the FIRST range again yields identical rows (exactly-once
    # replay — the property XREADGROUP cannot provide)
    [p1b] = reader.partitions(start, end1)
    assert list(reader.read(p1b)) == batch1

    reader.commit(end2)
    # ack analogue: group cursor advanced to the committed id
    assert r._read()["streams"]["s"]["groups"]["g"]["last_delivered"] == ids[5]

    end3 = reader.latestOffset()
    assert end3 == {"s": ids[6]}  # drains the remainder
    [p3] = reader.partitions(end2, end3)
    assert [b[0] for b in reader.read(p3)] == [ids[6]]


def test_stream_reader_new_only_start(fake_path):
    """startId='$' (XGroupCreateArgs.StartID, redis_stream.go:33-35):
    only entries arriving after the source starts are read."""
    r = FakeRedis(fake_path)
    r.xadd("s", {"n": "old"})
    reader = RedisStreamStreamReader(_opts(fake_path, stream="s", startid="$"))
    start = reader.initialOffset()
    assert reader.latestOffset() == start  # nothing new yet
    new_id = r.xadd("s", {"n": "new"})
    end = reader.latestOffset()
    [p] = reader.partitions(start, end)
    assert [(b[0], b[2]["n"]) for b in reader.read(p)] == [(new_id, "new")]


def test_redis_stream_spark_end_to_end(spark, fake_path):
    """Full Spark path: streaming read with per-trigger cap -> memory
    sink; then append more entries and watch them arrive; then batch
    write back via the XADD sink and batch-read the round-trip."""
    r = FakeRedis(fake_path)
    for i in range(8):
        r.xadd("events", {"n": str(i)})
    fmt, _ = register_redis_sources(spark)
    name = "redis_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", FACTORY).option("fakePath", fake_path)
         .option("stream", "events").option("group", "sparkgrp")
         .option("maxEntriesPerTrigger", "5")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 8:
        time.sleep(0.5)
    assert spark.table(name).count() == 8
    # live append lands in a later micro-batch
    r.xadd("events", {"n": "8"})
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 9:
        time.sleep(0.5)
    q.stop()
    got = spark.table(name)
    assert sorted(x["values"]["n"] for x in got.collect()) == sorted(
        str(i) for i in range(9))
    assert set(got.toDF("id", "stream", "values").select("stream")
               .distinct().toPandas()["stream"]) == {"events"}
    # consumer group observed the committed progress
    g = r._read()["streams"]["events"]["groups"]["sparkgrp"]
    assert g["last_delivered"] != "0-0"

    # sink: batch write rows -> XADD -> batch read round-trip
    out = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    (out.write.format(fmt)
        .option("clientFactory", FACTORY).option("fakePath", fake_path)
        .option("stream", "out").mode("append").save())
    back = (spark.read.format(fmt)
            .option("clientFactory", FACTORY).option("fakePath", fake_path)
            .option("stream", "out").load())
    rows = sorted((r2["values"]["k"], r2["values"]["v"]) for r2 in back.collect())
    assert rows == [("a", "1"), ("b", "2")]


def test_redis_stream_multi_stream_partitions(spark, fake_path):
    """Comma-separated streams: each stream is its own partition (the
    scale unit), all merged into one DataFrame."""
    r = FakeRedis(fake_path)
    r.xadd("s1", {"v": "x"})
    r.xadd("s2", {"v": "y"})
    fmt, _ = register_redis_sources(spark)
    df = (spark.read.format(fmt)
          .option("clientFactory", FACTORY).option("fakePath", fake_path)
          .option("stream", "s1,s2").load())
    assert df.rdd.getNumPartitions() == 2
    assert sorted((x["stream"], x["values"]["v"]) for x in df.collect()) == [
        ("s1", "x"), ("s2", "y")]


def test_pubsub_reader_at_most_once(fake_path):
    """Pub/Sub semantics (redis_pubsub.go): messages published before
    SUBSCRIBE are lost; after, they are drained per trigger; committed
    prefix is trimmed but uncommitted ranges replay."""
    r = FakeRedis(fake_path)
    r.publish("chan", "lost")  # before subscribe -> never delivered
    reader = RedisPubSubStreamReader(_opts(fake_path, channel="chan"))
    start = reader.initialOffset()
    reader._sub()  # subscribe now
    r.publish("chan", "m1")
    r.publish("chan", "m2")
    rows, end = reader.read(start)
    rows = list(rows)
    assert [x[2] for x in rows] == ["m1", "m2"] and end == {"n": 2}
    # replay of the uncommitted range returns the same rows
    assert [x[2] for x in reader.readBetweenOffsets(start, end)] == ["m1", "m2"]
    reader.commit(end)
    r.publish("chan", "m3")
    rows2, end2 = reader.read(end)
    assert [x[2] for x in list(rows2)] == ["m3"] and end2 == {"n": 3}


def test_pubsub_spark_end_to_end(spark, fake_path):
    """Driver-side subscriber through the full Spark streaming path,
    plus the PUBLISH sink."""
    fmt_stream, fmt_ps = register_redis_sources(spark)
    name = "ps_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt_ps)
         .option("clientFactory", FACTORY).option("fakePath", fake_path)
         .option("channel", "alerts")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    r = FakeRedis(fake_path)
    # wait until the subscription exists, then publish
    deadline = time.time() + 30
    while time.time() < deadline and not q.lastProgress:
        time.sleep(0.2)
    r.publish("alerts", "p1")
    r.publish("alerts", "p2")
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 2:
        time.sleep(0.5)
    q.stop()
    got = sorted(x["payload"] for x in spark.table(name).collect())
    assert got == ["p1", "p2"]

    # sink: stream rows into PUBLISH via the pubsub stream writer
    import json

    from go_streams_spark.sources.custom import register_replay_source
    src_path = os.path.join(os.path.dirname(fake_path), "rows.jsonl")
    with open(src_path, "w") as f:
        f.write(json.dumps({"payload": "hello"}) + "\n")
        f.write(json.dumps({"payload": "world"}) + "\n")
    replay_fmt = register_replay_source(spark)
    ckpt = os.path.join(os.path.dirname(fake_path), "ckpt")
    wq = (spark.readStream.format(replay_fmt)
          .option("path", src_path).option("ddl", "payload string")
          .option("rowsPerBatch", "10").load()
          .writeStream.format(fmt_ps)
          .option("clientFactory", FACTORY).option("fakePath", fake_path)
          .option("channel", "outchan")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    wq.awaitTermination(60)
    assert sorted(r._read()["pubsub"]["outchan"]) == ["hello", "world"]


def test_redis_stream_checkpoint_recovery_no_dup_no_loss(spark, fake_path, tmp_path):
    """Exactly-once across restarts: stop the query mid-stream, append
    more entries, restart from the same checkpoint. Spark may REPLAY the
    last micro-batch whose commit wasn't recorded before the stop
    (foreachBatch is at-least-once), but the replayed range contains
    IDENTICAL rows (XRANGE determinism), so an idempotent sink keyed by
    batchId — the standard exactly-once recipe — lands every entry
    exactly once with no gaps."""
    r = FakeRedis(fake_path)
    for i in range(6):
        r.xadd("s", {"n": str(i)})
    fmt, _ = register_redis_sources(spark)
    ckpt = str(tmp_path / "ckpt")
    # idempotent sink: upsert by batchId (a replayed batch overwrites
    # itself instead of duplicating)
    by_batch: dict[int, list] = {}

    def start():
        # the consumer group is the durable recovery position: commit()
        # advances it; a restarted reader seeds its rate-cap cursor from
        # it (the Python DS protocol restores no offsets itself)
        return (spark.readStream.format(fmt)
                .option("clientFactory", FACTORY).option("fakePath", fake_path)
                .option("stream", "s").option("group", "recov")
                .option("maxEntriesPerTrigger", "4")
                .load()
                .writeStream
                .foreachBatch(lambda df, bid: by_batch.__setitem__(
                    bid, [x["values"]["n"] for x in df.collect()]))
                .option("checkpointLocation", ckpt)
                .outputMode("append").start())

    def landed():
        return sorted(n for rows in by_batch.values() for n in rows)

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 6:
        time.sleep(0.5)
    q.stop()
    assert landed() == [str(i) for i in range(6)]

    # entries land while the query is DOWN
    r.xadd("s", {"n": "6"})
    r.xadd("s", {"n": "7"})

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 8:
        time.sleep(0.5)
    q2.stop()
    # exactly once end-to-end: 0..7, no duplicates, no gaps — even if
    # the tail batch of phase 1 was replayed on restart
    assert landed() == sorted(str(i) for i in range(8))


def test_fluent_pipeline_over_redis_connector(spark, fake_path):
    """The reference's canonical wiring (examples in the reference:
    connector Source -> Via(flow...) -> To(sink)) over the REAL Redis
    stream connector through the fluent API: Source.via(Map).via(Filter)
    .to(memory sink), streaming end-to-end."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from go_streams_spark.api import Source
    from go_streams_spark.operators import Filter, Map
    from go_streams_spark.sources.custom import redis_stream_source
    from go_streams_spark.streaming import memory_sink

    r = FakeRedis(fake_path)
    for i in range(6):
        r.xadd("in", {"n": str(i)})

    stream = redis_stream_source(
        spark, clientFactory=FACTORY, fakePath=fake_path, stream="in")
    name = "fluent_" + _uuid.uuid4().hex[:8]
    q = (Source(stream)
         .via(Map({"n": F.col("values")["n"].cast("int")}))
         .via(Filter(F.col("n") % 2 == 0))
         .to(memory_sink(name, available_now=False,
                         await_termination=False)))
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 3:
        time.sleep(0.5)
    q.stop()
    assert sorted(x["n"] for x in spark.table(name).collect()) == [0, 2, 4]


def test_windowed_aggregation_over_redis_stream(spark, fake_path):
    """North-star wiring: a broker source + event-time windowing. The
    stream entry ID's millisecond half IS the event time (entry_ts), so
    a tumbling window aggregates the connector stream without any extra
    timestamp field."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from go_streams_spark.sources.redis_stream import entry_ts

    r = FakeRedis(fake_path)
    # explicit IDs: two windows' worth of entries (minute granularity)
    base = 1_700_000_000_000  # some wall-clock ms
    for i, (off, v) in enumerate([(0, 1), (10_000, 2), (70_000, 3)]):
        r.xadd("m", {"v": str(v)}, id=f"{base + off}-{i}")
    fmt, _ = register_redis_sources(spark)
    name = "win_" + _uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", FACTORY).option("fakePath", fake_path)
         .option("stream", "m").load()
         .withColumn("ts", entry_ts("id"))
         .withColumn("v", F.col("values")["v"].cast("int"))
         .groupBy(F.window("ts", "1 minute").alias("w"))
         .agg(F.sum("v").alias("total"))
         .select(F.col("w.start").alias("ws"), "total")
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 2:
        time.sleep(0.5)
    q.stop()
    got = sorted((str(x["ws"]), x["total"]) for x in spark.table(name).collect())
    assert [t for _, t in got] == [3, 3]  # window1: 1+2, window2: 3
