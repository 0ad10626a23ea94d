"""NATS JetStream / Pulsar / WebSocket / Aerospike connector tests.

Same approach as test_redis_connector.py: the Data Source code under
test is the real connector; only the network client is swapped for a
file-backed fake via the clientFactory option, so offset planning,
executor-side range reads, and the sink write paths execute for real.
"""

import time
import uuid

import pytest

from go_streams_spark.sources.aerospike import (
    AerospikeCDCStreamReader,
    register_aerospike_source,
)
from go_streams_spark.sources.nats_jetstream import (
    NatsStreamReader,
    register_nats_source,
)
from go_streams_spark.sources.pulsar import (
    PulsarStreamReader,
    register_pulsar_source,
)
from go_streams_spark.sources.websocket import (
    WebSocketStreamReader,
    register_websocket_source,
)
from go_streams_spark.testing.fake_aerospike import FakeAerospike
from go_streams_spark.testing.fake_nats import FakeJetStream
from go_streams_spark.testing.fake_pulsar import FakePulsarClient
from go_streams_spark.testing.fake_websocket import FakeWebSocketServer

NATS_FACTORY = "go_streams_spark.testing.fake_nats:fake_nats_factory"
PULSAR_FACTORY = "go_streams_spark.testing.fake_pulsar:fake_pulsar_factory"
WS_FACTORY = "go_streams_spark.testing.fake_websocket:fake_websocket_factory"
AERO_FACTORY = "go_streams_spark.testing.fake_aerospike:fake_aerospike_factory"


@pytest.fixture
def fake_path(tmp_path):
    return str(tmp_path / "broker.json")


# ---------------------------------------------------------------- NATS


def test_nats_offsets_fetch_cap_and_replay(fake_path):
    js = FakeJetStream(fake_path)
    js.add_stream("ORDERS", ["orders.>"])
    for i in range(10):
        js.publish(f"orders.new.{i % 2}", f"o{i}".encode())
    reader = NatsStreamReader({"clientfactory": NATS_FACTORY,
                               "fakepath": fake_path, "stream": "ORDERS",
                               "fetchbatchsize": "4"})
    start = reader.initialOffset()
    assert start == {"seq": 0}
    end1 = reader.latestOffset()
    assert end1 == {"seq": 4}  # FetchBatchSize cap per trigger
    [p] = reader.partitions(start, end1)
    rows = list(reader.read(p))
    assert [r[0] for r in rows] == [1, 2, 3, 4]
    assert rows[0][1] == "orders.new.0" and rows[0][2] == b"o0"
    # deterministic replay of the same range
    assert list(reader.read(p)) == rows
    assert reader.latestOffset() == {"seq": 8}
    assert reader.latestOffset() == {"seq": 10}  # drains to the tail


def test_nats_deliver_new_policy(fake_path):
    js = FakeJetStream(fake_path)
    js.add_stream("S", ["s.>"])
    js.publish("s.a", b"old")
    reader = NatsStreamReader({"clientfactory": NATS_FACTORY,
                               "fakepath": fake_path, "stream": "S",
                               "deliverpolicy": "new"})
    start = reader.initialOffset()
    assert start == {"seq": 1}  # starts at the current tail
    js.publish("s.a", b"new")
    end = reader.latestOffset()
    [p] = reader.partitions(start, end)
    assert [(r[0], r[2]) for r in reader.read(p)] == [(2, b"new")]


def test_nats_spark_end_to_end(spark, fake_path):
    js = FakeJetStream(fake_path)
    js.add_stream("EVENTS", ["ev.>"])
    for i in range(6):
        js.publish("ev.x", f"m{i}".encode())
    fmt = register_nats_source(spark)
    name = "nats_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", NATS_FACTORY).option("fakePath", fake_path)
         .option("stream", "EVENTS").option("fetchBatchSize", "4")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 6:
        time.sleep(0.5)
    q.stop()
    got = sorted(bytes(r["data"]).decode() for r in spark.table(name).collect())
    assert got == [f"m{i}" for i in range(6)]

    # sink: publish back through the JetStream writer (batch mode)
    df = spark.createDataFrame([("ev.y", b"out1"), ("ev.y", b"out2")],
                               "subject string, data binary")
    (df.write.format(fmt)
       .option("clientFactory", NATS_FACTORY).option("fakePath", fake_path)
       .option("stream", "EVENTS").mode("append").save())
    assert js.last_sequence("EVENTS") == 8
    tail = list(js.fetch_range("EVENTS", 6, 8))
    # rows publish from parallel tasks: arrival order is nondeterministic
    assert sorted(t[2] for t in tail) == [b"out1", b"out2"]

    # batch read splits the stream into sequence-range partitions
    df2 = (spark.read.format(fmt)
           .option("clientFactory", NATS_FACTORY).option("fakePath", fake_path)
           .option("stream", "EVENTS").option("numPartitions", "3").load())
    assert df2.rdd.getNumPartitions() == 3
    assert df2.count() == 8


# -------------------------------------------------------------- Pulsar


def test_pulsar_offsets_and_replay(fake_path):
    pc = FakePulsarClient(fake_path)
    ids = [pc.publish("t", f"p{i}".encode(), key=str(i % 2)) for i in range(5)]
    reader = PulsarStreamReader({"clientfactory": PULSAR_FACTORY,
                                 "fakepath": fake_path, "topic": "t"})
    start = reader.initialOffset()
    assert start == {"t": "0:-1"}
    end = reader.latestOffset()
    assert end == {"t": ids[-1]}
    [p] = reader.partitions(start, end)
    rows = list(reader.read(p))
    assert [r[0] for r in rows] == ids
    assert rows[0][1] == "0" and rows[0][2] == b"p0"
    assert list(reader.read(p)) == rows  # deterministic replay
    # startingOffsets=latest skips history
    tail_reader = PulsarStreamReader({"clientfactory": PULSAR_FACTORY,
                                      "fakepath": fake_path, "topic": "t",
                                      "startingoffsets": "latest"})
    assert tail_reader.initialOffset() == {"t": ids[-1]}

    # multi-topic reader: one offset entry and one partition per topic
    ids2 = [pc.publish("t2", f"q{i}".encode()) for i in range(3)]
    multi = PulsarStreamReader({"clientfactory": PULSAR_FACTORY,
                                "fakepath": fake_path, "topic": "t, t2"})
    mstart = multi.initialOffset()
    assert mstart == {"t": "0:-1", "t2": "0:-1"}
    mend = multi.latestOffset()
    assert mend == {"t": ids[-1], "t2": ids2[-1]}
    parts = {p.topic: p for p in multi.partitions(mstart, mend)}
    assert set(parts) == {"t", "t2"}
    assert [r[0] for r in multi.read(parts["t2"])] == ids2
    # a topic absent from `start` (appeared mid-run) reads from earliest
    grown = {p.topic: p for p in multi.partitions({"t": ids[-1]}, mend)}
    assert [r[0] for r in multi.read(grown["t2"])] == ids2
    assert list(multi.read(grown["t"])) == []  # caught-up topic is empty


def test_pulsar_spark_end_to_end(spark, fake_path):
    pc = FakePulsarClient(fake_path)
    for i in range(4):
        pc.publish("topic1", f"msg{i}".encode())
    fmt = register_pulsar_source(spark)
    name = "pulsar_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", PULSAR_FACTORY).option("fakePath", fake_path)
         .option("topic", "topic1")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 4:
        time.sleep(0.5)
    # live publish lands in a later micro-batch
    pc.publish("topic1", b"msg4")
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 5:
        time.sleep(0.5)
    q.stop()
    got = sorted(bytes(r["data"]).decode() for r in spark.table(name).collect())
    assert got == [f"msg{i}" for i in range(5)]

    # sink: produce rows to another topic, batch-read them back
    df = spark.createDataFrame([("k1", b"v1"), ("k2", b"v2")],
                               "key string, data binary")
    (df.write.format(fmt)
       .option("clientFactory", PULSAR_FACTORY).option("fakePath", fake_path)
       .option("topic", "out").mode("append").save())
    back = (spark.read.format(fmt)
            .option("clientFactory", PULSAR_FACTORY).option("fakePath", fake_path)
            .option("topic", "out").load())
    rows = sorted((r["key"], bytes(r["data"])) for r in back.collect())
    assert rows == [("k1", b"v1"), ("k2", b"v2")]


# ----------------------------------------------------------- WebSocket


def test_websocket_at_most_once_semantics(fake_path):
    ws = FakeWebSocketServer(fake_path)
    ws.push("ws://feed", b"before-connect")  # lost: no replay in websockets
    reader = WebSocketStreamReader({"clientfactory": WS_FACTORY,
                                    "fakepath": fake_path, "url": "ws://feed"})
    start = reader.initialOffset()
    reader._c()  # connect now
    ws.push("ws://feed", b"f1")
    ws.push("ws://feed", b"f2", msg_type=2)
    rows, end = reader.read(start)
    rows = list(rows)
    assert [(t, bytes(p)) for t, p in rows] == [(1, b"f1"), (2, b"f2")]
    assert end == {"n": 2}
    # uncommitted range replays from the in-memory tail
    assert list(reader.readBetweenOffsets(start, end)) == rows
    reader.commit(end)
    ws.push("ws://feed", b"f3")
    rows2, end2 = reader.read(end)
    assert [bytes(p) for _, p in list(rows2)] == [b"f3"] and end2 == {"n": 3}


def test_websocket_spark_end_to_end(spark, fake_path, tmp_path):
    import json as _json

    from go_streams_spark.sources.custom import register_replay_source
    ws = FakeWebSocketServer(fake_path)
    fmt = register_websocket_source(spark)
    name = "ws_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", WS_FACTORY).option("fakePath", fake_path)
         .option("url", "ws://feed")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 30
    while time.time() < deadline and not q.lastProgress:
        time.sleep(0.2)
    ws.push("ws://feed", b"hello")
    ws.push("ws://feed", b"world")
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 2:
        time.sleep(0.5)
    q.stop()
    got = sorted(bytes(r["payload"]).decode() for r in spark.table(name).collect())
    assert got == ["hello", "world"]

    # sink: stream rows out as frames through the frame writer
    src_path = str(tmp_path / "rows.jsonl")
    with open(src_path, "w") as f:
        f.write(_json.dumps({"payload": "outbound"}) + "\n")
    replay_fmt = register_replay_source(spark)
    wq = (spark.readStream.format(replay_fmt)
          .option("path", src_path).option("ddl", "payload string")
          .option("rowsPerBatch", "10").load()
          .writeStream.format(fmt)
          .option("clientFactory", WS_FACTORY).option("fakePath", fake_path)
          .option("url", "ws://out")
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    wq.awaitTermination(60)
    assert ws._frames("ws://out") == [[1, "outbound"]]


# ----------------------------------------------------------- Aerospike


def test_aerospike_cdc_reader_window(fake_path):
    aero = FakeAerospike(fake_path)
    aero.put_batch("ns", "users", [("u1", {"v": "1"})])
    aero.put_batch("ns", "users", [("u2", {"v": "2"})])
    reader = AerospikeCDCStreamReader({"clientfactory": AERO_FACTORY,
                                       "fakepath": fake_path,
                                       "namespace": "ns", "set": "users"})
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert end == {"lut": 2}
    [p] = reader.partitions(start, end)
    rows = sorted(reader.read(p))
    assert [(r[0], r[1]["v"]) for r in rows] == [("u1", "1"), ("u2", "2")]
    # an update re-enters the change stream with a newer cursor
    aero.put_batch("ns", "users", [("u1", {"v": "9"})])
    end2 = reader.latestOffset()
    [p2] = reader.partitions(end, end2)
    assert [(r[0], r[1]["v"]) for r in reader.read(p2)] == [("u1", "9")]


def test_aerospike_spark_sink_batched_puts(spark, fake_path):
    """Batched put path (BatchSize, aerospike.go:255-332): rows flush in
    batchSize groups; keyed upserts make replays idempotent."""
    fmt = register_aerospike_source(spark)
    df = spark.createDataFrame(
        [(f"k{i}", str(i)) for i in range(7)], "key string, v string")
    (df.repartition(1).write.format(fmt)
       .option("clientFactory", AERO_FACTORY).option("fakePath", fake_path)
       .option("namespace", "ns").option("set", "s")
       .option("batchSize", "3").mode("append").save())
    aero = FakeAerospike(fake_path)
    rows = sorted(aero.scan("ns", "s"))
    assert [(k, b["v"]) for k, b, _ in rows] == [
        (f"k{i}", str(i)) for i in range(7)]
    # 7 rows at batchSize=3 -> 3 batched put calls -> 3 clock ticks
    assert aero.max_last_update("ns", "s") == 3

    # batch read back through the scan reader
    back = (spark.read.format(fmt)
            .option("clientFactory", AERO_FACTORY).option("fakePath", fake_path)
            .option("namespace", "ns").option("set", "s").load())
    assert back.count() == 7
    assert sorted(r["bins"]["v"] for r in back.collect()) == sorted(
        str(i) for i in range(7))


def test_aerospike_spark_cdc_stream(spark, fake_path):
    fmt = register_aerospike_source(spark)
    aero = FakeAerospike(fake_path)
    aero.put_batch("ns", "s", [("a", {"v": "1"}), ("b", {"v": "2"})])
    name = "aero_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("clientFactory", AERO_FACTORY).option("fakePath", fake_path)
         .option("namespace", "ns").option("set", "s")
         .load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 2:
        time.sleep(0.5)
    aero.put_batch("ns", "s", [("c", {"v": "3"})])
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 3:
        time.sleep(0.5)
    q.stop()
    assert sorted(r["key"] for r in spark.table(name).collect()) == ["a", "b", "c"]


def test_nats_checkpoint_recovery_idempotent_sink(spark, fake_path, tmp_path):
    """Restart contract for the rate-capped NATS reader: the partitions()
    repair stops a recovered reader from re-planning delivered ranges;
    the tail batch may replay (at-least-once without a durable
    server-side cursor), so the standard batchId-idempotent sink yields
    exactly-once end to end — no gaps, no dups."""
    js = FakeJetStream(fake_path)
    js.add_stream("S", ["s.>"])
    for i in range(6):
        js.publish("s.x", f"m{i}".encode())
    fmt = register_nats_source(spark)
    ckpt = str(tmp_path / "ckpt")
    by_batch: dict[int, list] = {}

    def start():
        return (spark.readStream.format(fmt)
                .option("clientFactory", NATS_FACTORY)
                .option("fakePath", fake_path)
                .option("stream", "S").option("fetchBatchSize", "4")
                .load()
                .writeStream
                .foreachBatch(lambda df, bid: by_batch.__setitem__(
                    bid, [bytes(x["data"]).decode() for x in df.collect()]))
                .option("checkpointLocation", ckpt)
                .outputMode("append").start())

    def landed():
        return sorted(m for rows in by_batch.values() for m in rows)

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 6:
        time.sleep(0.5)
    q.stop()
    assert landed() == [f"m{i}" for i in range(6)]

    js.publish("s.x", b"m6")
    js.publish("s.x", b"m7")
    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 8:
        time.sleep(0.5)
    q2.stop()
    assert landed() == sorted(f"m{i}" for i in range(8))


def test_aerospike_streaming_sink(spark, fake_path, tmp_path):
    """Streaming batched-put path: rows flow from a replay stream into
    Aerospike via the stream writer; keyed upserts land once per key."""
    import json as _json

    from go_streams_spark.sources.custom import register_replay_source
    src = str(tmp_path / "rows.jsonl")
    with open(src, "w") as f:
        for i in range(5):
            f.write(_json.dumps({"key": f"k{i}", "v": str(i)}) + "\n")
    replay_fmt = register_replay_source(spark)
    fmt = register_aerospike_source(spark)
    q = (spark.readStream.format(replay_fmt)
         .option("path", src).option("ddl", "key string, v string")
         .option("rowsPerBatch", "2").load()
         .writeStream.format(fmt)
         .option("clientFactory", AERO_FACTORY).option("fakePath", fake_path)
         .option("namespace", "ns").option("set", "st")
         .option("batchSize", "2")
         .option("checkpointLocation", str(tmp_path / "cp"))
         .start())
    deadline = time.time() + 60
    aero = FakeAerospike(fake_path)
    while time.time() < deadline and len(list(aero.scan("ns", "st"))) < 5:
        time.sleep(0.5)
    q.stop()
    rows = sorted((k, b["v"]) for k, b, _ in aero.scan("ns", "st"))
    assert rows == [(f"k{i}", str(i)) for i in range(5)]


def test_nats_and_pulsar_streaming_sinks(spark, tmp_path):
    """Streaming publish paths for the remaining connectors: rows from a
    replay stream land in JetStream and a Pulsar topic via the stream
    writers."""
    import json as _json

    from go_streams_spark.sources.custom import register_replay_source
    src = str(tmp_path / "rows.jsonl")
    with open(src, "w") as f:
        for i in range(3):
            f.write(_json.dumps({"data": f"m{i}"}) + "\n")
    replay_fmt = register_replay_source(spark)

    nats_path = str(tmp_path / "nats.json")
    js = FakeJetStream(nats_path)
    js.add_stream("OUT", ["out.>"])
    q1 = (spark.readStream.format(replay_fmt)
          .option("path", src).option("ddl", "data string")
          .option("rowsPerBatch", "10").load()
          .writeStream.format(register_nats_source(spark))
          .option("clientFactory", NATS_FACTORY).option("fakePath", nats_path)
          .option("stream", "OUT").option("subject", "out.s")
          .option("checkpointLocation", str(tmp_path / "cp1"))
          .trigger(availableNow=True).start())
    q1.awaitTermination(60)
    assert sorted(d for _, _, d in js.fetch_range("OUT", 0, 3)) == [
        b"m0", b"m1", b"m2"]

    pulsar_path = str(tmp_path / "pulsar.json")
    q2 = (spark.readStream.format(replay_fmt)
          .option("path", src).option("ddl", "data string")
          .option("rowsPerBatch", "10").load()
          .writeStream.format(register_pulsar_source(spark))
          .option("clientFactory", PULSAR_FACTORY)
          .option("fakePath", pulsar_path)
          .option("topic", "t1")
          .option("checkpointLocation", str(tmp_path / "cp2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(60)
    pc = FakePulsarClient(pulsar_path)
    assert sorted(d for _, _, d in pc.read_range("t1", "0:-1", "0:2")) == [
        b"m0", b"m1", b"m2"]


# ------------------------------------------- checkpoint recovery


def test_nats_checkpoint_recovery_no_dup_no_loss(spark, fake_path, tmp_path):
    """Kill-and-restart for the seq-range reader (reference ack
    semantics: nats_jetstream.go:135-147 per-message Ack). Stop the
    query mid-stream, publish while it is down, restart from the same
    checkpoint: every message lands exactly once — the tail micro-batch
    may replay (foreachBatch is at-least-once) but a batchId-keyed
    idempotent sink overwrites it with identical rows (seq-range
    determinism), so no committed entry duplicates and none is lost."""
    js = FakeJetStream(fake_path)
    js.add_stream("EV", ["ev.>"])
    for i in range(6):
        js.publish("ev.a", f"n{i}".encode())
    fmt = register_nats_source(spark)
    ckpt = str(tmp_path / "ckpt")
    by_batch: dict[int, list] = {}

    def start():
        return (spark.readStream.format(fmt)
                .option("clientFactory", NATS_FACTORY)
                .option("fakePath", fake_path)
                .option("stream", "EV").option("fetchBatchSize", "4")
                .load()
                .writeStream
                .foreachBatch(lambda df, bid: by_batch.__setitem__(
                    bid, [bytes(r["data"]).decode() for r in df.collect()]))
                .option("checkpointLocation", ckpt)
                .outputMode("append").start())

    def landed():
        return sorted(n for rows in by_batch.values() for n in rows)

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 6:
        time.sleep(0.5)
    q.stop()
    assert landed() == [f"n{i}" for i in range(6)]

    # messages arrive while the query is DOWN
    js.publish("ev.a", b"n6")
    js.publish("ev.a", b"n7")

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 8:
        time.sleep(0.5)
    q2.stop()
    assert landed() == sorted(f"n{i}" for i in range(8))


def test_pulsar_checkpoint_recovery_no_dup_no_loss(spark, fake_path, tmp_path):
    """Kill-and-restart for the MessageId-range reader (reference
    cursor semantics: pulsar/pulsar.go:57-79 subscription cursor — here
    the Spark checkpoint IS the cursor). Same recipe as the NATS/Redis
    tests: idempotent batchId-keyed sink, stop mid-stream, publish while
    down, restart; exactly-once end to end."""
    pc = FakePulsarClient(fake_path)
    for i in range(6):
        pc.publish("rt", f"p{i}".encode())
    fmt = register_pulsar_source(spark)
    ckpt = str(tmp_path / "ckpt")
    by_batch: dict[int, list] = {}

    def start():
        return (spark.readStream.format(fmt)
                .option("clientFactory", PULSAR_FACTORY)
                .option("fakePath", fake_path)
                .option("topic", "rt")
                .load()
                .writeStream
                .foreachBatch(lambda df, bid: by_batch.__setitem__(
                    bid, [bytes(r["data"]).decode() for r in df.collect()]))
                .option("checkpointLocation", ckpt)
                .outputMode("append").start())

    def landed():
        return sorted(n for rows in by_batch.values() for n in rows)

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 6:
        time.sleep(0.5)
    q.stop()
    assert landed() == [f"p{i}" for i in range(6)]

    pc.publish("rt", b"p6")
    pc.publish("rt", b"p7")

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 8:
        time.sleep(0.5)
    q2.stop()
    assert landed() == sorted(f"p{i}" for i in range(8))


# ---------------------------------------------------------------- Kafka


def test_kafka_wrapper_end_to_end_fake_datasource(spark, tmp_path):
    """The REAL kafka_source/kafka_sink wrapper code end to end — format
    resolution, option plumbing, envelope schema, offset ranges, and
    checkpoint-restart exactly-once — against a file-backed Python Data
    Source injected through the wrappers' format= seam (Spark reserves
    the provider name "kafka"; this container has no
    broker and no spark-sql-kafka package; on a real cluster the
    built-in JVM connector serves the same surface, smoke-tested by
    test_kafka_roundtrip_real_broker). MarkMessage semantics
    (kafka/kafka_sarama.go:128): the consumed position is the
    checkpoint, so a restarted query resumes past everything already
    delivered."""
    import json
    import os

    from pyspark.sql import functions as F

    from go_streams_spark.streaming.io import kafka_sink, kafka_source
    from go_streams_spark.testing.fake_kafka import register_fake_kafka

    fmt = register_fake_kafka(spark)
    broker = str(tmp_path / "broker")
    topic = "orders"
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    # produce 3 records through the connector's write surface (batch)
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], "key string, value string")
    (df.selectExpr("CAST(key AS BINARY) key", "CAST(value AS BINARY) value")
     .coalesce(1).write.format(fmt).mode("append")
     .option("kafka.bootstrap.servers", broker)
     .option("topic", topic).save())

    def consume():
        q = (kafka_source(spark, broker, topic, format=fmt)
             .selectExpr("CAST(key AS STRING) key",
                         "CAST(value AS STRING) value",
                         "topic", "partition", "offset")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["offset"]: (r["key"], r["value"], r["topic"],
                              r["partition"])
                for r in spark.read.parquet(out).collect()}

    got = consume()
    assert got == {0: ("k1", "v1", topic, 0), 1: ("k2", "v2", topic, 0),
                   2: ("k3", "v3", topic, 0)}

    # the wrapper's options must have reached the source verbatim
    opts = json.load(open(os.path.join(broker, topic,
                                       "reader_options.json")))
    assert opts["kafka.bootstrap.servers"] == broker
    assert opts["subscribe"] == topic
    assert opts["startingoffsets"] == "earliest"

    # produce 2 more through kafka_sink's STREAMING write surface
    src = str(tmp_path / "src")
    spark.createDataFrame([("k4", "v4"), ("k5", "v5")],
                          "key string, value string") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("key string, value string")
              .parquet(src)
              .select(F.col("key").cast("binary").alias("key"),
                      F.col("value").cast("binary").alias("value")))
    sink = kafka_sink(broker, topic, checkpoint=str(tmp_path / "cp_sink"),
                      available_now=True, format=fmt)
    sink(stream).awaitTermination(120)

    # restart on the SAME checkpoint: exactly the 2 new offsets arrive
    again = consume()
    assert set(again) == {0, 1, 2, 3, 4}
    assert again[3][1] == "v4" and again[4][1] == "v5"


def test_kafka_fake_multipartition_kill_restart(spark, tmp_path):
    """N-partition topic semantics through the REAL wrapper (the
    reference consumes all partitions of a topic via a consumer group,
    kafka/kafka_sarama.go:57-136): keyed records stick to one partition,
    per-partition offsets are independent and contiguous, produce order
    is preserved WITHIN a partition (Kafka's actual ordering contract —
    there is no cross-partition order), and a consumer killed mid-stream
    resumes from its per-partition checkpoint positions exactly-once."""
    import zlib as _zlib

    from go_streams_spark.streaming.io import kafka_source
    from go_streams_spark.testing.fake_kafka import register_fake_kafka

    fmt = register_fake_kafka(spark)
    broker = str(tmp_path / "broker")
    topic = "clicks"
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def produce(pairs):
        df = spark.createDataFrame(pairs, "key string, value string")
        (df.selectExpr("CAST(key AS BINARY) key", "CAST(value AS BINARY) value")
         .coalesce(1).write.format(fmt).mode("append")
         .option("kafka.bootstrap.servers", broker)
         .option("topic", topic).option("num.partitions", "3").save())

    first = [(f"k{i % 7}", f"v{i}") for i in range(30)]
    produce(first)

    def landed():
        try:
            return {(r["partition"], r["offset"]): (r["key"], r["value"])
                    for r in (spark.read.parquet(out)
                              .selectExpr("CAST(key AS STRING) key",
                                          "CAST(value AS STRING) value",
                                          "partition", "offset").collect())}
        except Exception:
            return {}

    def consume_all():
        q = (kafka_source(spark, broker, topic, format=fmt)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return landed()

    got = consume_all()
    assert len(got) == 30
    parts = {p for p, _ in got}
    assert parts == {0, 1, 2}  # k0..k6 keys spread over all 3
    # per-partition offsets contiguous from 0
    for p in parts:
        offs = sorted(o for q, o in got if q == p)
        assert offs == list(range(len(offs)))
    # keyed stickiness: every key lives on exactly one partition, and it
    # is the crc32 % 3 partition the fake's partitioner contract names
    key_parts = {}
    for (p, _), (k, _v) in got.items():
        key_parts.setdefault(k, set()).add(p)
    assert all(len(ps) == 1 for ps in key_parts.values())
    assert all(ps == {_zlib.crc32(k.encode()) % 3}
               for k, ps in key_parts.items())
    # produce order preserved within each partition
    for p in parts:
        vals = [got[(p, o)][1] for o in sorted(o for q, o in got if q == p)]
        expect = [v for k, v in first
                  if _zlib.crc32(k.encode()) % 3 == p]
        assert vals == expect

    # ---- kill mid-stream, produce during downtime, restart exactly-once
    q = (kafka_source(spark, broker, topic, format=fmt)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", cp)
         .outputMode("append").trigger(processingTime="300 milliseconds")
         .start())
    produce([(f"k{i % 7}", f"mid{i}") for i in range(10)])
    deadline = time.time() + 60
    while time.time() < deadline and len(landed()) < 40:
        time.sleep(0.3)
    q.stop()  # the kill: partial consumption checkpointed per-partition
    assert len(landed()) == 40
    produce([(f"k{i % 7}", f"down{i}") for i in range(20)])

    final = consume_all()
    assert len(final) == 60  # no dupes (exactly-once), no gaps
    for p in {0, 1, 2}:
        offs = sorted(o for q2, o in final if q2 == p)
        assert offs == list(range(len(offs)))
