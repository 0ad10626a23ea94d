"""Env-gated REAL-broker integration tests (round 4, VERDICT item #5).

Every connector suite so far exercises the real Data Source code with
only the network client swapped for a file-backed fake. This module
closes the remaining gap — the real client library against a live
broker — by running the SAME offset/replay/ack scenarios parameterized
over ``fake`` and ``real`` backends:

    REDIS_URL=redis://host:6379/0    -> redis-py against live Redis
    NATS_URL=nats://host:4222        -> nats-py against live JetStream
    PULSAR_URL=pulsar://host:6650    -> pulsar-client against live Pulsar

When the env var (or the client library, or the broker itself) is
missing, the ``real`` parameter SKIPS — it never silently falls back to
the fake (the ``fake`` parameter already covers that path, keeping the
shared scenario code exercised in broker-less CI). Stream/topic names
are uuid-unique so reruns against a shared broker don't collide, and
real-broker state is cleaned up where the client API allows.

Reference semantics under test: ``redis/redis_stream.go:94-124`` (XRANGE
replay + XGROUP SETID ack), ``nats/nats_jetstream.go:135-147``
(FetchBatchSize'd pull loop -> sequence cursor),
``pulsar/pulsar.go:57-79`` (reader-API cursor replay).
"""

import os
import uuid

import pytest

from go_streams_spark.sources.nats_jetstream import NatsStreamReader
from go_streams_spark.sources.pulsar import PulsarStreamReader
from go_streams_spark.sources.redis_stream import (
    RedisStreamStreamReader,
    register_redis_sources,
)
from go_streams_spark.testing.fake_nats import FakeJetStream
from go_streams_spark.testing.fake_pulsar import FakePulsarClient
from go_streams_spark.testing.fake_redis import FakeRedis

REDIS_FACTORY = "go_streams_spark.testing.fake_redis:fake_redis_factory"
NATS_FACTORY = "go_streams_spark.testing.fake_nats:fake_nats_factory"
PULSAR_FACTORY = "go_streams_spark.testing.fake_pulsar:fake_pulsar_factory"

BACKENDS = ["fake", "real"]


def _require_env(var: str) -> str:
    url = os.environ.get(var)
    if not url:
        pytest.skip(f"{var} not set — real-broker integration gated off "
                    "(skipped, never faked)")
    return url


class _Env:
    """One broker backend: connector option dict + a test-side client
    whose API is identical between the fake and the real library."""

    def __init__(self, opts: dict, client):
        self.base_opts = opts
        self.client = client

    def opts(self, **kw) -> dict:
        out = dict(self.base_opts)
        out.update({k.lower(): v for k, v in kw.items()})
        return out

    @staticmethod
    def unique(prefix: str) -> str:
        return f"{prefix}_{uuid.uuid4().hex[:10]}"


# ---------------------------------------------------------------- Redis


@pytest.fixture(params=BACKENDS)
def redis_env(request, tmp_path):
    if request.param == "fake":
        path = str(tmp_path / "redis.json")
        yield _Env({"clientfactory": REDIS_FACTORY, "fakepath": path},
                   FakeRedis(path))
        return
    url = _require_env("REDIS_URL")
    redis = pytest.importorskip(
        "redis", reason="redis-py not installed — real-redis run gated off")
    from urllib.parse import urlparse
    u = urlparse(url)
    client = redis.Redis.from_url(url, decode_responses=True)
    try:
        client.ping()
    except Exception as e:
        pytest.skip(f"cannot reach redis at {url}: {e}")
    # no clientfactory -> the connector's DEFAULT factory builds the
    # real redis-py client from these options (redis_stream.py:73-87)
    opts = {"host": u.hostname or "localhost",
            "port": str(u.port or 6379),
            "db": str((u.path or "/0").lstrip("/") or "0")}
    if u.password:
        opts["password"] = u.password
    env = _Env(opts, client)
    created: list[str] = []
    env.track = created.append
    yield env
    for key in created:
        try:
            client.delete(key)
        except Exception:
            pass
    client.close()


def test_redis_offsets_replay_and_group_ack(redis_env):
    """The recovery contract: same (start, end] -> same rows (XRANGE
    determinism), per-trigger cap, and commit() advancing the consumer
    group cursor via XGROUP SETID — against redis-py + a live server
    when REDIS_URL is set."""
    env = redis_env
    stream = env.unique("gss_it")
    getattr(env, "track", lambda _: None)(stream)
    ids = [env.client.xadd(stream, {"n": str(i)}) for i in range(7)]
    reader = RedisStreamStreamReader(
        env.opts(stream=stream, maxentriespertrigger="3", group="g"))

    start = reader.initialOffset()
    assert start == {stream: "0-0"}
    end1 = reader.latestOffset()
    assert end1 == {stream: ids[2]}  # capped at 3 entries per trigger
    [p1] = reader.partitions(start, end1)
    batch1 = list(reader.read(p1))
    assert [b[0] for b in batch1] == ids[:3]
    assert batch1[0][2] == {"n": "0"}

    end2 = reader.latestOffset()
    assert end2 == {stream: ids[5]}
    # replaying the FIRST range again yields identical rows — the
    # exactly-once property XREADGROUP cannot provide
    [p1b] = reader.partitions(start, end1)
    assert list(reader.read(p1b)) == batch1

    reader.commit(end2)
    groups = {g["name"]: g for g in env.client.xinfo_groups(stream)}
    assert groups["g"]["last-delivered-id"] == ids[5]

    end3 = reader.latestOffset()
    assert end3 == {stream: ids[6]}  # drains the remainder
    [p3] = reader.partitions(end2, end3)
    assert [b[0] for b in reader.read(p3)] == [ids[6]]


def test_redis_spark_sink_roundtrip(spark, redis_env):
    """Spark batch write -> XADD -> batch read back, over whichever
    client the backend provides (executors build the client themselves
    from options, so the real path proves redis-py works worker-side)."""
    env = redis_env
    stream = env.unique("gss_rt")
    getattr(env, "track", lambda _: None)(stream)
    fmt, _ = register_redis_sources(spark)
    out = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    w = out.write.format(fmt).option("stream", stream).mode("append")
    for k, v in env.base_opts.items():
        w = w.option(k, v)
    w.save()
    rd = spark.read.format(fmt).option("stream", stream)
    for k, v in env.base_opts.items():
        rd = rd.option(k, v)
    rows = sorted((r["values"]["k"], r["values"]["v"])
                  for r in rd.load().collect())
    assert rows == [("a", "1"), ("b", "2")]


# ----------------------------------------------------------------- NATS


@pytest.fixture(params=BACKENDS)
def nats_env(request, tmp_path):
    if request.param == "fake":
        path = str(tmp_path / "nats.json")
        js = FakeJetStream(path)
        env = _Env({"clientfactory": NATS_FACTORY, "fakepath": path}, js)
        env.add_stream = js.add_stream
        yield env
        return
    url = _require_env("NATS_URL")
    nats = pytest.importorskip(
        "nats", reason="nats-py not installed — real-NATS run gated off")
    import asyncio
    loop = asyncio.new_event_loop()
    try:
        nc = loop.run_until_complete(nats.connect(url, connect_timeout=5))
    except Exception as e:
        loop.close()
        pytest.skip(f"cannot reach NATS at {url}: {e}")
    js = nc.jetstream()

    from go_streams_spark.sources.nats_jetstream import NatsPyAdapter
    adapter = NatsPyAdapter({"servers": url})
    env = _Env({"servers": url}, adapter)
    created: list[str] = []

    def add_stream(name: str, subjects: list[str]):
        loop.run_until_complete(js.add_stream(name=name, subjects=subjects))
        created.append(name)

    env.add_stream = add_stream
    yield env
    for name in created:
        try:
            loop.run_until_complete(js.delete_stream(name))
        except Exception:
            pass
    adapter.close()
    try:
        loop.run_until_complete(nc.drain())
    finally:
        loop.close()


def test_nats_seq_offsets_fetch_cap_and_replay(nats_env):
    """Stream-sequence offsets: per-trigger FetchBatchSize cap, ordered
    fetch_range, deterministic replay of the same (start, end] — against
    nats-py + live JetStream when NATS_URL is set."""
    env = nats_env
    stream = env.unique("GSSIT").upper()
    subj = f"gssit.{uuid.uuid4().hex[:8]}"
    env.add_stream(stream, [f"{subj}.>"])
    for i in range(10):
        env.client.publish(f"{subj}.{i % 2}", f"o{i}".encode())
    reader = NatsStreamReader(env.opts(stream=stream, fetchbatchsize="4"))
    start = reader.initialOffset()
    assert start == {"seq": 0}
    end1 = reader.latestOffset()
    assert end1 == {"seq": 4}  # FetchBatchSize cap per trigger
    [p] = reader.partitions(start, end1)
    rows = list(reader.read(p))
    assert [r[0] for r in rows] == [1, 2, 3, 4]
    assert rows[0][1] == f"{subj}.0" and rows[0][2] == b"o0"
    assert list(reader.read(p)) == rows  # deterministic replay
    assert reader.latestOffset() == {"seq": 8}
    assert reader.latestOffset() == {"seq": 10}  # drains to the tail


def test_nats_deliver_new_policy(nats_env):
    env = nats_env
    stream = env.unique("GSSNEW").upper()
    subj = f"gssnew.{uuid.uuid4().hex[:8]}"
    env.add_stream(stream, [f"{subj}.>"])
    env.client.publish(f"{subj}.a", b"old")
    reader = NatsStreamReader(env.opts(stream=stream, deliverpolicy="new"))
    start = reader.initialOffset()
    assert start == {"seq": 1}  # starts at the current tail
    env.client.publish(f"{subj}.a", b"new")
    end = reader.latestOffset()
    [p] = reader.partitions(start, end)
    assert [(r[0], r[2]) for r in reader.read(p)] == [(2, b"new")]


# --------------------------------------------------------------- Pulsar


@pytest.fixture(params=BACKENDS)
def pulsar_env(request, tmp_path):
    if request.param == "fake":
        path = str(tmp_path / "pulsar.json")
        yield _Env({"clientfactory": PULSAR_FACTORY, "fakepath": path},
                   FakePulsarClient(path))
        return
    url = _require_env("PULSAR_URL")
    pytest.importorskip(
        "pulsar",
        reason="pulsar-client not installed — real-Pulsar run gated off")
    from go_streams_spark.sources.pulsar import PulsarClientAdapter
    try:
        adapter = PulsarClientAdapter({"serviceurl": url})
        # reachability probe: producer creation forces a connection
        adapter.publish(f"gss_probe_{uuid.uuid4().hex[:8]}", b"probe")
    except Exception as e:
        pytest.skip(f"cannot reach Pulsar at {url}: {e}")
    yield _Env({"serviceurl": url}, adapter)
    adapter.close()


def test_pulsar_offsets_and_replay(pulsar_env):
    """MessageId offsets via the Reader API: initial earliest, latest
    tail, deterministic range replay, startingOffsets=latest — against
    pulsar-client + a live broker when PULSAR_URL is set. (The adapter's
    last_message_id consumer-probe fallback, flagged 'untested against a
    live broker' in its docstring, is exactly what this exercises.)"""
    env = pulsar_env
    topic = env.unique("gss_it_topic")
    ids = [env.client.publish(topic, f"p{i}".encode(), key=str(i % 2))
           for i in range(5)]
    reader = PulsarStreamReader(env.opts(topic=topic))
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert end == {topic: env.client.last_message_id(topic)}
    [p] = reader.partitions(start, end)
    rows = list(reader.read(p))
    assert [r[1] for r in rows] == [str(i % 2) for i in range(5)]
    assert [r[2] for r in rows] == [f"p{i}".encode() for i in range(5)]
    if ids[0] is not None:  # fake returns ids from publish; real may not
        assert [r[0] for r in rows] == ids
    assert list(reader.read(p)) == rows  # deterministic replay
    # startingOffsets=latest skips history
    tail_reader = PulsarStreamReader(
        env.opts(topic=topic, startingoffsets="latest"))
    tail_start = tail_reader.initialOffset()
    assert env.client.compare_ids(tail_start[topic], end[topic]) == 0


# ---------------------------------------------------------------- Kafka


def test_kafka_roundtrip_real_broker(spark, tmp_path):
    """Kafka end-to-end over the built-in connector when
    KAFKA_BOOTSTRAP points at a live broker (requires the
    spark-sql-kafka package on the cluster classpath — absent from this
    container, so this skips here and runs on any real deployment):
    batch-produce via kafka_sink's format, stream rows back through
    kafka_source into a memory sink, checking the reference's
    ConsumerMessage envelope columns (kafka/kafka_sarama.go:57-136)."""
    bootstrap = _require_env("KAFKA_BOOTSTRAP")
    import time

    from go_streams_spark.streaming.io import kafka_source

    topic = _Env.unique("gss_it")
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], "key string, value string")
    try:
        (df.selectExpr("CAST(key AS BINARY) key", "CAST(value AS BINARY) value")
         .write.format("kafka")
         .option("kafka.bootstrap.servers", bootstrap)
         .option("topic", topic).save())
    except Exception as e:
        pytest.skip(f"kafka connector/broker unavailable at {bootstrap}: {e}")

    name = "kafka_" + uuid.uuid4().hex[:8]
    q = (kafka_source(spark, bootstrap, topic)
         .selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value",
                     "topic", "partition", "offset")
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .outputMode("append").start())
    deadline = time.time() + 90
    while time.time() < deadline and spark.table(name).count() < 3:
        time.sleep(0.5)
    q.stop()
    rows = spark.table(name).collect()
    assert sorted((r["key"], r["value"]) for r in rows) == [
        ("k1", "v1"), ("k2", "v2"), ("k3", "v3")]
    assert all(r["topic"] == topic and r["offset"] >= 0 for r in rows)
