"""File-backed fake of the KAFKA CONNECTOR surface — a Python Data
Source registered as ``gss_fake_kafka`` (Spark reserves the provider name
"kafka" even with the package absent) and injected through the
wrappers' ``format=`` test seam, so the real wrapper code in
``streaming/io.py::kafka_source`` / ``kafka_sink`` executes end to end
— format resolution, option plumbing, the ConsumerMessage envelope
schema, micro-batch offset ranges, and checkpoint-restart replay (the
``MarkMessage`` = checkpoint-commit analogue of
``kafka/kafka_sarama.go:128``) — without a broker or the
spark-sql-kafka package.

The "broker" is a directory
(``kafka.bootstrap.servers`` option = path), one subdirectory per
topic. Topics are MULTI-PARTITION like the real thing (the reference
consumes via a consumer group over all partitions,
``kafka/kafka_sarama.go:57-136``): ``num.partitions`` at produce time
(default 1) fixes the partition count in ``meta.json``; each partition
is an append-only ``log-<p>.jsonl`` whose line number IS that
partition's Kafka offset, and keyed records route by key-hash %
partitions (Kafka's default keyed partitioner, crc32 standing in for
murmur2 — deterministic, same-key-same-partition, which is the
property the tests pin). Streaming offsets are per-partition
(``{"offsets": {"0": n0, "1": n1, ...}}``) exactly like the built-in
connector's, so checkpoint-restart replays each partition from its own
committed position. Appends are flock-guarded so driver and executor
workers see one log. The reader records the options Spark delivered to
``reader_options.json`` so tests can assert the wrapper's plumbing
arrived intact.
"""

from __future__ import annotations

import fcntl
import json
import os
import zlib
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FAKE_KAFKA_FORMAT = "gss_fake_kafka"

#: the built-in connector's ConsumerMessage envelope, column for column
KAFKA_SCHEMA = ("key binary, value binary, topic string, partition int, "
                "offset long, timestamp timestamp, timestampType int")


def _topic_dir(options: dict, *, write: bool) -> str:
    boot = options.get("kafka.bootstrap.servers")
    topic = options.get("topic") if write else options.get("subscribe")
    if not boot:
        raise ValueError("fake kafka: kafka.bootstrap.servers (a local "
                         "directory) is required")
    if not topic:
        raise ValueError("fake kafka: %s is required"
                         % ("topic" if write else "subscribe"))
    d = os.path.join(boot, topic)
    os.makedirs(d, exist_ok=True)
    return d


def _n_partitions(topic_dir: str, options: dict | None = None) -> int:
    """Partition count: fixed at first produce (``num.partitions``
    option, default 1) and persisted in meta.json — growing a topic's
    partition count is out of scope, as it mostly is in production."""
    meta = os.path.join(topic_dir, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return int(json.load(f)["partitions"])
    n = int((options or {}).get("num.partitions", "1"))
    if n < 1:
        raise ValueError(f"fake kafka: num.partitions must be >= 1, got {n}")
    with open(meta, "w") as f:
        json.dump({"partitions": n}, f)
    return n


def _log_path(topic_dir: str, partition: int) -> str:
    return os.path.join(topic_dir, f"log-{partition}.jsonl")


def _route(key_hex: str | None, n: int) -> int:
    """Keyed records stick to one partition (crc32 % n — the
    deterministic stand-in for Kafka's murmur2 default partitioner);
    unkeyed records go to partition 0 (a fake's stand-in for sticky
    round-robin, kept deterministic so replay tests can assert exact
    offsets)."""
    if n == 1 or key_hex is None:
        return 0
    return zlib.crc32(bytes.fromhex(key_hex)) % n


def _read_log(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_log(path: str, records: list[dict]) -> None:
    with open(path, "a") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        for r in records:
            f.write(json.dumps(r) + "\n")
        f.flush()
        fcntl.flock(f, fcntl.LOCK_UN)


class _OffsetRange(InputPartition):
    def __init__(self, partition: int, start: int, end: int):
        self.partition, self.start, self.end = partition, start, end


class FakeKafkaStreamReader(DataSourceStreamReader):
    """Offsets are ``{"offsets": {"<p>": next_line}}`` — per-partition
    line counts of the topic logs, the same shape as the built-in
    connector's per-TopicPartition offsets; ``startingOffsets=latest``
    skips history exactly like the real connector."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.topic = self.options.get("subscribe")
        self.dir = _topic_dir(self.options, write=False)
        self.n = _n_partitions(self.dir)
        with open(os.path.join(self.dir, "reader_options.json"), "w") as f:
            json.dump(self.options, f)

    def _counts(self) -> dict[str, int]:
        return {str(p): len(_read_log(_log_path(self.dir, p)))
                for p in range(self.n)}

    def initialOffset(self) -> dict:
        if self.options.get("startingoffsets", "latest") == "latest":
            return {"offsets": self._counts()}
        return {"offsets": {str(p): 0 for p in range(self.n)}}

    def latestOffset(self) -> dict:
        return {"offsets": self._counts()}

    def partitions(self, start: dict, end: dict):
        # one Spark input partition per Kafka partition with new data —
        # the built-in connector's planning, which is what makes an
        # N-partition topic read N-way parallel
        out = []
        for p in range(self.n):
            s = start["offsets"].get(str(p), 0)
            e = end["offsets"].get(str(p), s)
            if e > s:
                out.append(_OffsetRange(p, s, e))
        return out

    def read(self, partition: _OffsetRange):
        recs = _read_log(_log_path(self.dir, partition.partition))
        for off in range(partition.start, partition.end):
            r = recs[off]
            yield (bytes.fromhex(r["key"]) if r["key"] is not None else None,
                   bytes.fromhex(r["value"]) if r["value"] is not None
                   else None,
                   self.topic, partition.partition, off,
                   datetime.fromtimestamp(r["ts"], tz=timezone.utc), 1)

    def commit(self, end: dict) -> None:
        pass  # durable position is the checkpoint, as with the real one


def _encode_rows(iterator) -> list[list]:
    rows = []
    for row in iterator:
        key = getattr(row, "key", None)
        val = getattr(row, "value", None)
        if isinstance(key, str):
            key = key.encode()
        if isinstance(val, str):
            val = val.encode()
        rows.append([bytes(key).hex() if key is not None else None,
                     bytes(val).hex() if val is not None else None])
    return rows


class _Commit(WriterCommitMessage):
    def __init__(self, rows: list):
        self.rows = rows


def _commit_rows(options: dict, messages) -> None:
    d = _topic_dir(options, write=True)
    n = _n_partitions(d, options)
    now = datetime.now(tz=timezone.utc).timestamp()
    by_part: dict[int, list[dict]] = {}
    for m in messages:
        for k, v in m.rows:
            by_part.setdefault(_route(k, n), []).append(
                {"key": k, "value": v, "ts": now})
    for p, recs in sorted(by_part.items()):
        _append_log(_log_path(d, p), recs)


class FakeKafkaBatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator) -> _Commit:
        return _Commit(_encode_rows(iterator))

    def commit(self, messages) -> None:
        _commit_rows(self.options, messages)


class FakeKafkaStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator) -> _Commit:
        return _Commit(_encode_rows(iterator))

    def commit(self, messages, batchId) -> None:
        _commit_rows(self.options, messages)


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls):
        return FAKE_KAFKA_FORMAT

    def schema(self):
        return KAFKA_SCHEMA

    def streamReader(self, schema):
        return FakeKafkaStreamReader(self.options)

    def writer(self, schema, overwrite):
        if overwrite:
            raise ValueError("kafka topics are append-only")
        return FakeKafkaBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return FakeKafkaStreamWriter(self.options)


def register_fake_kafka(spark) -> str:
    """Register the fake and return its format name — pass it to the
    kafka wrappers' ``format=`` seam."""
    spark.dataSource.register(FakeKafkaDataSource)
    return FAKE_KAFKA_FORMAT
