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
topic, each an append-only ``log.jsonl`` whose line number IS the
Kafka offset (single partition 0). Appends are flock-guarded so driver
and executor workers see one log. The reader records the options Spark
delivered to ``reader_options.json`` so tests can assert the wrapper's
plumbing arrived intact.
"""

from __future__ import annotations

import fcntl
import json
import os
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


def _log_path(options: dict, *, write: bool) -> str:
    return os.path.join(_topic_dir(options, write=write), "log.jsonl")


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
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class FakeKafkaStreamReader(DataSourceStreamReader):
    """Offsets are ``{"offset": next_line}`` — the line count of the
    topic log; ``startingOffsets=latest`` skips history exactly like
    the real connector."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.topic = self.options.get("subscribe")
        self.path = _log_path(self.options, write=False)
        with open(os.path.join(_topic_dir(self.options, write=False),
                               "reader_options.json"), "w") as f:
            json.dump(self.options, f)

    def initialOffset(self) -> dict:
        if self.options.get("startingoffsets", "latest") == "latest":
            return {"offset": len(_read_log(self.path))}
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": len(_read_log(self.path))}

    def partitions(self, start: dict, end: dict):
        return [_OffsetRange(start["offset"], end["offset"])]

    def read(self, partition: _OffsetRange):
        recs = _read_log(self.path)
        for off in range(partition.start, partition.end):
            r = recs[off]
            yield (bytes.fromhex(r["key"]) if r["key"] is not None else None,
                   bytes.fromhex(r["value"]) if r["value"] is not None
                   else None,
                   self.topic, 0, off,
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


class FakeKafkaBatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator) -> _Commit:
        return _Commit(_encode_rows(iterator))

    def commit(self, messages) -> None:
        now = datetime.now(tz=timezone.utc).timestamp()
        _append_log(_log_path(self.options, write=True),
                    [{"key": k, "value": v, "ts": now}
                     for m in messages for k, v in m.rows])


class FakeKafkaStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator) -> _Commit:
        return _Commit(_encode_rows(iterator))

    def commit(self, messages, batchId) -> None:
        now = datetime.now(tz=timezone.utc).timestamp()
        _append_log(_log_path(self.options, write=True),
                    [{"key": k, "value": v, "ts": now}
                     for m in messages for k, v in m.rows])


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
