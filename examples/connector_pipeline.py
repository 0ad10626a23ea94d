"""Broker-to-broker streaming pipeline through the custom connectors:
Redis Stream source -> transform -> NATS JetStream sink, running
locally against the file-backed broker fakes (swap the clientFactory
options for real host/port settings to run against live brokers).

Mirrors the reference's connector-to-connector wiring
(redis/redis_stream.go source + nats/nats_jetstream.go sink) with
Spark semantics: stream-entry-id offsets, checkpointed exactly-once on
the read side, at-least-once publish on the write side.

Run: python examples/connector_pipeline.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.sources import register_nats_source, register_redis_sources
from go_streams_spark.testing import FakeJetStream, FakeRedis


def main():
    spark = get_spark("example-connectors")
    d = tempfile.mkdtemp()
    redis_path = os.path.join(d, "redis.json")
    nats_path = os.path.join(d, "nats.json")

    # seed the "redis" stream with events
    r = FakeRedis(redis_path)
    for i in range(10):
        r.xadd("clicks", {"user": f"u{i % 3}", "n": str(i)})
    js = FakeJetStream(nats_path)
    js.add_stream("OUT", ["out.>"])

    redis_fmt, _ = register_redis_sources(spark)
    nats_fmt = register_nats_source(spark)

    stream = (spark.readStream.format(redis_fmt)
              .option("clientFactory",
                      "go_streams_spark.testing.fake_redis:fake_redis_factory")
              .option("fakePath", redis_path)
              .option("stream", "clicks").option("group", "pipeline")
              .option("maxEntriesPerTrigger", "4")
              .load())

    # transform: flatten the field map, tag the subject per user
    out = stream.select(
        F.concat(F.lit("out."), F.col("values")["user"]).alias("subject"),
        F.to_json(F.col("values")).alias("data"))

    q = (out.writeStream.format(nats_fmt)
         .option("clientFactory",
                 "go_streams_spark.testing.fake_nats:fake_nats_factory")
         .option("fakePath", nats_path)
         .option("stream", "OUT")
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .start())
    deadline = time.time() + 60
    while time.time() < deadline and js.last_sequence("OUT") < 10:
        time.sleep(0.5)
    q.stop()

    print(f"published {js.last_sequence('OUT')} messages to JetStream:")
    for seq, subject, data in js.fetch_range("OUT", 0, 5):
        print(f"  seq={seq} subject={subject} data={data.decode()}")
    # (no explicit spark.stop(): process exit cleans up, and a shared
    # getOrCreate session must survive when examples run inside a harness)


if __name__ == "__main__":
    main()
