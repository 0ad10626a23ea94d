"""Streaming pipeline with event-time tumbling windows — the analogue of
the reference's tumbling-window flows (flow/tumbling_window.go) on a
file stream, with AvailableNow as the bounded-run trigger.

Run: python examples/streaming_pipeline.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import Source, get_spark
from go_streams_spark.operators import tumbling_window
from go_streams_spark.streaming import file_stream_source, memory_sink


def main():
    spark = get_spark("example-stream")
    d = tempfile.mkdtemp()
    rows = [("2024-01-01 00:00:05", 1.0), ("2024-01-01 00:00:40", 2.0),
            ("2024-01-01 00:01:10", 3.0)]
    (spark.createDataFrame(rows, "ts string, value double")
     .select(F.col("ts").cast("timestamp").alias("ts"), "value")
     .write.mode("overwrite").parquet(d))

    src = file_stream_source(spark, d, fmt="parquet", schema="ts timestamp, value double")
    (Source(src)
     .via(tumbling_window("ts", "1 minute",
                          F.count(F.lit(1)).alias("cnt"),
                          F.sum("value").alias("total"),
                          watermark="10 seconds"))
     .to(memory_sink("windows", output_mode="complete")))
    spark.table("windows").orderBy("window_start").show(truncate=False)

    # custom connector sink (Python Data Source API writer): the
    # XADD/publish skeleton — per-task staging, idempotent per-batch
    # commit (sources/custom.py::ReplayStreamWriter)
    from go_streams_spark.sources.custom import register_replay_source
    fmt = register_replay_source(spark)
    out = os.path.join(d, "published.jsonl")
    q = (spark.readStream.format("parquet")
         .schema("ts timestamp, value double").load(d)
         .selectExpr("CAST(ts AS STRING) AS ts", "CAST(value AS STRING) AS value")
         .writeStream.format(fmt).option("path", out)
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # streaming heavy hitters: bounded-state SpaceSaving top-k over the
    # value stream, landed exactly-once via the batchId-partitioned
    # idempotent parquet sink
    from go_streams_spark.streaming import (
        heavy_hitters_stream, idempotent_parquet_sink)
    hh = heavy_hitters_stream(
        spark.readStream.format("parquet")
        .schema("ts timestamp, value double")
        .option("pathGlobFilter", "*.parquet").load(d)
        .selectExpr("CAST(value AS STRING) AS item"),
        item_col="item", capacity=8, num_buckets=2)
    q2 = Source(hh).to(idempotent_parquet_sink(
        os.path.join(d, "hh_out"), checkpoint=os.path.join(d, "ckpt_hh"),
        available_now=True, output_mode="update"))
    q2.awaitTermination(120)
    # update-mode emissions are CUMULATIVE across micro-batches: earlier
    # batch_id partitions hold stale counter snapshots, so top-k must be
    # ranked over the LAST batch only (heavy_hitters_stream docstring)
    hh_all = spark.read.parquet(os.path.join(d, "hh_out"))
    (hh_all.where(F.col("batch_id")
                  == hh_all.agg(F.max("batch_id")).collect()[0][0])
     .orderBy(F.col("cnt").desc()).show(5))
    print("published lines:", sum(1 for _ in open(out)))


if __name__ == "__main__":
    main()
