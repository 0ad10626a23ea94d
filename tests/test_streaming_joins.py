"""Stream-stream join (watermarked, time-bounded) and the Throttler
Backpressure contract on the custom source."""

import json
import os
import time
import uuid

from pyspark.sql import functions as F

from go_streams_spark.sources import register_replay_source


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Two streams joined with watermarks + a time-range condition — the
    streaming analogue of interval_join. State on both sides is bounded
    by the watermark (Spark evicts rows outside the join window)."""
    d = str(tmp_path)
    clicks_dir, buys_dir = os.path.join(d, "clicks"), os.path.join(d, "buys")
    spark.createDataFrame(
        [("2024-01-01 00:00:10", 1), ("2024-01-01 00:05:00", 2)],
        "ts string, user int") \
        .select(F.col("ts").cast("timestamp").alias("c_ts"), "user") \
        .coalesce(1).write.parquet(clicks_dir)
    spark.createDataFrame(
        [("2024-01-01 00:00:30", 1, 9.0),   # 20s after user 1's click -> match
         ("2024-01-01 00:20:00", 2, 5.0)],  # 15min after user 2's click -> no match
        "ts string, user int, amount double") \
        .select(F.col("ts").cast("timestamp").alias("b_ts"), "user", "amount") \
        .coalesce(1).write.parquet(buys_dir)

    clicks = (spark.readStream.schema("c_ts timestamp, user int").parquet(clicks_dir)
              .withWatermark("c_ts", "10 seconds"))
    buys = (spark.readStream.schema("b_ts timestamp, user int, amount double")
            .parquet(buys_dir).withWatermark("b_ts", "10 seconds"))
    joined = clicks.join(
        buys,
        (clicks.user == buys.user)
        & (buys.b_ts >= clicks.c_ts)
        & (buys.b_ts <= clicks.c_ts + F.expr("interval 1 minute")))
    name = "ssj_" + uuid.uuid4().hex[:8]
    q = (joined.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)
    rows = [(r["user"], r["amount"]) for r in spark.table(name).collect()]
    assert rows == [(1, 9.0)]  # only the within-a-minute purchase joins


def test_replay_source_backpressure_contract(spark, tmp_path):
    """Throttler Backpressure (flow/throttler.go:160-170) == per-batch
    admission cap: no micro-batch ever exceeds rowsPerBatch."""
    path = str(tmp_path / "rows.jsonl")
    with open(path, "w") as f:
        for i in range(12):
            f.write(json.dumps({"id": i}) + "\n")
    fmt = register_replay_source(spark)
    name = "bp_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format(fmt)
         .option("path", path).option("ddl", "id int")
         .option("rowsPerBatch", "5").load()
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 12:
        time.sleep(1)
    sizes = {}
    for p in q.recentProgress:
        sizes[p["batchId"]] = max(sizes.get(p["batchId"], 0), p["numInputRows"])
    q.stop()
    assert spark.table(name).count() == 12
    assert all(n <= 5 for n in sizes.values())  # quota never exceeded
    assert sorted(sizes.values(), reverse=True)[:2] == [5, 5]  # and actually used


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join — the dimension-enrichment pattern: a streaming
    fact joins a static (broadcastable) dimension with NO streaming state
    at all (each micro-batch joins the static side independently; on a
    cluster the dim is a broadcast per batch)."""
    d = str(tmp_path)
    facts_dir = os.path.join(d, "facts")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "nation_key int, amount double") \
        .coalesce(1).write.parquet(facts_dir)
    dim = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2")], "n_key int, n_name string")
    facts = spark.readStream.schema("nation_key int, amount double").parquet(facts_dir)
    enriched = (facts.join(F.broadcast(dim),
                           facts.nation_key == dim.n_key, "left")
                .select("nation_key", "amount",
                        F.coalesce("n_name", F.lit("UNKNOWN")).alias("n_name")))
    name = "sse_" + uuid.uuid4().hex[:8]
    q = (enriched.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)
    rows = {(r["nation_key"], r["n_name"]) for r in spark.table(name).collect()}
    assert rows == {(1, "NATION_1"), (2, "NATION_2"), (3, "UNKNOWN")}


def test_stream_static_dim_refresh_via_foreach_batch(spark, tmp_path):
    """Slowly-changing dimension: a plain stream-static join pins the
    dim at analysis time, so with_refreshed_dim re-reads it inside
    foreachBatch — batch 0 must see the OLD dim row and batch 1 the
    overwritten NEW one, with the query surviving the overwrite."""
    import time as _t

    from go_streams_spark.streaming import with_refreshed_dim
    d = str(tmp_path)
    facts_dir = os.path.join(d, "facts")
    dim_dir = os.path.join(d, "dim")
    spark.createDataFrame([(1, "OLD")], "k int, v string") \
        .coalesce(1).write.parquet(dim_dir)
    spark.createDataFrame([(1, 1.0)], "k int, a double") \
        .coalesce(1).write.mode("append").parquet(facts_dir)
    facts = (spark.readStream.schema("k int, a double")
             .option("maxFilesPerTrigger", 1).parquet(facts_dir))
    got = {}
    q = (facts.writeStream
         .foreachBatch(with_refreshed_dim(
             lambda: spark.read.parquet(dim_dir), "k",
             lambda df, bid: got.__setitem__(
                 bid, [(r["k"], r["a"], r["v"])
                       for r in df.select("k", "a", "v").collect()])))
         .option("checkpointLocation", os.path.join(d, "cp")).start())
    deadline = _t.time() + 60
    while _t.time() < deadline and 0 not in got:
        _t.sleep(0.5)
    spark.createDataFrame([(1, "NEW")], "k int, v string") \
        .coalesce(1).write.mode("overwrite").parquet(dim_dir)
    spark.createDataFrame([(1, 2.0)], "k int, a double") \
        .coalesce(1).write.mode("append").parquet(facts_dir)
    deadline = _t.time() + 60
    while _t.time() < deadline and len(got) < 2:
        _t.sleep(0.5)
    assert q.exception() is None
    q.stop()
    assert got[0] == [(1, 1.0, "OLD")]
    assert got[1] == [(1, 2.0, "NEW")]
