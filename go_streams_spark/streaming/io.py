"""Streaming sources and sinks (SURVEY §2.4 mapping).

Reference connectors -> Spark built-ins:
  - FileSource (extension/file.go:25)      -> readStream.text/json/parquet
  - ChanSource (extension/chan.go:17)      -> rate / file stream + availableNow
  - StdoutSink (extension/sink_stdout.go)  -> format("console")
  - IgnoreSink (extension/sink_ignore.go)  -> format("noop")
  - ChanSink (extension/chan.go:41)        -> format("memory") (test sink)
  - Kafka source/sink (kafka/kafka_sarama.go:26,151) -> format("kafka")
  - custom connectors (Redis/NATS/Pulsar/WebSocket/Aerospike) ->
    sources/custom.py (Python Data Source API) or foreach_batch_sink
    bridges.

Bounded pipelines (the entire reference test suite) run with
``Trigger.AvailableNow`` — the final-microbatch flush matches the
reference's flush-on-close semantics (flow/batch.go:98-104).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..api import Sink


def file_stream_source(spark: SparkSession, path: str, fmt: str = "text",
                       schema=None, **options) -> DataFrame:
    """File-based streaming source (line-oriented text matches the
    reference FileSource; json/parquet/csv are the columnar upgrades
    the reference lacks)."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def rate_source(spark: SparkSession, rows_per_second: int = 100, **options) -> DataFrame:
    """Built-in rate source — the test/throughput analogue of ChanSource;
    also the Backpressure-mode Throttler when rows_per_second is the
    quota (flow/throttler.go:160-170)."""
    reader = spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class state_sized_partitions:
    """Context manager sizing STATE partitioning for a stream about to
    start. Stateful operators bake ``spark.sql.shuffle.partitions`` into
    the checkpoint at first batch, and every micro-batch then pays a
    state-store load+commit PER PARTITION PER STORE (a stream-stream
    join keeps 4 stores per partition). Inheriting a batch-sized
    setting (32 here, 200 default) makes small-state streams pure
    commit overhead: the view↔purchase gate query's availableNow wall
    was profiled at 5.4-6.1 s warm with 32 partitions vs 2.0 s with
    4-8, with state of only ~40k rows (round-9 verdict task #4 — the
    2-batch breakdown is recorded in the gate query's docstring).

    Size ``n`` to expected state rows / a few hundred thousand, exactly
    like choosing shuffle partitions for a batch join; at 100 TB you
    RAISE it (state must spread across executors) — the point is that
    it is a deliberate, state-sized choice either way. Restores the
    session setting on exit; batch queries planned outside the block
    are unaffected."""

    def __init__(self, spark: SparkSession, n: int):
        if n < 1:
            raise ValueError(f"state partitions must be >= 1, got {n}")
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def _writer(df: DataFrame, available_now: bool, checkpoint: str | None) -> DataStreamWriter:
    w = df.writeStream
    if available_now:
        w = w.trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def memory_sink(name: str, *, output_mode: str = "append",
                available_now: bool = True, await_termination: bool = True) -> Sink:
    """In-memory table sink (ChanSink analogue, for tests)."""

    def run(df: DataFrame):
        q = (_writer(df, available_now, None)
             .format("memory").queryName(name).outputMode(output_mode).start())
        if await_termination:
            q.awaitTermination()
        return q

    return Sink(run, name=f"memory:{name}")


def console_sink(*, output_mode: str = "append", available_now: bool = True) -> Sink:
    """StdoutSink analogue (extension/sink_stdout.go:31-36)."""
    return Sink(lambda df: _writer(df, available_now, None)
                .format("console").outputMode(output_mode).start(),
                name="console")


def noop_sink(*, output_mode: str = "append", available_now: bool = True) -> Sink:
    """IgnoreSink analogue (extension/sink_ignore.go:25-27)."""
    return Sink(lambda df: _writer(df, available_now, None)
                .format("noop").outputMode(output_mode).start(),
                name="noop")


def foreach_batch_sink(fn: Callable[[DataFrame, int], None], *,
                       checkpoint: str | None = None, output_mode: str = "append",
                       available_now: bool = True,
                       await_termination: bool = True) -> Sink:
    """foreachBatch bridge — the universal custom-sink adapter used for
    every connector without a native Spark writer (Redis XADD
    redis/redis_stream.go:176-210, NATS publish nats/nats_jetstream.go:
    239-275, Aerospike batch-write aerospike/aerospike.go:255-332, ...).
    Exactly-once = idempotent writes keyed by (batchId, row identity)."""

    def run(df: DataFrame):
        q = (_writer(df, available_now, checkpoint)
             .outputMode(output_mode).foreachBatch(fn).start())
        if await_termination:
            q.awaitTermination()
        return q

    return Sink(run, name="foreach_batch")


def with_bounded_retry(fn: Callable[[DataFrame, int], None], *,
                       max_retries: int = 3, backoff_seconds: float = 0.1,
                       on_give_up: Callable[[Exception], None] | None = None,
                       ) -> Callable[[DataFrame, int], None]:
    """FileSink error policy (extension/file.go:126-186): the reference
    wraps every write in a configurable retry function and, when it
    still fails, cancels the SOURCE context and drains the stream.

    This wraps a foreachBatch body the same way: each micro-batch write
    is retried up to ``max_retries`` times with linear backoff; on
    exhaustion the exception propagates, which FAILS the streaming query
    — Spark's equivalent of cancel-upstream (the source stops being
    polled and the checkpoint still marks the batch uncommitted, so a
    restart replays it). ``on_give_up`` is the fatal-error hook (alert,
    dead-letter, ...) invoked before propagation.
    """
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")

    def wrapped(df: DataFrame, batch_id: int):
        import time as _time
        for attempt in range(1, max_retries + 1):
            try:
                fn(df, batch_id)
                return
            except Exception as e:  # noqa: BLE001 - policy wrapper
                if attempt == max_retries:
                    if on_give_up is not None:
                        on_give_up(e)
                    raise
                _time.sleep(backoff_seconds * attempt)

    return wrapped


def kafka_source(spark: SparkSession, bootstrap_servers: str, subscribe: str,
                 starting_offsets: str = "earliest", *,
                 format: str = "kafka", **options) -> DataFrame:
    """Kafka consumer source (kafka/kafka_sarama.go:26,57-136): offsets
    ride in the checkpoint (the MarkMessage analogue); output columns
    key/value/topic/partition/offset/timestamp mirror the reference's
    ConsumerMessage envelope. Requires the spark-sql-kafka package on
    the cluster.

    ``format`` is the one test seam: Spark reserves the provider name
    "kafka" even when the package is absent, so the file-backed fake
    (testing/fake_kafka.py, same envelope/offset surface) registers
    under its own name and the end-to-end test injects it here — every
    other line of this wrapper executes unchanged."""
    reader = (spark.readStream.format(format)
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", subscribe)
              .option("startingOffsets", starting_offsets))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_sink(bootstrap_servers: str, topic: str, *, checkpoint: str,
               available_now: bool = False, format: str = "kafka",
               **options) -> Sink:
    """Kafka producer sink (kafka/kafka_sarama.go:151,174-209): expects
    key/value columns. ``format`` is the same test seam as
    ``kafka_source``'s."""

    def run(df: DataFrame):
        w = (_writer(df, available_now, checkpoint)
             .format(format)
             .option("kafka.bootstrap.servers", bootstrap_servers)
             .option("topic", topic))
        for k, v in options.items():
            w = w.option(k, v)
        return w.start()

    return Sink(run, name=f"kafka:{topic}")


def with_refreshed_dim(dim_loader, on, fn, *, how: str = "left",
                       broadcast: bool = True):
    """Slowly-changing-dimension enrichment for streams: wrap a
    foreachBatch function so each micro-batch joins a FRESHLY LOADED
    dimension (``dim_loader()`` runs per batch, e.g.
    ``lambda: spark.read.parquet(dim_path)``).

    Why not a plain stream-static join: Spark analyzes the static side
    ONCE, so a dimension overwritten mid-query either goes stale or
    kills the stream with FileNotFound when the old files vanish
    (observed on Spark 4.1; pinned by
    test_stream_static_dim_refresh_via_foreach_batch). Re-reading inside
    foreachBatch is the standard fix — the dim is re-planned per batch
    and broadcast-joined (dimension-sized, never stream-sized).
    """
    def wrapped(df: DataFrame, batch_id: int):
        dim = dim_loader()
        if broadcast:
            dim = F.broadcast(dim)
        fn(df.join(dim, on, how), batch_id)

    return wrapped


def idempotent_parquet_sink(path: str, *, checkpoint: str,
                            available_now: bool = False,
                            output_mode: str = "append") -> Sink:
    """Exactly-once parquet sink: each micro-batch lands in its own
    ``batch_id=N`` partition via DYNAMIC partition overwrite, so a
    replayed batch (restart after a crash between write and commit)
    overwrites itself instead of duplicating — the standard
    batchId-idempotence recipe made concrete for files. Readers get
    exactly-once by reading the directory; the batch_id column is
    dropped on read or used for incremental consumption."""

    def run(df: DataFrame):
        def write_batch(batch_df: DataFrame, batch_id: int):
            (batch_df.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(path))

        return (_writer(df, available_now, checkpoint)
                .outputMode(output_mode)
                .foreachBatch(write_batch).start())

    return Sink(run, name=f"idempotent_parquet:{path}")


_FP_PRIME = 2305843009213693951   # 2^61 - 1, the corpus-fingerprint modulus


def incremental_fingerprint_sink(path: str, *, checkpoint: str,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 source_col: str = "source",
                                 available_now: bool = False) -> Sink:
    """Streaming maintenance of the corpus content fingerprint
    (queries.corpus_content_fingerprint): every micro-batch reduces to
    (source, n_docs, fp_partial) — the 60-bit per-row content hashes
    summed mod 2^61-1 — and lands in its own ``batch_id=N`` partition
    via dynamic overwrite, so a replayed batch overwrites itself
    (exactly-once without a transaction log). Because the digest is
    COMMUTATIVE, the current corpus fingerprint is just the mod-sum of
    the partials — ``read_corpus_fingerprint`` — and always equals the
    batch query over the same rows; incremental-view maintenance falls
    out of the algebra. State per batch is source-grain (bounded)."""

    def run(df: DataFrame):
        def write_batch(batch_df: DataFrame, batch_id: int):
            h = F.conv(F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"),
                               F.md5(text_col))), 1, 15), 16, 10) \
                .cast("long")
            part = (batch_df
                    .groupBy(F.col(source_col).alias("source"))
                    .agg(F.count(F.lit(1)).alias("n_docs"),
                         (F.sum(h.cast("decimal(38,0)"))
                          % F.lit(_FP_PRIME).cast("decimal(38,0)"))
                         .cast("long").alias("fp_partial")))
            (part.withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id")
             .parquet(path))

        return (_writer(df, available_now, checkpoint)
                .outputMode("append")
                .foreachBatch(write_batch).start())

    return Sink(run, name=f"incremental_fingerprint:{path}")


def read_corpus_fingerprint(spark, path: str) -> DataFrame:
    """Merge the partials written by ``incremental_fingerprint_sink``
    into the current per-source (n_docs, fingerprint) — identical to
    running corpus_content_fingerprint's aggregation over all rows
    ever ingested (commutative mod-sum, so batch boundaries are
    invisible)."""
    return (spark.read.parquet(path)
            .groupBy("source")
            .agg(F.sum("n_docs").alias("n_docs"),
                 (F.sum(F.col("fp_partial").cast("decimal(38,0)"))
                  % F.lit(_FP_PRIME).cast("decimal(38,0)"))
                 .cast("long").alias("fingerprint")))
