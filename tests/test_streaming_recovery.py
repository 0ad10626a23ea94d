"""Fault-tolerance evidence the reference cannot give: checkpointed
state survives a query restart (exactly-once input consumption +
recovered aggregation state), and the same stateful plan runs on the
RocksDB state store provider — the disk-backed store a 100 TB cluster
uses when keyed state exceeds executor heap. The reference's state
lives in goroutine-local variables and dies with the process
(e.g. flow/tumbling_window.go buffers); go-streams has no restart
story at all.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F


def _mem():
    return "t" + uuid.uuid4().hex[:10]


def _run_counts(spark, src_dir, cp_dir, provider=None):
    """Start the counts-per-key query against src_dir with checkpoint
    cp_dir, drain with AvailableNow, return {key: count}."""
    stream = spark.readStream.schema("k string, v int").json(src_dir)
    counts = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    name = _mem()
    w = (counts.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", cp_dir)
         .trigger(availableNow=True))
    q = w.start()
    q.awaitTermination(120)
    return {r["k"]: r["n"] for r in spark.table(name).collect()}


def _write_json(spark, path, rows):
    spark.createDataFrame(rows, "k string, v int").coalesce(1) \
        .write.mode("append").json(path)


def test_checkpoint_recovery_restores_state(spark, tmp_path):
    """Restart the same stateful query from its checkpoint: the second
    run must (a) NOT reprocess already-committed input and (b) resume
    with the aggregation state of the first run — counts are cumulative
    across the restart boundary."""
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    _write_json(spark, src, [("a", 1), ("a", 2), ("b", 3)])
    first = _run_counts(spark, src, cp)
    assert first == {"a": 2, "b": 1}

    # simulate a crash/redeploy: new query object, same checkpoint
    _write_json(spark, src, [("a", 4), ("c", 5)])
    second = _run_counts(spark, src, cp)
    # 'a' continues from recovered state (2+1), 'b' survives untouched,
    # 'c' is new — and nothing was double-counted
    assert second == {"a": 3, "b": 1, "c": 1}


def test_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """A restart with no new input runs ZERO batches — AvailableNow
    consults the checkpoint, sees every file already committed, and
    terminates without emitting (the memory sink stays empty). This is
    the exactly-once half of recovery: committed input is never
    replayed through the pipeline."""
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    _write_json(spark, src, [("x", 1), ("y", 2), ("y", 3)])
    assert _run_counts(spark, src, cp) == {"x": 1, "y": 2}
    assert _run_counts(spark, src, cp) == {}


def test_rocksdb_state_store_provider(spark, tmp_path):
    """The identical stateful plan on the RocksDB state store — keyed
    state spills to local disk instead of living on-heap, which is the
    config a large cluster runs with (state >> executor memory). Also
    exercises recovery on that provider."""
    provider = ("org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider")
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        src = str(tmp_path / "src")
        cp = str(tmp_path / "cp")
        _write_json(spark, src, [("a", 1), ("b", 2), ("a", 3)])
        assert _run_counts(spark, src, cp) == {"a": 2, "b": 1}
        _write_json(spark, src, [("b", 4)])
        assert _run_counts(spark, src, cp) == {"a": 2, "b": 2}
        # the checkpoint must actually contain RocksDB-format state files
        found = []
        for root, _dirs, files in os.walk(cp):
            found.extend(f for f in files if f.endswith(".zip") or f.endswith(".sst"))
        assert found, "no RocksDB snapshot/changelog files under checkpoint"
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_transform_with_state_running_sum(spark, tmp_path):
    """The transformWithStateInPandas path (Spark 4 arbitrary-state API)
    carries a named ValueState across micro-batches: with
    maxFilesPerTrigger=1 each input file is its own batch, so the final
    Update-mode emission per key must equal the sum over ALL batches.

    The state-server protocol needs google.protobuf, which is not baked
    into this container — skipped here, runs on any real cluster image.
    """
    pytest.importorskip("google.protobuf.descriptor")
    from go_streams_spark.streaming import running_sum_stream_tws

    provider = ("org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider")
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        src = str(tmp_path / "src")
        _write_json(spark, src, [("a", 1), ("b", 10)])
        _write_json(spark, src, [("a", 2), ("b", 20), ("c", 5)])
        stream = (spark.readStream.schema("k string, v int")
                  .option("maxFilesPerTrigger", 1).json(src))
        out = running_sum_stream_tws(
            stream.select("k", F.col("v").cast("double").alias("v")),
            key_col="k", value_col="v")
        name = _mem()
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "cp"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.table(name).collect()
        # last emission per key is the cross-batch running total
        final = {}
        for r in rows:
            final[r["k"]] = r["total"]
        assert final == {"a": 3.0, "b": 30.0, "c": 5.0}
        # and at least one key was emitted more than once (state carried
        # across >1 micro-batch, not a single-batch degenerate run)
        assert len(rows) > len(final)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_idempotent_parquet_sink_replay_safe(spark, tmp_path):
    """The batchId-partitioned parquet sink is replay-idempotent: a
    batch written twice (simulating the crash-between-write-and-commit
    replay) overwrites its own partition, and the directory holds
    exactly-once data across a query restart."""
    from go_streams_spark.api import Source
    from go_streams_spark.streaming import idempotent_parquet_sink
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "cp")
    _write_json(spark, src, [("a", 1), ("b", 2)])
    stream = spark.readStream.schema("k string, v int").json(src)
    sink = idempotent_parquet_sink(out, checkpoint=ckpt, available_now=True)
    q = Source(stream).to(sink)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    assert {(r["k"], r["v"]) for r in first.collect()} == {("a", 1), ("b", 2)}

    # restart with more input: new batch lands in its own partition
    _write_json(spark, src, [("c", 3)])
    q2 = Source(spark.readStream.schema("k string, v int").json(src)).to(
        idempotent_parquet_sink(out, checkpoint=ckpt, available_now=True))
    q2.awaitTermination(120)
    # simulate a REPLAY of the last batch: rewrite batch_id=1 directly
    bdf = spark.createDataFrame([("c", 3)], "k string, v int")
    from pyspark.sql import functions as F
    (bdf.withColumn("batch_id", F.lit(1))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(out))
    final = spark.read.parquet(out)
    assert sorted((r["k"], r["v"]) for r in final.collect()) == [
        ("a", 1), ("b", 2), ("c", 3)]  # no duplicates after replay


def _rocksdb(spark):
    """Context manager: force the RocksDB state store provider (required
    by transformWithStateInPandas), restoring the prior provider."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        provider = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        spark.conf.set(key, provider)
        try:
            yield
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
    return cm()


def _final_hh_state(by_batch: dict) -> dict:
    """Reconstruct final per-(bucket, item) counters from update-mode
    emissions: each invocation emits a bucket's FULL tracked set, so a
    bucket's rows in the LAST batch that touched it supersede earlier
    emissions wholesale."""
    final = {}
    for bid in sorted(by_batch):
        per_bucket_rows = {}
        for r in by_batch[bid]:
            per_bucket_rows.setdefault(r["bucket"], []).append(r)
        for b, rows in per_bucket_rows.items():
            final = {k: v for k, v in final.items() if k[0] != b}
            for r in rows:
                final[(b, r["item"])] = (r["cnt"], r["err"])
    return final


def test_tws_heavy_hitters_parity(spark, tmp_path):
    """heavy_hitters_stream_tws (transformWithStateInPandas) must emit
    counters BIT-IDENTICAL to the legacy applyInPandasWithState operator
    on the same multi-batch skewed stream — same bucket sharding, same
    shared SpaceSaving kernel, different state protocol. Skipped where
    google.protobuf (the tws state-server dependency) is absent."""
    pytest.importorskip("google.protobuf.descriptor")
    from go_streams_spark.streaming import (
        heavy_hitters_stream, heavy_hitters_stream_tws)

    src = str(tmp_path / "src")
    for b in range(3):
        items = []
        for h in range(3):
            items += [f"h{h}"] * (40 - 10 * h)
        items += [f"t{b}_{j}" for j in range(30)]
        spark.createDataFrame([(x,) for x in items], "item string") \
            .coalesce(1).write.mode("append").parquet(src)

    def run(op, cp, **kw):
        stream = (spark.readStream.schema("item string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = op(stream, item_col="item", capacity=8, num_buckets=4, **kw)
        by_batch: dict[int, list] = {}
        q = (out.writeStream
             .foreachBatch(lambda df, bid: by_batch.__setitem__(
                 bid, df.collect()))
             .outputMode("update")
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return _final_hh_state(by_batch)

    legacy = run(heavy_hitters_stream, str(tmp_path / "cp_legacy"))
    with _rocksdb(spark):
        tws = run(heavy_hitters_stream_tws, str(tmp_path / "cp_tws"))
    assert tws == legacy
    assert len(tws) > 0


def test_tws_count_or_time_batch_flushes(spark, tmp_path):
    """count_or_time_batch_stream_tws: size-flushes from
    handleInputRows, residual flushed by a REAL tws timer
    (registerTimer -> handleExpiredTimer) — the same emissions the
    legacy operator produces for this input (3 size-batches of 3 plus a
    1-element time-batch covering all 10 values). Skipped without
    google.protobuf."""
    import time

    pytest.importorskip("google.protobuf.descriptor")
    from go_streams_spark.streaming import count_or_time_batch_stream_tws

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, float(i)) for i in range(10)],
                          "k int, value double") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("k int, value double").parquet(src))
    out = count_or_time_batch_stream_tws(
        stream, key_cols=["k"], value_col="value", max_size=3,
        interval_ms=3000,
        output_schema="k int, batch array<double>, batch_size int, reason string")
    name = _mem()
    with _rocksdb(spark):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "cp"))
             .start())
        deadline = time.time() + 90
        while time.time() < deadline and spark.table(name).count() < 4:
            time.sleep(1)
        q.stop()
    got = spark.table(name).collect()
    assert len(got) == 4
    sizes = sorted((r["batch_size"], r["reason"]) for r in got)
    assert sizes == [(1, "time"), (3, "size"), (3, "size"), (3, "size")]
    flat = sorted(v for r in got for v in r["batch"])
    assert flat == [float(i) for i in range(10)]


def test_incremental_fingerprint_matches_batch_and_replays_safely(spark, tmp_path):
    """The streamed fingerprint equals the batch corpus fingerprint
    over the same rows, and a simulated batch replay (same batch_id)
    leaves it unchanged — additive partials + dynamic overwrite."""
    import uuid as _uuid

    from go_streams_spark.streaming.io import (
        incremental_fingerprint_sink, read_corpus_fingerprint, _FP_PRIME)

    src = str(tmp_path / "docs")
    state = str(tmp_path / "fp")
    b1 = [(1, "alpha text", "s1"), (2, "beta text", "s2")]
    b2 = [(3, "gamma text", "s1"), (4, "delta text", "s1")]
    for b in (b1, b2):
        spark.createDataFrame(b, "doc_id long, text string, source string") \
            .coalesce(1).write.mode("append").json(src)

    stream = (spark.readStream.schema("doc_id long, text string, source string")
              .option("maxFilesPerTrigger", 1).json(src))
    sink = incremental_fingerprint_sink(
        state, checkpoint=str(tmp_path / "cp"), available_now=True)
    q = sink(stream)
    q.awaitTermination(120)

    got = {r["source"]: (r["n_docs"], r["fingerprint"])
           for r in read_corpus_fingerprint(spark, state).collect()}

    allrows = spark.createDataFrame(
        b1 + b2, "doc_id long, text string, source string")
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                       F.md5("text"))), 1, 15), 16, 10).cast("long")
    want = {r["source"]: (r["n_docs"], r["fingerprint"])
            for r in allrows.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum(h.cast("decimal(38,0)"))
                  % F.lit(_FP_PRIME).cast("decimal(38,0)"))
                 .cast("long").alias("fingerprint")).collect()}
    assert got == want and set(got) == {"s1", "s2"}

    # simulated replay: rewrite batch 0's partial with the same payload
    batch0 = spark.createDataFrame(b1, "doc_id long, text string, source string")
    part = (batch0.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum(h.cast("decimal(38,0)"))
                  % F.lit(_FP_PRIME).cast("decimal(38,0)"))
                 .cast("long").alias("fp_partial"))
            .withColumn("batch_id", F.lit(0)))
    (part.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(state))
    again = {r["source"]: (r["n_docs"], r["fingerprint"])
             for r in read_corpus_fingerprint(spark, state).collect()}
    assert again == want


def test_cep_stream_checkpoint_recovery_exactly_once(spark, tmp_path):
    """cep_stream across a crash/redeploy: run bounded, add a later
    event file, restart a NEW query object on the SAME checkpoint. The
    open-session buffer must survive the restart (the pre-crash session
    closes by gap-break against post-crash events and emits with its
    full pre-crash sequence), and no closed session is ever emitted
    twice (append-mode exactly-once over the union of both runs)."""
    import datetime as dt
    from pyspark.sql import functions as F
    from go_streams_spark.streaming import file_stream_source
    from go_streams_spark.streaming.stateful import cep_stream

    SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string")
    base = dt.datetime(2024, 1, 1, 8)

    def ev(uid, minute, etype, eid):
        return (eid, base + dt.timedelta(minutes=minute), uid, etype)

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    seen = []

    def run_once(batch):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = file_stream_source(spark, src, fmt="parquet",
                                    schema=SCHEMA)
        # memory sinks cannot recover from a checkpoint; a parquet sink
        # is the real exactly-once surface anyway
        q = (cep_stream(stream, pattern="v[^p]*c[^p]*p",
                        symbols={"view": "v", "click": "c",
                                 "purchase": "p"},
                        gap_seconds=1800, close_on_timeout=False)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        new = {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"])
               for r in rows}
        delta = {k: v for k, v in new.items() if k not in seen}
        # exactly-once: nothing already emitted may appear again with
        # different content, and totals only grow by the delta
        assert len(new) == len(seen) + len(delta)
        seen.extend(delta)
        return delta

    # run 1: one OPEN session per user (funnel-shaped for user 1,
    # non-matching for user 2) — nothing closes, nothing emits
    first = run_once([ev(1, 0, "view", 1), ev(1, 2, "click", 2),
                      ev(1, 4, "purchase", 3),
                      ev(2, 0, "purchase", 10), ev(2, 2, "view", 11)])
    assert first == {}

    # crash/redeploy: new files push both users past the gap; the
    # recovered state must close the PRE-CRASH sessions intact
    second = run_once([ev(1, 600, "view", 20),
                       ev(2, 600, "click", 21)])
    assert second == {(1, 1): ("vcp", 1)}  # user 2's 'pv' never matches

    # third run with no new input: zero new batches, zero re-emission
    stream = file_stream_source(spark, src, fmt="parquet", schema=SCHEMA)
    q = (cep_stream(stream, pattern="v[^p]*c[^p]*p",
                    symbols={"view": "v", "click": "c", "purchase": "p"},
                    gap_seconds=1800, close_on_timeout=False)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", cp)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(seen) == 1


def test_tws_cep_stream_parity(spark, tmp_path):
    """cep_stream_tws (transformWithStateInPandas, event-time timers)
    must emit sessions BIT-IDENTICAL to the legacy
    applyInPandasWithState cep_stream on the same multi-batch stream —
    shared ingest/gap-close/match kernels, different state protocol.
    Skipped where google.protobuf (the tws state-server dependency) is
    absent."""
    pytest.importorskip("google.protobuf.descriptor")
    import datetime as dt
    from go_streams_spark.streaming import file_stream_source
    from go_streams_spark.streaming.stateful import (cep_stream,
                                                     cep_stream_tws)

    SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string")
    base = dt.datetime(2024, 1, 1, 8)

    def ev(uid, minute, etype, eid):
        return (eid, base + dt.timedelta(minutes=minute), uid, etype)

    rows = ([ev(1, m, t, 10 + i) for i, (m, t) in enumerate(
                [(0, "view"), (5, "click"), (9, "purchase")])]
            + [ev(2, m, t, 30 + i) for i, (m, t) in enumerate(
                [(0, "purchase"), (3, "view"), (6, "click")])]
            + [ev(1, 600, "view", 40), ev(2, 600, "click", 41)]
            + [ev(1, 10 ** 5, "noop", 901), ev(2, 10 ** 5, "noop", 902)])
    src = str(tmp_path / "src")
    df_all = spark.createDataFrame(rows, SCHEMA)
    df_all.where(F.col("event_id") < 40).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    df_all.where(F.col("event_id") >= 40).coalesce(1) \
        .write.mode("append").parquet(src)

    def run(op, cp):
        stream = file_stream_source(spark, src, fmt="parquet",
                                    schema=SCHEMA,
                                    maxFilesPerTrigger="1")
        out = op(stream, pattern="v[^p]*c[^p]*p",
                 symbols={"view": "v", "click": "c", "purchase": "p"},
                 gap_seconds=1800)
        name = _mem()
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"],
                                           r["first_match"])
                for r in spark.table(name).collect()}

    legacy = run(cep_stream, str(tmp_path / "cp_legacy"))
    with _rocksdb(spark):
        tws = run(cep_stream_tws, str(tmp_path / "cp_tws"))
    assert tws == legacy
    assert len(tws) > 0


def test_tws_token_bucket_parity(spark, tmp_path):
    """token_bucket_stream_tws must admit BIT-IDENTICALLY to the legacy
    operator (shared integer fold, different state protocol). Skipped
    where google.protobuf is absent."""
    pytest.importorskip("google.protobuf.descriptor")
    import datetime as dt
    from go_streams_spark.streaming import file_stream_source
    from go_streams_spark.streaming.stateful import (
        token_bucket_stream, token_bucket_stream_tws)

    SCHEMA = "event_id long, ts timestamp, user_id long"
    base = dt.datetime(2024, 1, 1, 8)
    rows = [(i, base + dt.timedelta(seconds=s), i % 3)
            for i, s in enumerate([0, 0, 1, 2, 5, 5, 6, 9, 30, 31, 60])]
    src = str(tmp_path / "src")
    df_all = spark.createDataFrame(rows, SCHEMA)
    df_all.where(F.col("event_id") < 6).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    df_all.where(F.col("event_id") >= 6).coalesce(1) \
        .write.mode("append").parquet(src)

    def run(op, cp):
        stream = file_stream_source(spark, src, fmt="parquet",
                                    schema=SCHEMA,
                                    maxFilesPerTrigger="1")
        out = op(stream, rate_micro_per_sec=500_000,
                 burst_micro=2_000_000)
        name = _mem()
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["event_id"]: (r["admitted"], r["tokens_after_micro"])
                for r in spark.table(name).collect()}

    legacy = run(token_bucket_stream, str(tmp_path / "cp_legacy"))
    with _rocksdb(spark):
        tws = run(token_bucket_stream_tws, str(tmp_path / "cp_tws"))
    assert tws == legacy
    assert len(tws) == len(rows)


def test_holt_winters_stream_checkpoint_recovery(spark, tmp_path):
    """Kill-restart the streaming Holt-Winters at a checkpoint whose
    boundary splits the fold mid-model: the restarted query must resume
    with the recovered (open slot, init buffer, level/trend, seasonal
    vector) state — the union of both runs' emissions equals the batch
    fold minus the final open slot, with nothing re-emitted."""
    from go_streams_spark.operators.aggregate import holt_winters_additive
    from go_streams_spark.streaming.stateful import holt_winters_stream

    period = 3
    rows = [("a", h, 11 * h + 5) for h in range(9)]
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")

    def to_df(rs):
        return spark.createDataFrame(
            [(k, f"2024-02-01 {h:02d}:00:00", v) for k, h, v in rs],
            "k string, hs string, y long").select(
            "k", F.col("hs").cast("timestamp").alias("hour"), "y")

    out_dir = str(tmp_path / "out")
    seen: set = set()

    def run_once():
        stream = (spark.readStream
                  .schema("k string, hour timestamp, y long")
                  .parquet(src))
        out = holt_winters_stream(stream, key_col="k", hour_col="hour",
                                  value_col="y", period=period)
        # memory sinks cannot recover from a checkpoint; a parquet
        # sink is the real exactly-once surface anyway
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", cp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {(r["k"], r["hour"].hour, r["y_micro"], r["level"],
                 r["trend"], r["seasonal"])
                for r in spark.read.parquet(out_dir).collect()}
        new = rows - seen
        seen.update(rows)
        return sorted(new)

    # run 1: slots 0-5 (init consumes 0-2; folds emit 3,4; 5 stays open)
    to_df(rows[:6]).coalesce(1).write.mode("append").parquet(src)
    first = run_once()
    assert sorted(h for _, h, *_ in first) == [3, 4]

    # crash/redeploy: slots 6-8 arrive; recovered state closes 5, folds
    # 6, 7; 8 stays open; nothing from run 1 is re-emitted
    to_df(rows[6:]).coalesce(1).write.mode("append").parquet(src)
    second = run_once()
    assert sorted(h for _, h, *_ in second) == [5, 6, 7]

    hourly = to_df(rows).groupBy("k", "hour").agg(F.sum("y").alias("ym"))
    batch = holt_winters_additive(hourly, key_col="k", order_col="hour",
                                  value_col="ym", period=period)
    expect = sorted((r["k"], r["hour"].hour, r["ym"], r["level"],
                     r["trend"], r["seasonal"])
                    for r in batch.collect() if r["hour"].hour != 8)
    assert sorted(first + second) == expect
