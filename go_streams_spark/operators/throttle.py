"""Throttler: rate-limit to N elements per period.

Reference: ``flow/throttler.go:12-26,58,117-132,160-170`` — quota per
period, Backpressure mode blocks upstream, Discard mode drops when the
buffer is full.

Spark-first: rate control belongs at the SOURCE in a micro-batch engine —
per-element token buckets inside a distributed stage would serialize the
pipeline. The faithful mappings:

  - Backpressure == ingestion caps: Kafka ``maxOffsetsPerTrigger``, file
    ``maxFilesPerTrigger``, rate source ``rowsPerSecond`` + trigger
    interval. ``throttle_options`` computes these.
  - Discard == admission control: deterministic sampling/limit per
    micro-batch (``discard_over_quota`` keeps the first ``quota`` elements
    per period bucket — the reference's drop-when-full approximated
    deterministically, flagged in SURVEY §2.1#8 as approximate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..api import Flow


#: per-source spelling of "at most N elements per trigger"
_QUOTA_OPTION = {
    "kafka": "maxOffsetsPerTrigger",
    "rate-micro-batch": "rowsPerBatch",
    "gss_replay": "rowsPerBatch",
    "file": "maxFilesPerTrigger",
}


def throttle_options(elements: int, period_seconds: float,
                     source: str = "kafka") -> dict[str, str]:
    """Source/trigger options implementing Backpressure-mode throttling
    (``flow/throttler.go:160-170``: quota per period, upstream blocked —
    in a micro-batch engine the source simply doesn't advance its offset
    past the quota, which IS blocking the upstream).

    Use with: ``readStream.format(source).options(**opts)`` plus
    ``trigger(processingTime=opts.pop("__trigger_processing_time"))``.
    ``source`` picks the right option spelling (Kafka
    ``maxOffsetsPerTrigger``, rate-micro-batch/gss_replay
    ``rowsPerBatch``, file ``maxFilesPerTrigger``).
    """
    if elements <= 0 or period_seconds <= 0:
        raise ValueError("elements and period must be positive")  # flow/throttler_test.go:74-96
    quota_key = _QUOTA_OPTION.get(source, "maxOffsetsPerTrigger")
    return {
        quota_key: str(elements),
        "__trigger_processing_time": f"{period_seconds} seconds",
    }


def discard_over_quota(quota: int, ts: str | Column, period: str,
                       *, order_by: Sequence[Column | str] | None = None,
                       keys: Sequence[Column | str] = ()) -> Flow:
    """Discard-mode approximation: keep first ``quota`` elements per
    ``period`` bucket of ``ts`` (``flow/throttler.go:117-125``).

    ``keys`` scopes the quota per key (per-tenant/per-user rate
    limiting — beyond the reference's single global bucket): the window
    partitions on (keys..., bucket), so hot tenants can't starve the
    rest and the shuffle spreads across tenants instead of one global
    period partition. Deterministic given ``order_by``.
    """
    if quota <= 0:
        raise ValueError("quota must be positive")
    tcol = F.col(ts) if isinstance(ts, str) else ts

    def _apply(df: DataFrame) -> DataFrame:
        bucket = F.window(tcol, period).getField("start").alias("__tb")
        ob = [F.col(c) if isinstance(c, str) else c for c in (order_by or [tcol])]
        kcols = [F.col(k) if isinstance(k, str) else k for k in keys]
        w = Window.partitionBy(*kcols, F.col("__tb")).orderBy(*ob)
        return (df.withColumn("__tb", bucket)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= quota)
                .drop("__tb", "__rn"))

    return Flow(_apply, name="throttler_discard")


def token_bucket_admit(df: DataFrame, *, rate_micro_per_sec: int,
                       burst_micro: int, cost_micro: int = 1_000_000,
                       key_col: str = "user_id", ts_col: str = "ts",
                       tiebreak_col: str = "event_id") -> DataFrame:
    """Token-bucket admission control — the burst-tolerant rate limiter
    the fixed-window Discard throttler cannot express (a client may
    burst up to ``burst_micro`` at once, then sustain
    ``rate_micro_per_sec``; fixed windows allow 2x bursts at window
    boundaries). Semantics are the textbook bucket: tokens start full,
    refill linearly with event-time seconds, cap at burst; an event is
    admitted iff >= ``cost_micro`` tokens remain, and only admission
    spends.

    ENGINE-EXACT: all arithmetic is INTEGER micro-tokens (refill =
    whole-second delta x rate), so the sequential fold is
    bit-reproducible in any engine — the DuckDB oracle replays it as a
    recursive CTE. The fold is inherently sequential per key AND
    data-dependent (a rejection spends nothing, so the admitted set
    feeds back into the state — the GCRA recursion; no associative
    prefix form exists, hence no JVM window-fold path like
    ``ewma_halving``'s linear recurrence). What IS free is the grouping
    overhead: instead of one applyInPandas call per key (one pandas
    frame + sort + datetime conversion per key — dominated by per-group
    fixed cost when keys are small), hash-repartition on the key, sort
    within partitions, and run ONE mapInPandas pass per partition with
    the (key, tokens, prev_sec) state carried across Arrow batches —
    same shuffle count, same exact fold, ~key-count-times fewer Python
    crossings. Returns the input rows plus
    (admitted: boolean, tokens_after_micro: long).
    """
    if rate_micro_per_sec < 0 or burst_micro < 1 or cost_micro < 1:
        raise ValueError(
            "need rate_micro_per_sec >= 0, burst_micro >= 1, "
            f"cost_micro >= 1; got {rate_micro_per_sec}/{burst_micro}/"
            f"{cost_micro}")
    import pandas as pd

    cols = df.columns
    out_schema = ", ".join(
        f"{n} {t}" for n, t in df.dtypes) + ", admitted boolean, " \
        "tokens_after_micro bigint"
    rate, burst, cost = rate_micro_per_sec, burst_micro, cost_micro

    def _fold(batches):
        # Partition is hash-partitioned by key and sorted by
        # (key, ts, tiebreak); a key's rows may SPAN Arrow batches, so
        # the bucket state must carry across the batch iterator.
        state_key, tokens, prev = object(), 0, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ser = pd.to_datetime(pdf[ts_col])
            if getattr(ser.dt, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            secs = (ser.astype("datetime64[ns]").astype("int64")
                    // 1_000_000_000).tolist()
            keys = pdf[key_col].tolist()
            admitted, after = [], []
            for k, s in zip(keys, secs):
                if k != state_key:
                    state_key, tokens, prev = k, burst, None
                if prev is not None:
                    tokens = min(burst, tokens + (s - prev) * rate)
                prev = s
                if tokens >= cost:
                    tokens -= cost
                    admitted.append(True)
                else:
                    admitted.append(False)
                after.append(tokens)
            out = pdf.copy()
            out["admitted"] = admitted
            out["tokens_after_micro"] = after
            yield out[cols + ["admitted", "tokens_after_micro"]]

    part = (df.repartition(key_col)
            .sortWithinPartitions(key_col, ts_col, tiebreak_col))
    return part.mapInPandas(_fold, schema=out_schema)
