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
    recursive CTE. The fold is inherently sequential per key, so it
    runs as one Arrow applyInPandas pass per key partition (key-grain
    bounded, the isotonic/PAV decision class); everything before and
    after stays relational. Returns the input rows plus
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

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col]).copy()
        ser = pd.to_datetime(pdf[ts_col])
        if getattr(ser.dt, "tz", None) is not None:
            ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
        secs = (ser.astype("datetime64[ns]").astype("int64")
                // 1_000_000_000).tolist()
        tokens, prev = burst_micro, None
        admitted, after = [], []
        for s in secs:
            if prev is not None:
                tokens = min(burst_micro,
                             tokens + (s - prev) * rate_micro_per_sec)
            prev = s
            if tokens >= cost_micro:
                tokens -= cost_micro
                admitted.append(True)
            else:
                admitted.append(False)
            after.append(tokens)
        pdf["admitted"] = admitted
        pdf["tokens_after_micro"] = after
        return pdf[cols + ["admitted", "tokens_after_micro"]]

    return df.groupBy(key_col).applyInPandas(_fold, schema=out_schema)
