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
