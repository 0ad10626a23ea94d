"""Stream-stream joins — the two-moving-sides correlation the
reference cannot express (its flows are single-input chains; joining
two go-streams pipelines requires hand-rolled channel fan-in and
manual buffering). Structured Streaming's watermarked interval join
is the scale-correct primitive: BOTH sides buffer in keyed state, the
event-time range condition bounds how long a row can possibly match,
and the watermark evicts state past that bound — so state stays
O(key-cardinality * window), never O(stream length).

At 100 TB/day this is the canonical enrichment shape (clicks joined
to impressions, purchases joined to views): one shuffle per side keyed
on the join key, state-store lookups instead of a rescan per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: join types Structured Streaming supports for stream-stream joins
#: with state eviction (outer sides additionally require the time bound)
_JOIN_TYPES = ("inner", "left_outer", "right_outer", "full_outer")


def stream_interval_join(left: DataFrame, right: DataFrame, *,
                         key: str, left_ts: str, right_ts: str,
                         lower: str = "0 seconds",
                         upper: str = "30 minutes",
                         watermark: str = "1 hour",
                         join_type: str = "inner") -> DataFrame:
    """Event-time interval join of two streams: match rows with equal
    ``key`` where ``right_ts`` falls in [left_ts + lower, left_ts +
    upper]. Both sides get ``withWatermark`` (required: without
    watermarks on BOTH inputs Spark cannot bound join state and the
    query is rejected for outer types / leaks state forever for
    inner). ``lower``/``upper`` are SQL interval strings.

    The output keeps every column of both inputs except the right
    side's join key (coalesced away for outer types). Column names
    must not collide otherwise — rename before joining (loud failure
    here beats Spark's ambiguous-reference error deep in analysis).
    """
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {_JOIN_TYPES}, "
                         f"got {join_type!r}")
    for side, ts, df in (("left", left_ts, left), ("right", right_ts, right)):
        if ts not in df.columns:
            raise ValueError(f"{side} side has no column {ts!r}")
        if key not in df.columns:
            raise ValueError(f"{side} side has no column {key!r}")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"column collision between sides: {sorted(overlap)} — rename "
            "before joining (the join key is the only shared name allowed)")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & F.expr(f"r.{right_ts} >= l.{left_ts} + INTERVAL {lower}")
        & F.expr(f"r.{right_ts} <= l.{left_ts} + INTERVAL {upper}")
    )
    joined = l.join(r, cond, join_type)
    # one key column out: coalesce covers the outer types where either
    # side can be NULL
    out_key = F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)
    rest = ([F.col(f"l.{c}") for c in left.columns if c != key]
            + [F.col(f"r.{c}") for c in right.columns if c != key])
    return joined.select(out_key, *rest)
