"""Query registry: every SURVEY §2 operator demonstrated as a (Spark
DataFrame query, DuckDB oracle SQL) pair over the driver's synthetic
tables. ``__spark_entry__.py`` exposes this registry to the driver.

Conventions (driver compare contract):
  - every computed column is aliased identically in Spark and SQL;
  - floating aggregates are rounded (2-4 dp) on BOTH sides so
    accumulation-order noise can't flip the value hash;
  - results are deterministic (explicit orders for any positional op).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .api import Source
from .operators import (
    Map, FlatMap, Filter, PassThrough,
    running_reduce, batch_by_count,
    tumbling_window, sliding_window, session_window, keyed,
    split, merge, round_robin, zip_with, discard_over_quota,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic table. ``events.ts`` is parquet TIMESTAMP(NANOS)
    which Spark's vectorized reader rejects — read nanos as long and
    convert (integer div, matching DuckDB's truncation to micros)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship + keyed aggregation (Keyed #12 / final Reduce #5 — SURVEY §2)
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: Filter -> Keyed agg.

    Scale notes: predicate pushes down to the parquet scan; hash
    aggregation with map-side partials; two-column group key has tiny
    cardinality so the final exchange moves a handful of rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        Source(li)
        .via(Filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")))
        .via(keyed(
            ["l_returnflag", "l_linestatus"],
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ))
        .to_df()
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Map (#1)
# ---------------------------------------------------------------------------

@query("map_project", """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
       upper(l_returnflag)                          AS flag
FROM lineitem
""")
def map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map as a multi-column projection (flow/map.go:11) — pure codegen,
    no shuffle, column pruning reaches the scan."""
    li = _t(spark, sf_dir, "lineitem")
    return Source(li).via(Map({
        "l_orderkey": F.col("l_orderkey"),
        "l_linenumber": F.col("l_linenumber"),
        "revenue": F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
        "flag": F.upper("l_returnflag"),
    })).to_df()


# ---------------------------------------------------------------------------
# Filter (#3)
# ---------------------------------------------------------------------------

@query("filter_predicate", """
SELECT event_id, user_id, event_type, round(value, 2) AS value
FROM events
WHERE event_type = 'click' AND value > 50
""")
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with a pushdown-able compound predicate (flow/filter.go:93)."""
    ev = _t(spark, sf_dir, "events")
    return (
        Source(ev)
        .via(Filter((F.col("event_type") == "click") & (F.col("value") > 50)))
        .via(Map({"event_id": "event_id", "user_id": "user_id",
                  "event_type": "event_type", "value": F.round("value", 2)}))
        .to_df()
    )


# ---------------------------------------------------------------------------
# FlatMap (#2) + Flatten (#18)
# ---------------------------------------------------------------------------

@query("flatmap_words", """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""")
def flatmap_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMap: 1 document -> N words (flow/flat_map.go:96), then keyed
    count. explode stays in codegen; agg is one shuffle on word."""
    docs = _t(spark, sf_dir, "documents")
    return (
        Source(docs)
        .via(FlatMap(F.split(F.col("text"), " "), output="word"))
        .via(Filter(F.col("word") != ""))
        .via(keyed(["word"], F.count(F.lit(1)).alias("cnt")))
        .to_df()
    )


# ---------------------------------------------------------------------------
# Running Reduce (#5) — per-element emission
# ---------------------------------------------------------------------------

@query("reduce_running_max", """
SELECT event_id, user_id,
       max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc
FROM events
""")
def reduce_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce with per-element emission (flow/reduce.go:80-91): running max
    per user. Distributed: one shuffle on user_id, frame computed locally."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(running_reduce(
        "value", order_by=["ts", "event_id"], partition_by=["user_id"],
        fn="max", output="acc")).to_df()
    return out.select("event_id", "user_id", "acc")


@query("fold_running_sum", """
SELECT event_id, user_id,
       round(100.0 + sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS acc
FROM events
""")
def fold_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold: seeded (init=100.0) running sum per user (flow/fold.go:83-90,
    golden model flow/fold_test.go:38-39)."""
    from .operators import running_fold
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(running_fold(
        "value", 100.0, order_by=["ts", "event_id"], partition_by=["user_id"],
        fn="sum", output="acc")).to_df()
    return out.select("event_id", "user_id", F.round("acc", 2).alias("acc"))


# ---------------------------------------------------------------------------
# Windows (#9-11)
# ---------------------------------------------------------------------------

@query("tumbling_window_events", """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*)            AS cnt,
       round(sum(value),2) AS sum_value
FROM events
GROUP BY 1, 2
""")
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TumblingWindow (flow/tumbling_window.go:88-118): 1h fixed windows,
    keyed by event_type. Single hash shuffle on (type, window)."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(tumbling_window(
        "ts", "1 hour",
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        keys=["event_type"],
    )).to_df()
    return out.select("window_start", "event_type", "cnt", "sum_value")


@query("sliding_window_events", """
SELECT ws AS window_start, count(*) AS cnt, round(sum(value),2) AS sum_value
FROM (
  SELECT e.value,
         unnest([time_bucket(INTERVAL '30 minutes', e.ts),
                 time_bucket(INTERVAL '30 minutes', e.ts) - INTERVAL '30 minutes']) AS ws
  FROM events e
)
GROUP BY ws
""")
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SlidingWindow (flow/sliding_window.go:155-326): 1h size / 30m slide;
    start alignment floor-to-slide matches the reference exactly
    (flow/sliding_window.go:309-326). Each event lands in size/slide = 2
    windows; Spark expands then hash-aggregates — one shuffle."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(sliding_window(
        "ts", "1 hour", "30 minutes",
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )).to_df()
    return out.select("window_start", "cnt", "sum_value")


@query("session_window_events", """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts)                         AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*)                        AS cnt,
       round(sum(value), 2)            AS sum_value
FROM sessions
GROUP BY user_id, sid
""")
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SessionWindow (flow/session_window.go:102-140): 30m inactivity gap
    per user — built-in session_window(); oracle is the classic
    gaps-and-islands rewrite. One shuffle on (user, session)."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(session_window(
        "ts", "30 minutes",
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        keys=["user_id"],
    )).to_df()
    return out.select("user_id",
                      F.col("window_start").alias("session_start"),
                      F.col("window_end").alias("session_end"),
                      "cnt", "sum_value")


# ---------------------------------------------------------------------------
# Topology: Split (#13), Merge (#16), RoundRobin (#15), FanOut (#14)
# ---------------------------------------------------------------------------

@query("split_merge_branches", """
SELECT branch, event_type, count(*) AS cnt
FROM (
  SELECT CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS branch, event_type
  FROM events
)
GROUP BY branch, event_type
""")
def split_merge_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split (flow/util.go:23-41) into two predicate branches, tag each,
    Merge (UNION ALL, flow/util.go:84-105) back, keyed count."""
    ev = _t(spark, sf_dir, "events")
    hi, lo = split(ev, F.col("value") >= 50)
    tagged = merge(hi.withColumn("branch", F.lit("high")),
                   lo.withColumn("branch", F.lit("low")))
    return (
        Source(tagged)
        .via(keyed(["branch", "event_type"], F.count(F.lit(1)).alias("cnt")))
        .to_df()
    )


@query("fanout_merge", """
SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT event_type, value FROM events
)
GROUP BY event_type
""")
def fanout_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FanOut(2) + Merge: duplicates preserved (bag-union golden
    flow/flow_test.go:208-214 expects [B,B,C,C])."""
    from .operators import fan_out
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    b1, b2 = fan_out(ev, 2)
    return (
        Source(merge(b1, b2))
        .via(keyed(["event_type"], F.count(F.lit(1)).alias("cnt"),
                   F.round(F.sum("value"), 2).alias("sum_value")))
        .to_df()
    )


@query("round_robin_buckets", """
SELECT (event_id % 4) AS bucket, count(*) AS cnt
FROM events
GROUP BY 1
""")
def round_robin_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RoundRobin (flow/util.go:67-80): each element to exactly one of 4
    branches; per-branch counts via Merge of tagged branches."""
    ev = _t(spark, sf_dir, "events")
    branches = round_robin(ev, 4, by=F.col("event_id"))
    tagged = merge(*[b.withColumn("bucket", F.lit(i).cast("long"))
                     for i, b in enumerate(branches)])
    return (
        Source(tagged)
        .via(keyed(["bucket"], F.count(F.lit(1)).alias("cnt")))
        .to_df()
    )


# ---------------------------------------------------------------------------
# ZipWith (#17)
# ---------------------------------------------------------------------------

@query("zip_with_padding", """
WITH a AS (
  SELECT row_number() OVER (ORDER BY o_orderkey) AS idx, o_totalprice
  FROM orders ORDER BY o_orderkey LIMIT 500
), b AS (
  SELECT row_number() OVER (ORDER BY c_custkey) AS idx, c_acctbal
  FROM customer ORDER BY c_custkey LIMIT 300
)
SELECT round(coalesce(a.o_totalprice, 0) + coalesce(b.c_acctbal, 0), 2) AS value
FROM a FULL OUTER JOIN b USING (idx)
""")
def zip_with_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZipWith (flow/util.go:116-171): positional zip of two ordered
    streams of different length; shorter side zero-padded (goldens
    flow/flow_test.go:296-345)."""
    orders = _t(spark, sf_dir, "orders").orderBy("o_orderkey").limit(500)
    cust = _t(spark, sf_dir, "customer").orderBy("c_custkey").limit(300)
    out = zip_with(
        lambda a, b: F.round(a + b, 2),
        [orders, cust],
        [["o_orderkey"], ["c_custkey"]],
        ["o_totalprice", "c_acctbal"],
        [0.0, 0.0],
    )
    return out


# ---------------------------------------------------------------------------
# Batch (#7) and Throttler (#8)
# ---------------------------------------------------------------------------

@query("batch_by_count", """
SELECT batch_id, count(*) AS cnt, min(event_id) AS min_id, max(event_id) AS max_id
FROM (
  SELECT floor((row_number() OVER (ORDER BY event_id) - 1) / 100)::BIGINT AS batch_id,
         event_id
  FROM events
)
GROUP BY batch_id
""")
def batch_by_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch max-size path (flow/batch.go:86-96): groups of 100 in
    event_id order; final partial batch kept (flow/batch.go:98-104)."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(batch_by_count(100, order_by=["event_id"])).to_df()
    return (out.groupBy("batch_id")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min("event_id").alias("min_id"),
                 F.max("event_id").alias("max_id")))


@query("throttler_discard", """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, count(*) AS cnt
FROM (
  SELECT ts, row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                                ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn <= 5
GROUP BY 1
""")
def throttler_discard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttler Discard mode (flow/throttler.go:117-125): quota of 5
    elements per 1h period, overflow dropped deterministically."""
    ev = _t(spark, sf_dir, "events")
    out = Source(ev).via(discard_over_quota(
        5, "ts", "1 hour", order_by=["ts", "event_id"])).to_df()
    return (out.withColumn("bucket", F.window("ts", "1 hour").getField("start"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# PassThrough (#6)
# ---------------------------------------------------------------------------

@query("pass_through", """
SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def pass_through_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassThrough identity (flow/pass_through.go:63-68)."""
    return Source(_t(spark, sf_dir, "nation")).via(PassThrough()).to_df()
