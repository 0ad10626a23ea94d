"""Fan-out / fan-in / set-like topology utilities.

Reference semantics (reugn/go-streams ``flow/util.go``):
  - Split      predicate-routed 2-way partition      (``flow/util.go:23-41``)
  - FanOut     duplicate to N branches               (``flow/util.go:45-63``)
  - RoundRobin each element to exactly one of N      (``flow/util.go:67-80``)
  - Merge      N->1 bag union (no dedup)             (``flow/util.go:84-105``)
  - ZipWith    positional zip w/ zero padding        (``flow/util.go:116-171``)

Spark-first: branches are just multiple references to one lazy DataFrame —
Catalyst dedups the scan when the plan is collapsed, and in streaming you'd
use ``foreachBatch`` to avoid double source reads. Merge is UNION ALL
(duplicates preserved — pinned by ``flow/flow_test.go:208-214``).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.caching import track_persist

#: Spark byte-string suffixes (JavaUtils.byteStringAsBytes): bare
#: numbers are bytes for byte-typed confs like maxPartitionBytes
_BYTE_SUFFIXES = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
                  "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30,
                  "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
                  "p": 1 << 50, "pb": 1 << 50}


def parse_byte_string(value: str) -> int:
    """Parse a Spark byte-string conf value ("134217728", "128m",
    "1g", "128MB") to bytes — the same grammar as the JVM's
    ``JavaUtils.byteStringAsBytes`` (integer + optional
    case-insensitive b/k/kb/m/mb/g/gb/t/tb/p/pb suffix), reimplemented
    in Python so Spark Connect sessions (no ``_jvm``) can parse too.
    Raises ValueError on anything else."""
    s = str(value).strip().lower()
    num = s.rstrip("kmgtpb")
    mult = _BYTE_SUFFIXES.get(s[len(num):])
    if not num or not num.isdigit() or mult is None:
        raise ValueError(f"invalid byte string: {value!r}")
    return int(num) * mult


def cpu_widen(df: DataFrame, *, factor: int = 2) -> DataFrame:
    """Spread a SLIM frame across the cluster before a CPU-heavy
    per-row stage (a replicate fan-out, a hash derivation, a regex
    pass) whose cost is decoupled from the frame's byte size.

    File-split parallelism tracks INPUT BYTES (maxPartitionBytes), so
    a few-MB dimension scan arrives in 1-2 partitions — and any
    row-multiplying work fused into that stage runs on 1-2 cores while
    the rest of the cluster idles (measured: the 200x Poisson
    bootstrap fan-out over a 5k-doc scan ran single-core, 2.2 s of a
    3.1 s query). This widens to ``factor * defaultParallelism``
    round-robin partitions, but ONLY when the optimizer's size
    estimate says the scan is narrower than that — a frame that is
    already cluster-wide (every at-scale fact) passes through with no
    shuffle. Same estimator discipline as ``ordinal_index``: CBO
    sizeInBytes, never ``df.rdd.getNumPartitions()`` (which finalizes
    the AQE plan and eagerly executes upstream shuffles as side
    jobs). The unknown-stats sentinel (~2^63 for local in-memory
    relations) lands in the pass-through branch, which is also the
    safe branch for frames whose width we cannot see."""
    spark = df.sparkSession
    try:
        target = factor * spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext
        target = factor * int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
        max_bytes = parse_byte_string(spark.conf.get(
            "spark.sql.files.maxPartitionBytes"))
        est_parts = max(1, size // max(max_bytes, 1))
    except (AttributeError, ValueError):
        # Spark Connect (no _jdf) or an unparseable conf value: the
        # pass-through branch is the safe one either way
        return df
    if est_parts >= target:
        return df
    return df.repartition(target)


def split(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """Disjoint 2-way partition by predicate (``flow/util.go:23-41``).

    Null predicate results go to the negative branch, preserving the
    reference's strict boolean routing.
    """
    pos = df.filter(predicate)
    neg = df.filter(~F.coalesce(predicate, F.lit(False)))
    return pos, neg


def fan_out(df: DataFrame, magnitude: int) -> list[DataFrame]:
    """Duplicate the stream to N branches (``flow/util.go:45-63``)."""
    if magnitude < 1:
        raise ValueError("magnitude must be positive")
    return [df] * magnitude


def round_robin(df: DataFrame, magnitude: int, *, by: Column | None = None) -> list[DataFrame]:
    """Competing-consumer N-way distribution (``flow/util.go:67-80``).

    With ``by`` (a deterministic numeric column) routing is reproducible:
    branch i gets rows where ``pmod(by, n) == i``. Without it we hash the
    whole row — still exactly-one-branch per element. At scale this is a
    single pass: branches share one cached scan; no shuffle is required
    because routing is a narrow filter.
    """
    if magnitude < 1:
        raise ValueError("magnitude must be positive")
    key = by if by is not None else F.abs(F.hash(*[F.col(c) for c in df.columns]))
    routed = df.withColumn("__rr", F.pmod(key.cast("long"), F.lit(magnitude)))
    return [routed.filter(F.col("__rr") == i).drop("__rr") for i in range(magnitude)]


def merge(*dfs: DataFrame) -> DataFrame:
    """N->1 interleaved bag union — UNION ALL (``flow/util.go:84-105``)."""
    if not dfs:
        raise ValueError("merge requires at least one input")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=False)
    return out


def _ordinal(df: DataFrame, order_by: Sequence[Column | str], idx: str) -> DataFrame:
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    return df.withColumn(idx, F.row_number().over(w))


def zip_with(combine: Callable[..., Column], dfs: Sequence[DataFrame],
             order_bys: Sequence[Sequence[Column | str]],
             value_cols: Sequence[str], zeros: Sequence[object],
             *, output: str = "value") -> DataFrame:
    """Positional N-way zip with zero-value padding (``flow/util.go:116-171``).

    i-th element of each input is combined by ``combine``; shorter inputs
    are padded with their ``zeros`` value (goldens: ``flow/flow_test.go:
    296-345`` expect e.g. ``[2 0]``, ``[0 5 0]``).

    Each input gets an ordinal via ``row_number`` over its ``order_by``,
    then a cascade of full-outer equi-joins on the ordinal. NOTE: a global
    row_number forces a single-partition sort — positional semantics are
    inherently order-total. At 100 TB you would zip on an explicit shared
    key instead (this helper accepts any monotonically derived order
    column, so a pre-computed distributed ordinal also works).
    """
    if not (len(dfs) == len(order_bys) == len(value_cols) == len(zeros)):
        raise ValueError("dfs, order_bys, value_cols, zeros must align")
    idx = "__zip_idx"
    sides = []
    for i, (d, ob, vc) in enumerate(zip(dfs, order_bys, value_cols)):
        sides.append(_ordinal(d, ob, idx).select(F.col(idx), F.col(vc).alias(f"__v{i}")))
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, on=idx, how="full_outer")
    padded = [F.coalesce(F.col(f"__v{i}"), F.lit(z)) for i, z in enumerate(zeros)]
    return joined.select(F.col(idx), combine(*padded).alias(output)).orderBy(idx).drop(idx)


def distributed_ordinal(df: DataFrame, *, order_by: Sequence[Column | str],
                        idx: str = "__ord", strict: bool = True,
                        total_col: str | None = None) -> DataFrame:
    """Contiguous 1-based ordinal without a single-partition sort.

    Two-pass scheme: (1) range-repartition on the order key (strict mode)
    so partitions hold disjoint key ranges, sort locally, number rows
    within each partition; (2) collect per-partition COUNTS (one tiny row
    per partition), prefix-sum them on the driver, and add the broadcast
    offsets. The only data-sized movement is the range shuffle — the
    global row_number's Exchange SinglePartition never happens, which is
    the difference between working and not working at 10^10 rows.

    strict=False skips the range shuffle and numbers rows in the existing
    partition order — the "arrival order" contract of the reference's
    channels (streams.go:4-19), zero shuffles.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if strict:
        # EXPLICIT data-sized partition count (not
        # spark.sql.shuffle.partitions): parallelism tracks the input
        # size, so a small input is not fanned out to hundreds of
        # near-empty reduce tasks (the dominant bench cost of the
        # round-3 shape), while a 10 TB fact gets tens of thousands of
        # range partitions. Sized from the OPTIMIZER's sizeInBytes
        # estimate — NOT df.rdd.getNumPartitions(), which under AQE
        # finalizes the adaptive plan and eagerly EXECUTES every
        # upstream shuffle stage as side jobs (measured 1.3 s of
        # doubled work on a simple aggregate input), then reports the
        # post-coalesce count anyway. Floor of 2 — n_parts=1 would
        # degenerate the range exchange into the fact-wide Exchange
        # SinglePartition this operator exists to avoid.
        # REPARTITION_BY_NUM is also AQE-coalesce-exempt, so the branch
        # partition COUNTS can't be re-planned apart even before the
        # pin below.
        spark = df.sparkSession
        try:
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
        except AttributeError:  # Spark Connect: no _jdf — static fallback
            # NOT sparkContext here: Connect's SparkSession raises the
            # same PySparkAttributeError for sparkContext as for _jdf,
            # and an exception inside this handler would propagate.
            # shuffle.partitions is a plain conf read, available on
            # Connect, and the sizing the session was configured with.
            n_parts = max(2, int(spark.conf.get(
                "spark.sql.shuffle.partitions")))
        else:
            # full suffix grammar ("128m", "1g", ...), not just a
            # trailing "b": a legal suffixed conf value must size the
            # fan-out, not silently fall back to defaultParallelism —
            # and a genuinely malformed conf raises here, loudly
            max_bytes = parse_byte_string(spark.conf.get(
                "spark.sql.files.maxPartitionBytes"))
            # cap at 2^20 range partitions: CBO reports a 2^63-ish
            # sentinel for relations with unknown stats (local
            # in-memory data), and a million tasks is already beyond
            # any sane single-query fan-out
            n_parts = min(1 << 20, max(2, -(-size // max(max_bytes, 1))))
        df = df.repartitionByRange(n_parts, *cols).sortWithinPartitions(*cols)
    # monotonically_increasing_id after the in-partition sort encodes
    # (partition_id << 33) + local_row_index in iteration order, i.e.
    # exactly the (pid, local ordinal) pair — decoding it replaces the
    # row_number window, whose hashpartitioning(__pid) requirement
    # otherwise inserts a second full-width exchange after the range
    # shuffle. Data-sized work is now ONE range shuffle (+ a key-only
    # pruned branch for the counts).
    part = (df.withColumn("__mid", F.monotonically_increasing_id())
            .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
            .withColumn("__rn",
                        (F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
                         + F.lit(1)).cast("long")))
    # The counts branch below and the data branch both read `part`, and
    # the range exchange is NONDETERMINISTIC ACROSS PLAN INSTANCES:
    # RangePartitioner seeds its boundary sampling with the shuffle
    # RDD's id (byteswap32(partIdx ^ (rddId << 16))), and each branch
    # plans its own exchange (column pruning makes them
    # non-canonically-equal, so ReuseExchange can't fire). Two
    # independent evaluations sample DIFFERENT boundaries and assign
    # divergent __pid spaces — silently mis-numbering ordinals. (Small
    # inputs mask this: when every row fits the sample, boundaries are
    # seed-independent — sf0.001 passed while sf0.01 diverged.)
    # Persisting pins exactly ONE materialization both branches share;
    # deserialized level skips the columnar-compression CPU the round-3
    # serialized pin paid. Release via plans.release_tracked() between
    # queries, only after the consuming action.
    part = track_persist(part, StorageLevel.MEMORY_AND_DISK_DESER)
    # offsets = exclusive prefix-sum of per-partition counts, computed
    # IN-PLAN (no driver collect / no second job). The prefix-sum window
    # is single-partition but over one row PER PARTITION (thousands at
    # most), not per data row.
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1)
    off_df = (part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
              .withColumn("__off", F.coalesce(F.sum("__c").over(off_w),
                                              F.lit(0))))
    if total_col:
        # total row count from the same counts window stage — callers
        # that need (ordinal, total) pairs (ntile arithmetic, equi-depth
        # bucketing) get both from the one counts branch instead of a
        # third scan
        tot_w = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        off_df = off_df.withColumn(total_col, F.sum("__c").over(tot_w))
    off_df = off_df.drop("__c")
    return (part.join(F.broadcast(off_df), "__pid")
            .withColumn(idx, (F.col("__off") + F.col("__rn")).cast("long"))
            .drop("__pid", "__rn", "__off", "__mid"))


def zip_with_distributed(combine: Callable[..., Column], dfs: Sequence[DataFrame],
                         order_bys: Sequence[Sequence[Column | str]],
                         value_cols: Sequence[str], zeros: Sequence[object],
                         *, output: str = "value", sort_output: bool = True) -> DataFrame:
    """ZipWith on distributed ordinals: same semantics as ``zip_with``
    (positional, zero-padded — flow/util.go:116-171) but every input is
    numbered via ``distributed_ordinal`` and the join shuffles on the
    ordinal — no single-partition stage anywhere.

    ``sort_output=False`` skips the final global sort — correct whenever
    the consumer doesn't need positional OUTPUT order (aggregations,
    writes, set comparisons), which at scale is almost always."""
    idx = "__zip_idx"
    sides = []
    for i, (d, ob, vc) in enumerate(zip(dfs, order_bys, value_cols)):
        sides.append(distributed_ordinal(d, order_by=ob, idx=idx)
                     .select(F.col(idx), F.col(vc).alias(f"__v{i}")))
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, on=idx, how="full_outer")
    padded = [F.coalesce(F.col(f"__v{i}"), F.lit(z)) for i, z in enumerate(zeros)]
    out = joined.select(F.col(idx), combine(*padded).alias(output))
    if sort_output:
        out = out.orderBy(idx)
    return out.drop(idx)
