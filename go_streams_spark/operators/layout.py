"""Write-time data layout: Z-order (Morton) clustering for
multi-dimensional data skipping.

Partition pruning handles ONE dimension (the partition column);
range-sorted writes handle one sort key. When reads filter on several
columns (user AND time, key AND metric), the 100 TB technique is
Z-ORDERING: quantize each clustering column to a small fixed range,
interleave the bits into a single Morton key, and range-sort the write
by that key — rows close in the multi-dimensional space land in the
same files, so parquet row-group min/max statistics prune files for
filters on ANY clustered column (the same layout Delta's OPTIMIZE
ZORDER BY produces).

Everything here is JVM-side column arithmetic: quantization bounds come
from one min/max aggregate (bounded metadata), the bit-interleave is a
shift/or expression tree, and the clustered write is
``repartitionByRange(key) + sortWithinPartitions(key)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear quantization of ``col`` into [0, 2^bits) given bounds."""
    steps = (1 << bits) - 1
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    q = F.floor((col.cast("double") - lo) / span * steps)
    return F.greatest(F.lit(0), F.least(F.lit(steps), q)).cast("long")


def integer_quantize(col: Column, lo: Column, hi: Column,
                     bits: int = 8) -> Column:
    """Engine-exact linear quantization of an INTEGER column into
    [0, 2^bits): ``((v - lo) * steps) div max(hi - lo, 1)``. Pure int64
    arithmetic with one truncating division on non-negative operands —
    bit-identical in Spark, DuckDB, and numpy, unlike the float
    ``_quantize`` path whose double rounding can flip a cell boundary
    between engines. Inputs must already be integral (caller casts)."""
    steps = F.lit((1 << bits) - 1).cast("long")
    span = F.greatest((hi - lo).cast("long"), F.lit(1).cast("long"))
    q = ((col.cast("long") - lo.cast("long")) * steps).cast("long")
    # exact floor division: (q - q % span) is an exact multiple of span,
    # so the IEEE double division returns the integer quotient exactly
    # (both operands and the quotient are < 2^53)
    return F.least(steps, ((q - q % span) / span).cast("long"))


def ntile_arithmetic(rn: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` as closed-form arithmetic over a precomputed
    1-based ordinal ``rn`` and total count ``n`` (the distributed_ordinal
    outputs): the first ``n % k`` buckets take ``ceil(n/k)`` rows, the
    rest ``floor(n/k)`` — bit-identical to the window function but with
    no Exchange SinglePartition, so it survives any row count."""
    q, r = F.floor(n / k), n % k
    big = r * (q + 1)
    return F.when(
        rn <= big, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(
        r + F.floor((rn - big - 1) / F.greatest(q, F.lit(1))) + 1
    ).cast("int")


def zorder_key(quantized: Sequence[Column], bits: int = 8) -> Column:
    """Morton interleave: bit j of column i lands at position
    ``j * n_cols + i`` of the key. Pure shift/or expression tree.

    The key must fit in the 63 value bits of a signed long — a bit in
    the sign position would make those keys range-sort BEFORE all
    others and silently mis-cluster the layout, so over-wide requests
    (e.g. 8 columns at the default 8 bits) are rejected up front."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} columns x {bits} bits = {n * bits} key bits "
            f"exceeds the 63 value bits of a signed long; lower bits to "
            f"<= {63 // n} or cluster fewer columns")
    key = F.lit(0).cast("long")
    for i, q in enumerate(quantized):
        for j in range(bits):
            bit = F.shiftright(q, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * n + i)
    return key


def zorder_sorted(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
                  num_partitions: int | None = None,
                  key_col: str = "__zkey") -> DataFrame:
    """Return ``df`` re-clustered by the Z-order of ``cols``: one min/max
    aggregate for quantization bounds (broadcast back as a 1-row cross
    join), Morton key, range shuffle + in-partition sort on it. Drop-in
    before any parquet write whose readers filter on several of
    ``cols``."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    with_key = (df.crossJoin(F.broadcast(bounds))
                .withColumn(key_col, zorder_key(
                    [_quantize(F.col(c), F.col(f"__lo_{c}"),
                               F.col(f"__hi_{c}"), bits) for c in cols],
                    bits))
                .drop(*[f"__lo_{c}" for c in cols],
                      *[f"__hi_{c}" for c in cols]))
    parts = ([num_partitions] if num_partitions else [])
    return (with_key.repartitionByRange(*parts, key_col)
            .sortWithinPartitions(key_col)
            .drop(key_col))


def parquet_size_stats(spark, path: str) -> dict:
    """File-size profile of a parquet directory (driver-side listing —
    bounded metadata): count, total bytes, min/avg/max file bytes. The
    small-file diagnostic: a 100 TB table in 4 KB files is a metadata
    DoS on the NameNode/driver and a per-task overhead disaster."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    # RECURSIVE listing: partitioned layouts (batch_id=N/, dt=.../) keep
    # their files in subdirectories — a top-level listStatus would see 0
    # bytes and compact a 50 GB table into one file
    it = fs.listFiles(p, True)
    sizes = []
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            sizes.append(f.getLen())
    if not sizes:
        return {"files": 0, "bytes": 0, "min": 0, "avg": 0, "max": 0}
    return {"files": len(sizes), "bytes": sum(sizes), "min": min(sizes),
            "avg": sum(sizes) // len(sizes), "max": max(sizes)}


def compact_parquet(spark, src: str, dst: str, *,
                    target_file_mb: int = 128,
                    sort_within_by=None) -> dict:
    """Compact a small-file parquet directory into ~``target_file_mb``
    files — the standard maintenance job behind every streaming sink
    (micro-batches leave one file per trigger per partition).

    Sizing is MEASURED, not guessed: the input's actual bytes (driver
    file listing) divided by the target gives the output file count,
    then one round-robin repartition writes evenly-sized files.
    ``sort_within_by`` optionally sorts within output files so the
    rewrite also rebuilds row-group min/max skipping (pair with
    ``zorder_sorted`` for multi-column skipping instead). Returns
    before/after ``parquet_size_stats``."""
    if target_file_mb <= 0:
        raise ValueError("target_file_mb must be positive")
    before = parquet_size_stats(spark, src)
    n_files = max(1, -(-before["bytes"] // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src).repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dst)
    return {"before": before, "after": parquet_size_stats(spark, dst),
            "target_files": n_files}


def training_shuffle(df, *, id_col: str = "doc_id", shards: int = 16,
                     seed: int = 7):
    """Deterministic global shuffle for training export — the last pass
    of every pretraining pipeline (examples must reach the trainer in
    pseudo-random order, yet reproducibly). Each row gets an md5 key
    from (id, seed); the key's prefix picks one of ``shards`` output
    shards and orders rows WITHIN the shard.

    This is the scale-correct shape: shard assignment is a hash
    partition (one shuffle), in-shard order is a sort within the shard
    (no global sort, no single-partition rank). At 100 TB, pick
    ``shards`` so a shard is ~512 MB and write with
    partitionBy/sortWithinPartitions; changing ``seed`` reshuffles the
    whole corpus deterministically between epochs.

    Returns (id_col, shard, pos) — shard in [0, shards), pos 1-based
    within shard.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"_{seed}")))
    shard = (F.conv(F.substring(key, 1, 13), 16, 10).cast("long")
             % shards).cast("int")
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (df.select(id_col, key.alias("__key"), shard.alias("shard"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__key"))


def rowgroup_stats(spark, path: str, columns):
    """Parquet row-group statistics audit — the measurement half of the
    layout story (compact_parquet / zorder_sorted are the acting half):
    read ONLY the file footer (pyarrow metadata, never data pages) and
    report, per requested integer column, how prunable the layout is.

    Returns one row per column: (col_name, n_rowgroups, n_constant —
    row groups where min==max, the partition-pruning jackpot,
    n_overlap_breaks — adjacent row-group pairs whose [min,max] ranges
    overlap in file order: 0 means the column is range-sorted and a
    point/range predicate touches O(1) row groups; rg-1 means footer
    stats prune nothing, sum_range — the sum of per-row-group
    (max - min) widths: the prunability metric for MULTI-dimensional
    clustering (z-order shrinks every group's range on every key even
    though file-order adjacencies still overlap; a point predicate
    touches ~sum_range/domain of the groups), global_min, global_max).

    Footer metadata is row-group-grain — bounded index metadata, the
    same decision class as a codebook collect; no data scan happens.
    Integer-typed columns only (loud error otherwise): cross-engine
    stat parity for floats/strings depends on formatter quirks.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F  # noqa: F811
    cols = list(columns)
    if not cols:
        raise ValueError("columns must name at least one column")
    md = pq.ParquetFile(path).metadata
    name_to_idx = {}
    for i in range(md.num_columns):
        name_to_idx[md.row_group(0).column(i).path_in_schema] = i
    missing = [c for c in cols if c not in name_to_idx]
    if missing:
        raise ValueError(f"columns not in file: {missing}")
    rows = []
    for c in cols:
        idx = name_to_idx[c]
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or st.min is None or st.max is None:
                raise ValueError(f"column {c!r} has no row-group stats")
            if not isinstance(st.min, int):
                tname = type(st.min).__name__
                raise ValueError(
                    f"column {c!r} is not integer-typed ({tname}); "
                    "the audit supports integer columns")
            mins.append(st.min)
            maxs.append(st.max)
        n = len(mins)
        rows.append((c, n,
                     sum(1 for a, b in zip(mins, maxs) if a == b),
                     sum(1 for g in range(1, n) if mins[g] <= maxs[g - 1]),
                     sum(b - a for a, b in zip(mins, maxs)),
                     min(mins), max(maxs)))
    return spark.createDataFrame(
        rows, "col_name string, n_rowgroups bigint, n_constant bigint, "
              "n_overlap_breaks bigint, sum_range bigint, "
              "global_min bigint, global_max bigint")
