"""SparkSession bootstrap tuned for the engine.

Defaults target the test/bench environment (single JVM, ``local[N]``) but
every knob is chosen so the same code scales to a multi-executor cluster:
AQE handles skew and partition coalescing at runtime, shuffle partitions
default to a CPU-derived value locally (on a real cluster you'd size this
to ~2-3x total cores or let AQE coalesce), and Arrow is enabled for every
pandas-exchange path so Python-side operators stay vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "go-streams-spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    These settings are safe on a 1000-executor cluster: AQE re-plans at
    runtime (coalescing small shuffle partitions, splitting skewed ones,
    demoting/promoting joins to broadcast), and nothing here pins state
    to a single node.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # convert sort-merge joins to shuffled-hash from RUNTIME map
        # sizes (not estimates): un-hinted big-big joins keep SMJ's
        # spill safety at scale but get SHJ speed whenever every
        # per-partition build actually fits. The corpus-scale merge
        # hints in dedup/text stay SMJ either way — their build maps
        # are exactly what OOM'd at sf100 (SCALE.md §26).
        # (r9 fix: the config key is maxShuffledHashJoinLocalMapThreshold
        # — the previous key missed the "max" prefix, so the documented
        # runtime conversion never actually fired)
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every synthetic table in ``sf_dir`` as a DataFrame dict."""
    names = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            out[n] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every synthetic table as a temp view so pipelines can be
    declared in raw SQL (``spark.sql(...)``) as well as through the
    DataFrame API — the full Spark SQL surface (joins, windows, CTEs,
    set ops, lateral) over the same data, optimized by the same Catalyst
    pipeline. Returns the view names registered."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return sorted(tables)
