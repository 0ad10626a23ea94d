"""Batch sinks.

Reference mapping:
  - FileSink (extension/file.go:106,126-186) -> df.write.text; the
    reference's per-element retry callback maps to Spark task retries
    (spark.task.maxFailures) + job-level restart.
  - WriterSink (extension/sink_writer.go:27) -> any format writer.
  - StdoutSink (extension/sink_stdout.go:19) -> df.show.
  - IgnoreSink (extension/sink_ignore.go:14) -> noop format.
  - ChanSink (extension/chan.go:41) -> collect (tests only — never in a
    production pipeline; everything else here streams through executors).

Writers accept ``partition_by`` so output layout matches downstream
read patterns (partition pruning at 100 TB starts with how you WRITE).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..api import Sink


def _write(df: DataFrame, path: str, fmt: str, mode: str,
           partition_by: Sequence[str] | None, **options):
    w = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def text_sink(path: str, *, mode: str = "overwrite") -> Sink:
    """Line-oriented text writer (FileSink analogue): expects one string
    column named ``value``."""
    return Sink(lambda df: _write(df, path, "text", mode, None), name=f"text:{path}")


def json_sink(path: str, *, mode: str = "overwrite",
              partition_by: Sequence[str] | None = None, **options) -> Sink:
    return Sink(lambda df: _write(df, path, "json", mode, partition_by, **options),
                name=f"json:{path}")


def csv_sink(path: str, *, mode: str = "overwrite", header: bool = True,
             partition_by: Sequence[str] | None = None, **options) -> Sink:
    return Sink(lambda df: _write(df, path, "csv", mode, partition_by,
                                  header=str(header).lower(), **options),
                name=f"csv:{path}")


def parquet_sink(path: str, *, mode: str = "overwrite",
                 partition_by: Sequence[str] | None = None, **options) -> Sink:
    return Sink(lambda df: _write(df, path, "parquet", mode, partition_by, **options),
                name=f"parquet:{path}")


def noop_sink_batch() -> Sink:
    """Discard everything after full execution (IgnoreSink; also the
    standard benchmarking sink)."""
    return Sink(lambda df: df.write.format("noop").mode("overwrite").save(), name="noop")


def stdout_sink(n: int = 20, truncate: bool = False) -> Sink:
    return Sink(lambda df: df.show(n, truncate=truncate), name="stdout")


def collect_sink() -> Sink:
    """Driver-side collect — ChanSink analogue, tests only."""
    return Sink(lambda df: df.collect(), name="collect")


def bucketed_table_sink(table: str, *, bucket_by: Sequence[str], n_buckets: int,
                        sort_by: Sequence[str] | None = None,
                        path: str | None = None, fmt: str = "parquet",
                        mode: str = "overwrite") -> Sink:
    """Bucketed managed-table writer: co-locates join/agg keys at WRITE
    time so downstream equi-joins and aggregations on ``bucket_by`` run
    with ZERO exchanges (pinned by test_bucketed_join_no_shuffle). The
    bucketing metadata lives in the catalog, hence saveAsTable rather
    than a path write. At 100 TB this is the standard layout for a fact
    table that is repeatedly joined on the same key."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    def run(df: DataFrame):
        w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
        if sort_by:
            w = w.sortBy(*sort_by)
        if path:
            w = w.option("path", path)
        w.saveAsTable(table)

    return Sink(run, name=f"bucketed:{table}")


def orc_sink(path: str, *, mode: str = "overwrite",
             partition_by: Sequence[str] | None = None, **options) -> Sink:
    return Sink(lambda df: _write(df, path, "orc", mode, partition_by, **options),
                name=f"orc:{path}")


def xml_sink(path: str, *, row_tag: str = "row", root_tag: str = "rows",
             mode: str = "overwrite", **options) -> Sink:
    """XML writer (built-in format since Spark 4)."""

    def run(df: DataFrame):
        (df.write.format("xml").mode(mode)
         .option("rowTag", row_tag).option("rootTag", root_tag)
         .options(**options).save(path))

    return Sink(run, name=f"xml:{path}")
