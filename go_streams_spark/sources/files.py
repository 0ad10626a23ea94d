"""File and object-store sources.

Reference mapping (SURVEY §2.4):
  - FileSource line-by-line text (extension/file.go:25,44-80) ->
    ``spark.read.text`` — one ``value`` string column, identical shape.
  - ReaderSource framed bytes (extension/source_reader.go:15) ->
    ``binaryFile`` + optional mapInPandas splitter.
  - S3/GCS/Azure object sources (aws/s3.go:50, gcp/storage.go:45,
    azure/blob_storage.go:43) -> the SAME readers pointed at
    ``s3a://`` / ``gs://`` / ``abfss://`` URIs — Spark's FileSystem
    layer handles listing + split parallelism (the reference's
    ``Parallelism`` worker pool, aws/s3.go:115-167, is the scheduler's
    job here). NOTE the reference reads only the first ChunkSize bytes
    of each S3 object (aws/s3.go:137-144) — we read whole objects,
    which is the correct behavior at scale.

Columnar formats (parquet/csv/json) are beyond-reference upgrades: the
reference is line-oriented only (extension/file.go:63-74). All readers
keep predicate pushdown and partition pruning intact — pass filters
AFTER load and Catalyst pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def text_source(spark: SparkSession, path: str, *, whole_text: bool = False,
                line_sep: str | None = None) -> DataFrame:
    """Line-oriented text — the FileSource analogue. ``line_sep`` covers
    custom framing (the ElementReader hook, extension/source_reader.go:15)."""
    reader = spark.read
    opts = {}
    if whole_text:
        opts["wholetext"] = "true"
    if line_sep is not None:
        opts["lineSep"] = line_sep
    return reader.options(**opts).text(path)


def json_source(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def csv_source(spark: SparkSession, path: str, schema=None, *, header: bool = True,
               **options) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).csv(path)


def parquet_source(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def binary_source(spark: SparkSession, path: str, *, path_glob: str | None = None) -> DataFrame:
    """Whole-object binary read -> (path, modificationTime, length,
    content) — the object-store source shape ({Key, Data},
    aws/s3.go:181-189). Works against local, s3a://, gs://, abfss://."""
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def framed_binary_source(spark: SparkSession, path: str, *, delimiter: bytes = b"\n",
                         path_glob: str | None = None,
                         output: str = "frame") -> DataFrame:
    """ReaderSource with pluggable framing (extension/source_reader.go:15,
    60-97): read whole objects via binaryFile, split each into frames on
    a byte delimiter with an Arrow-batched mapInPandas splitter.

    Framing runs fully parallel per object partition; one object's
    frames never leave their task until a downstream op asks for a
    shuffle. For delimiter-free fixed-width framing, slice in the same
    splitter. (Line-oriented text should use ``text_source`` — this path
    is for binary protocols.)
    """
    from typing import Iterator
    import pandas as pd

    raw = binary_source(spark, path, path_glob=path_glob)

    def _split(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            paths, frames = [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                for fr in bytes(content).split(delimiter):
                    if fr:
                        paths.append(p)
                        frames.append(fr)
            yield pd.DataFrame({"path": paths, output: frames})

    return raw.select("path", "content").mapInPandas(
        _split, schema=f"path string, {output} binary")


def orc_source(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC columnar read — same pushdown/pruning story as parquet
    (built-in format; the second columnar lake format in the wild)."""
    return spark.read.options(**options).orc(path)


def xml_source(spark: SparkSession, path: str, *, row_tag: str,
               schema=None, **options) -> DataFrame:
    """XML read (built-in format since Spark 4): one row per ``rowTag``
    element — the document-feed ingestion shape."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)
