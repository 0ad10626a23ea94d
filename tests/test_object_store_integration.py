"""Env-gated S3-compatible OBJECT-STORE integration tests (round 7,
verdict item #5), mirroring the real-broker pattern of
test_broker_integration.py: the s3a:// readers in sources/files.py are
shape-tested locally (this container has no object store and no
hadoop-aws jar), so this module runs the IDENTICAL text / binary /
framed-binary / parquet round-trips the local tests run — against any
S3-compatible endpoint (MinIO, localstack, real S3) when one is
provided:

    S3_ENDPOINT=http://minio:9000      -> endpoint URL (required)
    S3_BUCKET=gss-it                   -> bucket (must exist; required)
    S3_ACCESS_KEY / S3_SECRET_KEY      -> credentials (required)
    S3_JARS=/path/hadoop-aws.jar,/path/aws-sdk-bundle.jar
        -> local jars for the s3a FileSystem (pyspark does not bundle
           hadoop-aws); if unset, spark.jars.packages pulls
           org.apache.hadoop:hadoop-aws matching the bundled hadoop
           client (needs network on first run).

When S3_ENDPOINT is missing the whole module SKIPS — it never silently
falls back to local paths (test_sources_sinks.py already covers those
with the same reader code; Spark's FileSystem layer is the only thing
that changes with the scheme, which is exactly what this suite
exercises: listing, split planning, and whole-object reads over the
object-store protocol — the reference's aws/s3.go:50,86-167 surface).

A dedicated SparkSession is built per module (the shared fixture's
session has no s3a config); path-style access is forced because MinIO
defaults to it.
"""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("S3_ENDPOINT"),
    reason="S3_ENDPOINT not set (S3-compatible object store required)")


def _hadoop_version() -> str:
    import glob

    import pyspark
    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars", "hadoop-client-api-*.jar"))
    return (os.path.basename(jars[0])
            .replace("hadoop-client-api-", "").replace(".jar", "")
            if jars else "3.4.2")


@pytest.fixture(scope="module")
def s3_spark():
    for var in ("S3_BUCKET", "S3_ACCESS_KEY", "S3_SECRET_KEY"):
        if not os.environ.get(var):
            pytest.skip(f"{var} not set")
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master("local[4]")
         .appName("gss-object-store-it")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.hadoop.fs.s3a.endpoint", os.environ["S3_ENDPOINT"])
         .config("spark.hadoop.fs.s3a.access.key",
                 os.environ["S3_ACCESS_KEY"])
         .config("spark.hadoop.fs.s3a.secret.key",
                 os.environ["S3_SECRET_KEY"])
         .config("spark.hadoop.fs.s3a.path.style.access", "true")
         .config("spark.hadoop.fs.s3a.connection.ssl.enabled",
                 os.environ["S3_ENDPOINT"].startswith("https")
                 and "true" or "false"))
    if os.environ.get("S3_JARS"):
        b = b.config("spark.jars", os.environ["S3_JARS"])
    else:
        b = b.config("spark.jars.packages",
                     f"org.apache.hadoop:hadoop-aws:{_hadoop_version()}")
    spark = b.getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture()
def s3_prefix(s3_spark):
    """A uuid-unique s3a:// prefix per test so reruns against a shared
    bucket never collide (same discipline as the broker suite's
    uuid-unique stream names)."""
    return f"s3a://{os.environ['S3_BUCKET']}/gss-it/{uuid.uuid4().hex}"


def test_text_roundtrip_s3(s3_spark, s3_prefix):
    """FileSource/FileSink over the object store — the exact scenario of
    test_sources_sinks.py::test_text_roundtrip."""
    from go_streams_spark.sinks.files import text_sink
    from go_streams_spark.sources.files import text_source

    path = f"{s3_prefix}/lines"
    df = s3_spark.createDataFrame([("a",), ("b",), ("c",)], "value string")
    text_sink(path)(df)
    back = text_source(s3_spark, path)
    assert sorted(r.value for r in back.collect()) == ["a", "b", "c"]


def test_binary_object_shape_s3(s3_spark, s3_prefix):
    """binaryFile whole-object read: (path, modificationTime, length,
    content) — the {Key, Data} surface of aws/s3.go:181-189."""
    from go_streams_spark.sources.files import binary_source

    path = f"{s3_prefix}/blobs"
    payload = b"\x00\x01frame-one\x02"
    (s3_spark.createDataFrame([(payload,)], "content binary")
     .coalesce(1).write.mode("overwrite").format("parquet")
     .save(f"{s3_prefix}/seed"))
    # write a raw object through the same FileSystem (text write of one
    # binary-safe line is lossy; use parquet seed -> re-read -> binary)
    jvm_path = f"{path}/obj.bin"
    hconf = s3_spark.sparkContext._jsc.hadoopConfiguration()
    jvm = s3_spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(jvm_path)
    fs = p.getFileSystem(hconf)
    out = fs.create(p, True)
    out.write(bytearray(payload))
    out.close()

    rows = binary_source(s3_spark, path).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payload
    assert rows[0]["length"] == len(payload)
    assert rows[0]["path"].endswith("obj.bin")


def test_framed_binary_split_s3(s3_spark, s3_prefix):
    """ReaderSource framing over object-store reads — frames split
    executor-side, exactly as test_sources_sinks.py::
    test_framed_binary_source does locally."""
    from go_streams_spark.sources.files import framed_binary_source

    path = f"{s3_prefix}/framed"
    hconf = s3_spark.sparkContext._jsc.hadoopConfiguration()
    jvm = s3_spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/frames.bin")
    fs = p.getFileSystem(hconf)
    out = fs.create(p, True)
    out.write(bytearray(b"one|two|three"))
    out.close()

    frames = framed_binary_source(s3_spark, path, delimiter=b"|").collect()
    assert sorted(bytes(r["frame"]) for r in frames) == \
        [b"one", b"three", b"two"]


def test_parquet_roundtrip_pushdown_s3(s3_spark, s3_prefix):
    """Columnar round-trip + the property that matters at 100 TB:
    predicate pushdown reaches the s3a scan (PushedFilters non-empty),
    so a selective read over the object store moves predicates, not
    objects."""
    from go_streams_spark.plans.inspect import pushed_filters
    from go_streams_spark.sources.files import parquet_source

    path = f"{s3_prefix}/tbl"
    (s3_spark.range(100).selectExpr("id", "id % 7 AS k")
     .write.mode("overwrite").parquet(path))
    df = parquet_source(s3_spark, path).where("k = 3")
    assert pushed_filters(df), "filter must push into the s3a parquet scan"
    assert df.count() == 15


def test_csv_json_roundtrip_s3(s3_spark, s3_prefix):
    from go_streams_spark.sinks.files import csv_sink, json_sink
    from go_streams_spark.sources.files import csv_source, json_source

    data = [(1, "x"), (2, "y")]
    df = s3_spark.createDataFrame(data, "id bigint, s string")
    csv_sink(f"{s3_prefix}/c")(df)
    json_sink(f"{s3_prefix}/j")(df)
    got_c = csv_source(s3_spark, f"{s3_prefix}/c",
                       schema="id bigint, s string")
    got_j = json_source(s3_spark, f"{s3_prefix}/j",
                        schema="id bigint, s string")
    assert sorted((r.id, r.s) for r in got_c.collect()) == data
    assert sorted((r.id, r.s) for r in got_j.collect()) == data
