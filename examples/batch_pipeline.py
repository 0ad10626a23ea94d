"""Canonical bounded pipeline — the Spark-first analogue of the
reference's examples/std/main.go / flow composition tests
(flow/flow_test.go:92-124): Source -> Map -> FlatMap -> Filter -> Sink.

Run: python examples/batch_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import Source, get_spark
from go_streams_spark.operators import Map, FlatMap, Filter
from go_streams_spark.sinks import stdout_sink


def main():
    spark = get_spark("example-batch")
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "value string")
    (Source(df)
     .via(Map(F.upper("value")))
     .via(FlatMap(F.array(F.concat("value", F.lit("*")),
                          F.concat("value", F.lit("**")))))
     .via(Filter(F.col("value").startswith("B") | F.col("value").startswith("C")))
     .to(stdout_sink()))


if __name__ == "__main__":
    main()
