"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``go_streams_spark.queries`` (one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_streams_spark.queries import QUERIES, oracle_for  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """Oracle SQL per query. The driver calls this with no argument and
    gets SQL valid at its sf0.01 gate; multi-SF sweeps pass the sweep
    dir so path-bearing oracles (``{SF_DIR}`` placeholder, e.g.
    parquet_metadata()) follow the data."""
    from go_streams_spark.queries import GATE_SF_DIR
    return oracle_for(sf_dir or GATE_SF_DIR)


def rows_only() -> dict[str, str]:
    """The (deliberately tiny) set of ``queries()`` entries with NO
    ``oracle_sql()`` twin, each mapped to the independent parity test
    that pins its exactness instead. A sampled ``no_oracle`` row in
    the gate is one of these, by design:

    - ``approx_distinct_users``: HyperLogLog register layouts differ
      across engines, so no cross-engine value equality exists; the
      oracle-checked exact sibling is ``kmv_distinct_users``.

    (``compression_ratio_docs`` left this set in round 7: it now has a
    PER-SF GENERATED oracle — the generator bakes independent
    CPython-zlib literals into a VALUES table, since DuckDB ships no
    compressor.)
    """
    return {
        "approx_distinct_users":
            "tests/test_functions.py::test_approx_distinct_within_tolerance",
    }
