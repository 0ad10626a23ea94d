"""Replicates the driver's smoke checks in one command: a VANILLA
SparkSession (not get_spark), entry() collect, queries()/oracle_sql()
registry shape, and a sample query execution.
Usage: python tools/smoke_entry.py [sample_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    import __spark_entry__ as m
    rows = m.entry(spark).collect()
    q, o = m.queries(), m.oracle_sql()
    extra_oracles = set(o) - set(q)
    print(f"entry_rows={len(rows)} queries={len(q)} oracles={len(o)} "
          f"rows_only={sorted(set(q) - set(o))}")
    assert rows and not extra_oracles
    # every rows-only query must be declared in the manifest (and name
    # the parity test that pins it), and vice versa
    assert set(m.rows_only()) == set(q) - set(o), (
        sorted(set(m.rows_only()) ^ (set(q) - set(o))))
    for name in sys.argv[1:] or ["q1_pricing_summary"]:
        n = q[name](spark, "/root/testdata/sf0.001").count()
        print(f"sample {name}: {n} rows")
    print("SMOKE OK")


if __name__ == "__main__":
    main()
