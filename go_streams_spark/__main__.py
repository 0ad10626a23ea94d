"""CLI: run/list/explain the registered queries.

  python -m go_streams_spark list
  python -m go_streams_spark run q1_pricing_summary [--sf-dir DIR] [--limit N]
  python -m go_streams_spark explain q5_local_supplier_volume [--sf-dir DIR]
  python -m go_streams_spark bench [--sf-dir DIR]      (same as bench.py)
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="go_streams_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
    b = sub.add_parser("bench")
    b.add_argument("--sf-dir", default=None)
    args = ap.parse_args(argv)

    from .queries import QUERIES, ORACLE

    if args.cmd == "list":
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLE else "rows-only"
            print(f"{name:36s} [{tag}]")
        return 0

    if args.cmd == "bench":
        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, root)
        import bench
        bench.main()
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    from .session import get_spark
    spark = get_spark(f"gss-{args.cmd}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
