"""Ad-hoc per-query timing at any SF dir — the harness behind the
SCALE.md exponent tables (same statistic as bench.py: noop-forced,
1 warm + min of the remaining runs, tracked persists released between
runs).

Usage: python tools/time_queries.py SF_DIR query [query ...]
       python tools/time_queries.py SF_DIR --runs 3 query ...

Prints one JSON line {query: seconds}. Exponent between two SFs =
log(t_big/t_small) / log(volume_ratio); see tools/scaling_report.py
for the two-detail-file variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(2)
    sf_dir = args[0]
    rest = list(args[1:])
    # accept --runs N anywhere after SF_DIR (previously only first,
    # which silently timed nothing / died mid-run on later typos)
    runs = 3
    if "--runs" in rest:
        i = rest.index("--runs")
        if i + 1 >= len(rest):
            print("--runs needs a value", file=sys.stderr)
            sys.exit(2)
        runs = int(rest[i + 1])
        del rest[i:i + 2]
    if not rest:
        print(__doc__)
        sys.exit(2)

    from go_streams_spark.session import get_spark
    from go_streams_spark.plans import release_tracked
    from go_streams_spark.queries import QUERIES

    # validate every name BEFORE timing any, so one typo can't discard
    # minutes of completed timings
    unknown = [n for n in rest if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(1)

    spark = get_spark("time-queries")
    out = {}
    for name in rest:
        sample = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            sample.append(time.perf_counter() - t0)
            release_tracked()
        # run 1 pays codegen/JIT; min of the rest is the statistic
        out[name] = round(min(sample[1:]) if len(sample) > 1
                          else sample[0], 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
