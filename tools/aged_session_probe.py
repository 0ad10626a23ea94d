"""Aged-session timing probe — reproduce the DRIVER's measurement
condition (one long-lived session that has already run a prefix of the
bench) and time target queries with bench.py's exact statistic
(min-of-3, release_tracked AFTER the loop).

The r9 driver numbers showed link_prediction_parts at 10.6 s @32c in
the full bench session but 3.4 s in a fresh session (tools/
scaling_probe.py) — the regression lives in (session age x core
count), so the bisect harness must be able to dial session age.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/aged_session_probe.py SF_DIR \
      [--warmup N] [--runs N] [--conf key=value ...] query [query ...]

--warmup N: run the first N bench-order queries once each (N=-1: every
bench query that precedes the FIRST target in bench order). Prints one
JSON line {"cpus", "warmup", "conf", "queries": {name: {min, all}}}.
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
    runs = 3
    warmup = 0
    conf: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--runs":
            runs = int(rest[i + 1]); i += 2
        elif rest[i] == "--warmup":
            warmup = int(rest[i + 1]); i += 2
        elif rest[i] == "--conf":
            k, _, v = rest[i + 1].partition("="); conf[k] = v; i += 2
        else:
            names.append(rest[i]); i += 1
    if not names:
        print(__doc__)
        sys.exit(2)

    from go_streams_spark.session import get_spark
    from go_streams_spark.plans import release_tracked
    from go_streams_spark.queries import QUERIES
    from bench import BENCH_QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(1)

    if warmup == -1:
        warmup = min(BENCH_QUERIES.index(n) for n in names if n in BENCH_QUERIES)
    warm_list = [n for n in BENCH_QUERIES[:warmup] if n in QUERIES
                 and n not in names]

    spark = get_spark("aged-session-probe", extra_conf=conf or None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    t0 = time.perf_counter()
    for name in warm_list:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        release_tracked()
    warm_sec = round(time.perf_counter() - t0, 1)
    print(f"warmup: {len(warm_list)} queries in {warm_sec}s", file=sys.stderr)

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe: {name}")
        sample = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            sample.append(round(time.perf_counter() - t0, 3))
        release_tracked()  # bench.py order: release AFTER the min-of-N loop
        out[name] = {"min": min(sample), "all": sample}
        print(f"{name}: {out[name]['min']} {sample}", file=sys.stderr)
    print(json.dumps({"cpus": cpus, "warmup": len(warm_list),
                      "warmup_sec": warm_sec, "conf": conf, "queries": out}))


if __name__ == "__main__":
    main()
