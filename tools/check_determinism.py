"""Cross-run determinism audit: run every registry query TWICE under
different ``spark.sql.shuffle.partitions`` (different partitioning =>
different task boundaries, Arrow batch shapes, accumulation orders,
BLAS call shapes) and compare order-insensitive value hashes.

This is the harness for the bug class the correctness gate can only
catch by luck: a query whose values depend on partitioning (float
accumulation order, first()-without-order, per-partition counters
leaking into output) is green against its oracle on one run and red on
another — e.g. the round-5 ``ann_recall_report`` flake, where a
float-BLAS rounding flip at a 0.5e-6 midpoint moved a rank-5 tie-break
only under some thread counts. Every query here is REQUIRED to be a
pure function of its input tables.

Usage: python tools/check_determinism.py [sf_dir] [query ...]
(default sf_dir /root/testdata/sf0.001 — shapes, not volume, are what
vary with partitioning). Exits 1 on any mismatch.

Every PASSING query is recorded (merged) into DETERMINISM_AUDIT.json
at the repo root — {query: {hash, rows, sf_dir}} plus a count — and
entries for queries no longer in the registry are pruned on write.
tests/test_determinism_manifest.py asserts the manifest covers the
full registry, so REGISTERING A QUERY WITHOUT AUDITING IT FAILS THE
SUITE (the round-6/round-7 audit-staleness drift, mechanized away).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pandas as pd

MANIFEST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "DETERMINISM_AUDIT.json")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTS_A = "32"
PARTS_B = "7"   # coprime-ish, not a divisor: every boundary moves


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from go_streams_spark.session import get_spark
    from go_streams_spark.plans import release_tracked
    from go_streams_spark.queries import QUERIES

    spark = get_spark("determinism-check")
    failures, errors = [], []
    passed: dict[str, dict] = {}
    names = [n for n in QUERIES if not only or n in only]
    for name in names:
        hashes = []
        for parts in (PARTS_A, PARTS_B):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            try:
                pdf = QUERIES[name](spark, sf_dir).toPandas()
                hashes.append((value_hash(pdf), len(pdf)))
            except Exception as e:
                errors.append(name)
                print(f"ERROR {name} @parts={parts}: "
                      f"{type(e).__name__}: {e}")
                hashes = None
                break
            finally:
                release_tracked()
        if hashes is None:
            continue
        (ha, na), (hb, nb) = hashes
        if ha != hb:
            failures.append(name)
            print(f"NONDET {name}: parts={PARTS_A} hash={ha[:12]} "
                  f"rows={na} vs parts={PARTS_B} hash={hb[:12]} rows={nb}")
        else:
            passed[name] = {"hash": ha, "rows": na, "sf_dir": sf_dir}
            print(f"OK    {name}: {na} rows, hash stable across "
                  f"partitionings")
    spark.conf.set("spark.sql.shuffle.partitions", PARTS_A)
    # Merge passing results into the manifest; prune deregistered
    # queries so the coverage test can assert strict set equality.
    manifest = {"parts": [PARTS_A, PARTS_B], "queries": {}}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            manifest = json.load(f)
    manifest["parts"] = [PARTS_A, PARTS_B]
    qs = {k: v for k, v in manifest.get("queries", {}).items()
          if k in QUERIES}
    qs.update(passed)
    manifest["queries"] = dict(sorted(qs.items()))
    manifest["audited_count"] = len(qs)
    manifest["registry_count"] = len(QUERIES)
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"manifest: {manifest['audited_count']}/"
          f"{manifest['registry_count']} registry queries audited "
          f"-> {MANIFEST}")
    print(f"\n{len(failures)} nondeterministic, {len(errors)} errors "
          f"of {len(names)} queries"
          + (f": {failures}" if failures else ""))
    sys.exit(1 if failures or errors else 0)


if __name__ == "__main__":
    main()
