"""Compute measured per-query scaling exponents from two bench detail
files (BENCH_DETAIL.json copies) taken at different scale factors.

Usage:
    python tools/scaling_report.py SMALL.json BIG.json [data_ratio]

``data_ratio`` is the volume ratio between the two runs (default 10).
Prints a markdown table sorted by wall-time ratio descending:

    query | small s | big s | ratio | exponent

``exponent`` = log(time_ratio)/log(data_ratio) — the empirical alpha in
t ~ volume^alpha. Constant per-query overhead (session, planning, tiny
dims) deflates ratios for sub-second queries, so exponents are only
meaningful when the BIG time is well above overhead; the table flags
rows with big-time < 1 s as "(overhead-bound)" instead of an exponent.
"""

from __future__ import annotations

import json
import math
import sys


def report(small_path: str, big_path: str, data_ratio: float = 10.0):
    sj, bj = json.load(open(small_path)), json.load(open(big_path))
    small, big = sj["queries"], bj["queries"]
    # column labels from the files themselves, not hard-coded SFs
    s_label = f"sf{sj.get('sf', '?')} s"
    b_label = f"sf{bj.get('sf', '?')} s"
    rows, skipped = [], []
    for q in sorted(set(small) & set(big)):
        s, b = small[q], big[q]
        if s <= 0 or b <= 0:  # skipped/failed query: no meaningful ratio
            skipped.append((q, s, b))
            continue
        ratio = b / s
        exp = math.log(ratio) / math.log(data_ratio)
        rows.append((q, s, b, ratio, exp))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {s_label} | {b_label} | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q, s, b, ratio, exp in rows:
        e = f"{exp:.2f}" if b >= 1.0 else "(overhead-bound)"
        print(f"| {q} | {s:.2f} | {b:.2f} | {ratio:.1f}x | {e} |")
    # zero-time rows go AFTER the header so the table renders; they are
    # table rows (not a footnote) so a grep of the table still sees them
    for q, s, b in skipped:
        print(f"| {q} | {s:.2f} | {b:.2f} | (zero-time entry, skipped) | |")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    if tot_s > 0 and tot_b > 0:
        print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s "
              f"({tot_b / tot_s:.1f}x on {data_ratio:g}x data; "
              f"exponent {math.log(tot_b / tot_s) / math.log(data_ratio):.2f})")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: scaling_report.py SMALL.json BIG.json [data_ratio]")
    report(sys.argv[1], sys.argv[2],
           float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
