"""Marketing-analytics pipeline over the synthetic events table — the
conversion-measurement lifecycle end to end: funnel counts ->
positional multi-touch attribution (last/first/linear, exact integer
credit conservation) -> Markov removal-effect attribution (the
data-driven model) -> Kaplan-Meier time-to-conversion curve (never-
purchasers right-censored) -> a differentially-private release of the
per-channel event counts (seeded discrete Laplace).

The 100 TB shape: every stage is user-grain windows + hash aggregates;
the Markov chain's count matrix and the DP CDF table are the only
driver-resident pieces (both bounded model metadata).

Run: python examples/marketing_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_streams_spark import get_spark
from go_streams_spark.queries import QUERIES


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-marketing")

    funnel = QUERIES["funnel_view_click_purchase"](spark, sf_dir).collect()
    print("funnel:", [(r[0], r[1]) for r in funnel][:4])

    credit = QUERIES["attribution_credit"](spark, sf_dir).collect()
    by_model = {}
    for r in credit:
        by_model.setdefault(r["model"], 0)
        by_model[r["model"]] += r["credit_micro"]
    print("positional attribution (credit conserved across models):",
          {m: v for m, v in sorted(by_model.items())})

    markov = QUERIES["markov_attribution"](spark, sf_dir).collect()
    print("markov removal shares:",
          {r["channel"]: r["share_micro"] for r in markov})

    km = QUERIES["kaplan_meier_conversion"](spark, sf_dir).collect()
    tail = min(km, key=lambda r: r["survival_micro"])
    print(f"kaplan-meier: {len(km)} event times, "
          f"terminal survival {tail['survival_micro'] / 1e4:.2f}%")

    dp = QUERIES["dp_noisy_event_counts"](spark, sf_dir).collect()
    print("dp release (eps=1):",
          {r["event_type"]: r["noisy_count"] for r in dp})


if __name__ == "__main__":
    main()
