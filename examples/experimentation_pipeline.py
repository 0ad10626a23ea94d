"""Experimentation / decision-science pipeline over the synthetic
events log — the complete causal-evaluation lifecycle in one chain:

1. randomized A/B readout (Welch t-test on purchase vs click value),
2. off-policy evaluation of two candidate policies WITHOUT deploying
   them — direct-method / IPS / SNIPS / doubly-robust estimators side
   by side (the bandit-replay table a decision review reads),
3. split-conformal calibration of the value model backing the DM term
   (distribution-free >= 90% coverage bands, empirically checked),
4. difference-in-differences on the observational panel (treated =
   even user ids, pre/post at the corpus time midpoint) — the
   quasi-experimental cross-check when randomization isn't available.

The 100 TB shape: every estimator is ONE scan of the log plus
broadcast joins against bounded model metadata (a 5-row per-action
reward model, a single quantile offset row) — no collect of event
grain, exact int64 micro-units end to end so reruns are bit-identical.

Run: python examples/experimentation_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_streams_spark import get_spark
from go_streams_spark.queries import QUERIES


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-experimentation")

    ab = QUERIES["ab_test_welch"](spark, sf_dir).collect()[0]
    print(f"a/b (randomized): mean_diff={ab['mean_diff']} "
          f"t_stat={ab['t_stat']} "
          f"(n={ab['n_purchase']}/{ab['n_click']})")

    ips = {r["policy"]: r for r in
           QUERIES["offpolicy_ips_eval"](spark, sf_dir).collect()}
    dr = {r["policy"]: r for r in
          QUERIES["offpolicy_dr_eval"](spark, sf_dir).collect()}
    print("off-policy value table (micro-units per logged event):")
    for pol in sorted(ips):
        print(f"  {pol:16s} DM={dr[pol]['dm_micro']:>10d} "
              f"IPS={ips[pol]['ips_micro']:>10d} "
              f"SNIPS={ips[pol]['snips_micro']:>10d} "
              f"DR={dr[pol]['dr_micro']:>10d} "
              f"(matched {ips[pol]['n_matched']}/{ips[pol]['n_logged']})")
    best = max(dr.values(), key=lambda r: r["dr_micro"])
    print(f"  -> doubly-robust winner: {best['policy']}")

    conf = QUERIES["conformal_calibration"](spark, sf_dir).collect()[0]
    print(f"conformal bands: qhat=±{conf['qhat_micro']} micro at "
          f"alpha={conf['alpha_micro'] / 1e6:.2f}; empirical coverage "
          f"{conf['coverage_micro'] / 1e4:.2f}% over {conf['n_test']} "
          f"held-out rows (guarantee: >= 90%)")

    did = QUERIES["diff_in_diff_value"](spark, sf_dir).collect()[0]
    print(f"diff-in-diff (observational cross-check): "
          f"effect={did['did_micro']} micro "
          f"[treated pre/post {did['pre_treat_micro']}->"
          f"{did['post_treat_micro']}, "
          f"control {did['pre_ctrl_micro']}->{did['post_ctrl_micro']}]")


if __name__ == "__main__":
    main()
