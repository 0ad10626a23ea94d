

def test_skew_report_hand_computed(spark):
    """Hand-built skewed key distribution: 1000 rows on one hot key,
    10 rows on each of 50 cold keys -> every report field verified
    against the closed-form values."""
    from go_streams_spark.functions.checks import skew_report
    import pytest as _pytest
    rows = [("hot",)] * 1000 + [(f"k{i:02d}",) for i in range(50)
                                for _ in range(10)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"], target_factor=4, top_k=5).collect()[0]
    n_rows, n_keys = 1500, 51
    mean = n_rows / n_keys
    assert r["n_rows"] == n_rows and r["n_keys"] == n_keys
    assert r["mean_rows"] == round(mean, 4)
    assert r["max_rows"] == 1000
    assert r["skew_ratio"] == round(1000 / mean, 4)
    # top5 = hot(1000) + four cold keys(10 each)
    assert r["top5_share"] == round(1040 / 1500, 4)
    assert r["top1_key"] == "hot"
    import math
    assert r["salt_buckets"] == max(1, math.ceil(1000 / (4 * mean)))
    # uniform data needs no salting
    uni = spark.createDataFrame([(f"k{i}",) for i in range(20)
                                 for _ in range(10)], "k string")
    assert skew_report(uni, ["k"]).collect()[0]["salt_buckets"] == 1
    with _pytest.raises(ValueError, match="keys"):
        skew_report(df, [])
    with _pytest.raises(ValueError, match="target_factor"):
        skew_report(df, ["k"], target_factor=0)


def test_fd_report_hand_computed(spark):
    from go_streams_spark.functions.checks import fd_report
    import pytest as _pytest
    rows = [("a", 1, "x"), ("a", 1, "x"), ("a", 2, "x"),  # a -> x ok
            ("b", 1, "y"), ("b", 2, "z"),                 # b violates
            ("c", 9, "w")]
    df = spark.createDataFrame(rows, "k string, junk int, v string")
    r = fd_report(df, ["k"], "v").collect()[0]
    assert (r["n_groups"], r["n_violating_groups"], r["holds"]) == (3, 1, False)
    assert r["violation_share"] == round(1 / 3, 4)
    assert r["example_key"] == "b"
    ok = fd_report(df.where("k <> 'b'"), ["k"], "v").collect()[0]
    assert ok["holds"] is True and ok["example_key"] is None
    # composite lhs
    comp = fd_report(df, ["k", "junk"], "v").collect()[0]
    assert comp["holds"] is True and comp["n_groups"] == 5
    with _pytest.raises(ValueError, match="required"):
        fd_report(df, [], "v")
    with _pytest.raises(ValueError, match="lhs"):
        fd_report(df, ["v"], "v")


def test_quantile_normalize_aligns_distributions(spark):
    """After QN every group has the identical value multiset; rank
    order within groups is preserved; unequal group sizes fail loudly;
    integer rank-means match a NumPy reference exactly."""
    from go_streams_spark.functions.checks import quantile_normalize
    import numpy as np
    import pytest as _pytest
    ga = [3, 1, 4, 1, 5, 9, 2, 6]          # skewed-ish
    gb = [100, 80, 60, 40, 20, 10, 5, 1]   # different scale entirely
    rows = ([(i, "a", v) for i, v in enumerate(ga)]
            + [(100 + i, "b", v) for i, v in enumerate(gb)])
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, value_col="v", group_col="g",
                             id_col="id").collect()
    qa = sorted(r["qnorm"] for r in out if r["g"] == "a")
    qb = sorted(r["qnorm"] for r in out if r["g"] == "b")
    assert qa == qb  # identical distribution after QN
    ref = np.round((np.sort(ga) + np.sort(gb)) / 2, 4)
    assert qa == list(ref)
    # within-group monotonicity: higher raw value -> higher qnorm
    for g, vals in (("a", ga), ("b", gb)):
        got = {r["id"]: r["qnorm"] for r in out if r["g"] == g}
        base = 0 if g == "a" else 100
        order = sorted(range(len(vals)), key=lambda i: (vals[i], base + i))
        q = [got[base + i] for i in order]
        assert q == sorted(q)
    bad = spark.createDataFrame(rows + [(999, "a", 7)], "id long, g string, v long")
    with _pytest.raises(ValueError, match="equal group sizes"):
        quantile_normalize(bad, value_col="v", group_col="g", id_col="id")


def test_bootstrap_mean_ci_semantics(spark):
    """Poisson-bootstrap CI sanity: weights average ~1 (so replicate
    means are unbiased), the interval brackets the point mean, is
    ordered, and narrows roughly as 1/sqrt(n) when the sample grows."""
    from pyspark.sql import functions as F
    from go_streams_spark.functions.checks import (bootstrap_mean_ci,
                                                   poisson_bootstrap_weight)

    # weight distribution: mean ~ Poisson(1) mean = 1
    ids = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    wbar = ids.select(poisson_bootstrap_weight(
        F.col("k"), F.lit("0")).alias("w")).agg(F.avg("w")).collect()[0][0]
    assert 0.9 < wbar < 1.1, wbar

    def ci(n):
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("x"))
        r = bootstrap_mean_ci(df, key_col="k", value_col="x",
                              replicates=100).collect()[0]
        assert r["n_replicates"] == 100
        assert r["ci_low"] <= r["point_mean"] <= r["ci_high"]
        return r["ci_high"] - r["ci_low"]

    w_small, w_big = ci(400), ci(6400)
    # 16x the data -> ~4x narrower; allow generous slack
    assert w_big < w_small / 2, (w_small, w_big)


def test_bootstrap_grouped_matches_global_on_single_group(spark):
    """With one group the grouped CI must equal the global one exactly
    (same weights, same ranks) — pins that grouping changes the
    parallel structure, not the statistics."""
    from pyspark.sql import functions as F
    from go_streams_spark.functions.checks import (
        bootstrap_mean_ci, bootstrap_mean_ci_grouped)

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 37).alias("x"),
        F.lit("g").alias("grp"))
    a = bootstrap_mean_ci(df, key_col="k", value_col="x",
                          replicates=60).collect()[0]
    b = bootstrap_mean_ci_grouped(df, key_col="k", value_col="x",
                                  group_cols=["grp"],
                                  replicates=60).collect()[0]
    assert (a["point_mean"], a["ci_low"], a["ci_high"]) == \
        (b["point_mean"], b["ci_low"], b["ci_high"])


def test_dp_noisy_counts_mechanism(spark):
    """DP mechanism pins: the CDF table is a valid monotone CDF ending
    at exactly 1e6; noise is symmetric-ish and mode-0 (k=0 has the
    largest single mass); noisy counts clamp at zero; the release is
    reproducible (same seed -> same noise) and seed-sensitive."""
    from go_streams_spark.functions.checks import (dp_laplace_cdf_micro,
                                                   dp_noisy_counts)
    cdf = dp_laplace_cdf_micro()
    assert cdf[-1][1] == 1_000_000
    assert all(b[1] >= a[1] for a, b in zip(cdf, cdf[1:]))
    masses = {k: c - p for (_, p), (k, c) in zip(cdf, cdf[1:])}
    assert max(masses, key=lambda k: masses[k]) == 0

    df = spark.createDataFrame([(i, "a" if i % 3 else "b")
                                for i in range(60)], "i long, g string")
    r1 = {r["g"]: r for r in dp_noisy_counts(df, "g", seed=7).collect()}
    r2 = {r["g"]: r for r in dp_noisy_counts(df, "g", seed=7).collect()}
    assert {g: r["noisy_count"] for g, r in r1.items()} == \
        {g: r["noisy_count"] for g, r in r2.items()}
    assert all(r["noisy_count"] >= 0 for r in r1.values())
    assert all(abs(r["noise"]) <= 20 for r in r1.values())
    # a different seed draws different uniforms for at least one group
    r3 = {r["g"]: r["u_micro"]
          for r in dp_noisy_counts(df, "g", seed=8).collect()}
    assert any(r3[g] != r1[g]["u_micro"] for g in r3)
    import pytest
    with pytest.raises(ValueError):
        dp_noisy_counts(df, "g", epsilon_micro=0)


def test_kaplan_meier_textbook_case(spark):
    """Hand-computed KM on the classic small example: durations
    [1e,2e,2e,3c,4e,5c] (e=event, c=censored).
      t=1: n=6 d=1 -> S = 5/6
      t=2: n=5 d=2 -> S = 5/6 * 3/5 = 1/2
      t=4: n=2 d=1 -> S = 1/2 * 1/2 = 1/4
    Censored subjects shrink the risk set without a step."""
    from go_streams_spark.functions.checks import kaplan_meier
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1), (3, 0), (4, 1), (5, 0)],
        "duration long, ev int")
    rows = {r["t"]: r for r in kaplan_meier(
        df, duration_col="duration", event_col="ev").collect()}
    assert set(rows) == {1, 2, 4}
    assert (rows[1]["n_risk"], rows[1]["n_events"]) == (6, 1)
    assert rows[1]["survival_micro"] == (1_000_000 * 5) // 6
    assert (rows[2]["n_risk"], rows[2]["n_events"]) == (5, 2)
    assert rows[2]["survival_micro"] == ((1_000_000 * 5) // 6 * 3) // 5
    assert (rows[4]["n_risk"], rows[4]["n_events"]) == (2, 1)
    assert rows[4]["survival_micro"] == \
        (((1_000_000 * 5) // 6 * 3) // 5 * 1) // 2


def test_markov_attribution_hand_chain(spark):
    """Hand journey set where one channel is the sole conversion path:
    u1 view->click->purchase, u2 view->purchase, u3 view (no purchase).
    Removing 'view' kills ALL conversions (every journey enters through
    it) -> removal drop = base, share dominated by view; removing
    'error' (never seen) changes nothing -> zero drop. Transition
    counts and value iteration verified against the shared helper."""
    import datetime as dt
    from go_streams_spark.functions.checks import (
        markov_attribution, markov_conversion_value,
        markov_transition_counts)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, "view"), (2, 1, t0.replace(hour=1), "click"),
        (3, 1, t0.replace(hour=2), "purchase"),
        (4, 2, t0, "view"), (5, 2, t0.replace(hour=1), "purchase"),
        (6, 3, t0, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    counts = {(r["from_state"], r["to_state"]): r["n"]
              for r in markov_transition_counts(df).collect()}
    assert counts == {("start", "view"): 3, ("view", "click"): 1,
                      ("click", "conv"): 1, ("view", "conv"): 1,
                      ("view", "null"): 1}
    base = markov_conversion_value(counts)
    assert base > 0
    assert markov_conversion_value(counts, removed="view") == 0
    att = {r["channel"]: r for r in markov_attribution(df).collect()}
    assert att["view"]["removal_drop_micro"] == 1_000_000  # kills base
    assert att["error"]["removal_drop_micro"] == 0
    assert att["view"]["share_micro"] >= att["click"]["share_micro"]
    total_share = sum(r["share_micro"] for r in att.values())
    assert 999_990 <= total_share <= 1_000_000  # trunc-div shortfall only


def test_conformal_coverage_guarantee(spark, sf_dir):
    """Split conformal's finite-sample guarantee: empirical test
    coverage must be >= 1 - alpha (minus a small finite-sample slack)
    and q_hat must be a real calibration score (non-negative)."""
    from go_streams_spark.queries import QUERIES
    r = QUERIES["conformal_calibration"](spark, sf_dir).collect()[0]
    assert r["alpha_micro"] == 100_000
    assert r["n_cal"] > 0 and r["n_test"] > 0
    assert r["qhat_micro"] >= 0
    # >= 90% coverage with 2% finite-sample slack at these corpus sizes
    assert r["coverage_micro"] >= 880_000, r


def test_offpolicy_ips_identities(spark, sf_dir):
    """IPS/SNIPS identities: the always_purchase policy matches exactly
    the purchase rows, its SNIPS equals the mean purchase reward, and
    IPS = SNIPS * (5 * n_matched / n) (the importance-weight mass)."""
    from go_streams_spark.queries import QUERIES
    rows = {r["policy"]: r for r in
            QUERIES["offpolicy_ips_eval"](spark, sf_dir).collect()}
    ap = rows["always_purchase"]
    assert 0 < ap["n_matched"] < ap["n_logged"]
    # IPS ~= SNIPS * 5 * matched / n (trunc-div rounding slack)
    approx = ap["snips_micro"] * 5 * ap["n_matched"] // ap["n_logged"]
    assert abs(ap["ips_micro"] - approx) <= 5, ap
    dr = rows["daypart_rule"]
    assert dr["n_matched"] > 0


def test_offpolicy_dr_identities(spark, sf_dir):
    """DR pinned against an independent pandas replay of the estimator
    (per-action mean reward model, uniform 1/5 propensity, both target
    policies), and its IPS term cross-checked against the IPS query."""
    from go_streams_spark.queries import QUERIES, _t
    rows = {r["policy"]: r for r in
            QUERIES["offpolicy_dr_eval"](spark, sf_dir).collect()}
    ips_rows = {r["policy"]: r for r in
                QUERIES["offpolicy_ips_eval"](spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", "ts").toPandas()
    import math
    acts = ev["event_type"].tolist()
    rs = [int(math.floor(v * 1_000_000 + 0.5)) for v in ev["value"]]
    hrs = [t.hour for t in ev["ts"]]
    q = {}
    for a in set(acts):
        vals = [r for r, aa in zip(rs, acts) if aa == a]
        q[a] = sum(vals) // len(vals)
    for pol, pi in (("daypart_rule",
                     lambda h: "view" if h < 12 else "click"),
                    ("always_purchase", lambda h: "purchase")):
        n = len(acts)
        dm = sum(q[pi(h)] for h in hrs) // n
        ips = sum(5 * r for r, a, h in zip(rs, acts, hrs)
                  if pi(h) == a) // n
        dr = sum(q[pi(h)] + (5 * (r - q[a]) if pi(h) == a else 0)
                 for r, a, h in zip(rs, acts, hrs)) // n
        got = rows[pol]
        assert got["n_logged"] == n
        assert got["dm_micro"] == dm, pol
        assert got["ips_micro"] == ips == ips_rows[pol]["ips_micro"], pol
        assert got["dr_micro"] == dr, pol


def test_diff_in_diff_synthetic_effect(spark):
    """Planted-effect recovery: control is flat (10 -> 10), treated
    jumps (10 -> 25) post-midpoint -> DiD = +15 exactly; a common time
    shock added to BOTH groups cancels out of the estimate."""
    import datetime as dt
    from go_streams_spark.queries import QUERIES
    import go_streams_spark.queries as qq
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(10):
        post = day >= 5
        shock = 3.0 if post else 0.0  # common time shock
        for rep in range(4):
            eid += 1  # treated: even user ids
            rows.append((eid, 2, t0 + dt.timedelta(days=day, minutes=rep),
                         "view", (25.0 if post else 10.0) + shock))
            eid += 1
            rows.append((eid, 3, t0 + dt.timedelta(days=day, minutes=rep),
                         "view", 10.0 + shock))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    orig = qq._t
    try:
        qq._t = lambda spark_, sf_, name: df
        r = QUERIES["diff_in_diff_value"](spark, "unused").collect()[0]
    finally:
        qq._t = orig
    assert r["did_micro"] == 15_000_000, r
    # the shock moved both post means but not the estimate
    assert r["post_ctrl_micro"] - r["pre_ctrl_micro"] == 3_000_000
