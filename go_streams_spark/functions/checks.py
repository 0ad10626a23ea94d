"""Data-quality constraint checking (Deequ-style, DataFrame-native).

A production ingestion pipeline validates every batch before it reaches
training: completeness (null fraction), uniqueness, value ranges, set
membership. Each constraint compiles to a conditional aggregate over ONE
shared scan — checking 20 constraints costs one pass with map-side
partial aggregation, not 20 jobs (the naive per-check `df.filter(...)
.count()` loop is 20 scans).

No reference analogue (go-streams ships no validation operators); this
is part of the beyond-reference training-pipeline surface (SURVEY §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` marks each BAD row."""
    name: str
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"{col}_in_range",
                 ~F.col(col).between(F.lit(lo), F.lit(hi)))


def is_in(col: str, allowed: Sequence) -> Check:
    return Check(f"{col}_is_in", ~F.col(col).isin(list(allowed)))


def matches(col: str, regex: str) -> Check:
    return Check(f"{col}_matches", ~F.col(col).rlike(regex))


def check_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every check in ONE aggregation pass.

    Returns one row per check: ``(check, n_rows, n_violations,
    violation_frac)`` — long format via a single Expand over the
    aggregated counters (constant-size state per check).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in checks:
        aggs.append(F.count(F.when(c.violation, F.lit(1))).alias(c.name))
    row = df.agg(*aggs)
    pairs = []
    for c in checks:
        pairs.extend([F.lit(c.name), F.col(c.name)])
    stacked = row.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(checks)), *pairs).alias("check", "n_violations"))
    return stacked.select(
        "check", "n_rows", "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6)
         .alias("violation_frac"))


def uniqueness_report(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Duplicate-key accounting: ``(n_keys, n_dup_keys, n_dup_rows)``.

    Separate from :func:`check_report` because uniqueness needs a keyed
    aggregate (one shuffle on the key), not a global conditional count.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when(F.col("c") > 1, F.lit(1))).alias("n_dup_keys"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
         .cast("long").alias("n_dup_rows"))


def isotonic_calibration(df: DataFrame, *, score_col: str, label_col: str,
                         group_cols: Sequence[str] = (),
                         bins: int = 32, lo: float = -20.0,
                         hi: float = 20.0) -> DataFrame:
    """Binned isotonic (PAV) score calibration: turn raw classifier
    scores into monotone empirical probabilities — the standard
    post-hoc calibration stage for model-based quality filters.

    Scale shape: scores bucket into a FIXED grid (``bins`` buckets over
    [lo, hi], clamped), so the only corpus-sized operation is one
    (group, bin) hash aggregation to (n, n_pos); the pool-adjacent-
    violators regression then runs per group over <= ``bins`` rows in
    applyInPandas (numpy stack algorithm, O(bins)). Returns one row
    per non-empty bin: (group..., bin, n, n_pos, rate, calibrated)
    with ``calibrated`` monotone non-decreasing in ``bin``.

    Exactness: PAV's solution is unique and equals the minimax formula
    max_{i<=k} min_{j>=k} (sum pos[i..j] / sum n[i..j]) — the DuckDB
    oracle states THAT declaratively over the same integer bin
    aggregates, so the imperative stack algorithm is hash-checked
    against an independent formulation (rounded 6dp; the one double
    division per pooled block is IEEE-identical in both engines).
    """
    import numpy as np
    import pandas as pd

    if bins < 2:
        raise ValueError("isotonic_calibration: bins must be >= 2")
    if not hi > lo:
        raise ValueError("isotonic_calibration: need hi > lo")
    groups = list(group_cols)
    b = F.least(F.greatest(
        F.floor((F.col(score_col) - lo) / (hi - lo) * bins), F.lit(0)),
        F.lit(bins - 1)).cast("int")
    agg = (df.select(*groups, b.alias("bin"),
                     F.col(label_col).cast("long").alias("y"))
           .groupBy(*groups, "bin")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")))

    gtypes = dict(agg.dtypes)
    out_schema = ", ".join(
        [f"{g} {gtypes[g]}" for g in groups]
        + ["bin int, n long, n_pos long, rate double, calibrated double"])

    def _pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin").reset_index(drop=True)
        # pool adjacent violators over EXACT integer (pos, n) block
        # sums, comparing means by cross-multiplication — no float
        # enters until the one final division per pooled block, which
        # is then bit-identical to the oracle's sum/sum
        blocks: list[list[int]] = []   # [pos_sum, n_sum, n_bins]
        for pi, ni in zip(pdf["n_pos"].tolist(), pdf["n"].tolist()):
            blocks.append([int(pi), int(ni), 1])
            while (len(blocks) > 1 and
                   blocks[-2][0] * blocks[-1][1]
                   >= blocks[-1][0] * blocks[-2][1]):
                a = blocks.pop()
                blocks[-1][0] += a[0]
                blocks[-1][1] += a[1]
                blocks[-1][2] += a[2]
        cal = np.repeat([b[0] / b[1] for b in blocks],
                        [b[2] for b in blocks])
        out = pdf.copy()
        out["rate"] = np.round(pdf["n_pos"] / pdf["n"], 6)
        out["calibrated"] = np.round(cal, 6)
        return out

    if groups:
        return agg.groupBy(*groups).applyInPandas(_pav, schema=out_schema)
    return (agg.withColumn("__g", F.lit(1)).groupBy("__g")
            .applyInPandas(lambda pdf: _pav(pdf.drop(columns="__g")),
                           schema=out_schema))


def skew_report(df: DataFrame, keys: Sequence[str], *,
                target_factor: int = 4, top_k: int = 5) -> DataFrame:
    """Shuffle-skew advisor: before keying a big join/agg on ``keys``,
    measure how skewed the key distribution is and how many salt
    buckets the heaviest key needs. At 100 TB a single hot key turns a
    shuffle into one straggler task — this report is the measurement
    step of the salting/AQE-skew-join decision (the fix itself is
    `salted_agg` or AQE skew-join; see SCALE.md).

    Returns ONE row: (n_rows, n_keys, mean_rows, max_rows, skew_ratio,
    p_top{top_k}_share, top1_key, salt_buckets). salt_buckets =
    ceil(max_rows / (target_factor * mean_rows)) — how many ways the
    hottest key must split so its heaviest shard stays within
    ``target_factor`` x the mean key load; 1 = no salting needed.

    Cost: two aggregation passes over the keyed counts (a global-stats
    hash agg and a distributed top-k sort-limit) — NO global window:
    ranking every distinct key through one task would itself be the
    straggler this report hunts, since n_keys is data-sized. The only
    single-partition stage is the rank over the <= ``top_k`` surviving
    rows. Every output is an integer count or a single rounded
    division — hash-stable across engines.
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    if target_factor < 1 or top_k < 1:
        raise ValueError(
            f"target_factor/top_k must be >= 1, got {target_factor}/{top_k}")
    kc = (df.groupBy(*keys)
          .agg(F.count(F.lit(1)).alias("key_rows"))
          .withColumn("key_str", F.concat_ws(
              "|", *[F.col(k).cast("string") for k in keys])))
    # half-up via floor(x*1e4+0.5): F.round/round() disagree across
    # engines when a ratio lands on a representation midpoint (465/1e5
    # at sf0.1 rounded 0.0047 in Spark and 0.0046 in DuckDB); the
    # floor form is bit-identical IEEE in both
    def r4(col):
        return F.floor(col * 10_000 + F.lit(0.5)) / 10_000.0

    base = kc.agg(
        F.sum("key_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        r4(F.sum("key_rows") / F.count(F.lit(1))).alias("mean_rows"),
        F.max("key_rows").alias("max_rows"),
        r4(F.max("key_rows") * F.count(F.lit(1)) / F.sum("key_rows"))
        .alias("skew_ratio"),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.max("key_rows") * F.count(F.lit(1))
                   / (F.lit(target_factor) * F.sum("key_rows"))))
         .alias("salt_buckets"))
    # TakeOrderedAndProject: per-partition top-k then a top_k-bounded
    # merge — the distributed replacement for the global rank
    topk = kc.orderBy(F.col("key_rows").desc(), "key_str").limit(top_k)
    w = Window.orderBy(F.col("key_rows").desc(), "key_str")  # <= top_k rows
    tkagg = (topk.withColumn("rnk", F.row_number().over(w))
             .agg(F.sum("key_rows").alias("__tk_rows"),
                  F.max(F.when(F.col("rnk") == 1, F.col("key_str")))
                  .alias("top1_key")))
    return (base.crossJoin(F.broadcast(tkagg))
            .select("n_rows", "n_keys", "mean_rows", "max_rows",
                    "skew_ratio",
                    r4(F.col("__tk_rows") / F.col("n_rows"))
                    .alias(f"top{top_k}_share"),
                    "top1_key", "salt_buckets"))


def fd_report(df: DataFrame, lhs: Sequence[str], rhs: str) -> DataFrame:
    """Functional-dependency profiling: does ``lhs`` determine ``rhs``?
    The schema-discovery primitive behind normalization audits and
    denormalized-join sanity checks (a violated FD in a dimension feed
    means the 'dimension' key fans out — the join-fanout bug upstream).

    Returns ONE row: (n_groups, n_violating_groups, holds,
    violation_share, example_key) — example_key names one violating
    lhs value (min by string, deterministic) or NULL when the FD holds.

    One shuffle on lhs with map-side partial distinct-count; the
    violation scan never materializes group contents.
    """
    if not lhs or not rhs:
        raise ValueError("lhs columns and rhs column are required")
    if rhs in lhs:
        raise ValueError(f"rhs {rhs!r} cannot be part of lhs")
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in lhs])
    per = (df.groupBy(*lhs)
           .agg(F.countDistinct(rhs).alias("n_rhs"))
           .withColumn("key_str", key_str))
    return (per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating_groups"),
        (F.sum((F.col("n_rhs") > 1).cast("long")) == 0).alias("holds"),
        F.round(F.sum((F.col("n_rhs") > 1).cast("long"))
                / F.count(F.lit(1)), 4).alias("violation_share"),
        F.min(F.when(F.col("n_rhs") > 1, F.col("key_str")))
         .alias("example_key")))


def quantile_normalize(df: DataFrame, *, value_col: str, group_col: str,
                       id_col: str, check_sizes: bool = True) -> DataFrame:
    """Classic quantile normalization across groups (the batch-effect
    corrector from bioinformatics, equally at home aligning per-source
    score distributions before corpus mixing): rank within each group,
    then replace each value by the MEAN of the values at its rank
    across all groups — afterwards every group has an identical
    distribution.

    Requires equal group sizes (the classic algorithm's contract);
    ``check_sizes`` verifies it with one group-grain aggregate (rows =
    group count, bounded metadata) and raises loudly instead of
    silently misaligning ranks. Integer value columns make the
    rank-mean exact (int sum / count, one division).

    Shape: one shuffle to group-partition the rank window, one
    rank-grain aggregate (rows = group size), broadcast back. Returns
    (id_col, group_col, value_col, qnorm).
    """
    from pyspark.sql import Window
    if check_sizes:
        sizes = (df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
                 .select("n").distinct().collect())
        if len(sizes) > 1:
            raise ValueError(
                "quantile_normalize requires equal group sizes, got "
                f"{sorted(r['n'] for r in sizes)}; resample groups first")
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.select(id_col, group_col, value_col,
                       F.row_number().over(w).alias("__r"))
    ref = (ranked.groupBy("__r")
           .agg(F.round(F.avg(value_col), 4).alias("qnorm")))
    return (ranked.join(F.broadcast(ref), "__r")
            .select(id_col, group_col, value_col, "qnorm"))


#: cumulative CDF of Poisson(1) at k = 0..5 — the inverse-CDF table for
#: deterministic hash-derived bootstrap weights (tail mass beyond 6 is
#: ~1e-4 of one count unit; capped). Literal doubles, identical in SQL.
POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                0.9196986029286058, 0.9810118431238462,
                0.9963401531726563, 0.9994058151824183)


def poisson_bootstrap_weight(key: Column, rep: Column) -> Column:
    """Deterministic Poisson(1) bootstrap weight for (row key,
    replicate): u = first 8 md5 hex digits of "key_rep" as a uniform in
    [0, 1), pushed through the Poisson(1) inverse CDF. md5 is
    bit-identical in every engine and the comparisons are literal
    doubles, so any engine derives the same integer weight — the
    Poisson bootstrap (Chamandy et al., Google) replicates WEIGHTS, not
    rows, which is what makes bootstrapping 100 TB one scan instead of
    B copies."""
    u = (F.conv(F.substring(F.md5(F.concat_ws("_", key, rep)), 1, 8),
                16, 10).cast("long") / F.lit(4294967296.0))
    w = F.lit(6)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def bootstrap_mean_ci(df: DataFrame, *, key_col: str, value_col: str,
                      replicates: int = 200,
                      alpha: float = 0.05) -> DataFrame:
    """Percentile-bootstrap confidence interval for the MEAN of an
    integer-valued metric — the uncertainty line every corpus quality
    report should carry ("mean tokens/doc: 512.3 [508.1, 516.9]").

    ENGINE-EXACT Poisson bootstrap: each row contributes a
    hash-derived Poisson(1) weight per replicate
    (``poisson_bootstrap_weight``); replicate means are exact int64
    (sum w*x / sum w, ONE float division rounded half-up to 6 dp); the
    CI bounds are order statistics over the B replicate means
    (row_number with replicate-id tie-break — no interpolation, so the
    whole report hash-matches a SQL oracle).

    Scale shape: the replicate fan-out explodes B weights per row but
    aggregates in the SAME stage (map-side partial to B-grain), so the
    shuffle carries B rows per partition; everything after is
    B-bounded. One scan of the data regardless of B.

    Returns ONE row: (n_rows, point_mean, ci_low, ci_high,
    n_replicates). ``value_col`` must be integral (cast yourself —
    quantize floats to micro-units first, the repo convention)."""
    if replicates < 4:
        raise ValueError(f"replicates must be >= 4, got {replicates}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from ..operators.topology import cpu_widen
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b")
    x = F.col(value_col).cast("long")
    w = poisson_bootstrap_weight(F.col(key_col).cast("string"),
                                 F.col("b").cast("string"))
    # cpu_widen: the B-way fan-out + per-(row, b) md5 below fuse into
    # the SCAN's stage, whose width tracks input bytes — a few-MB
    # dimension lands on 1 core and the whole bootstrap serializes
    # (guide §2.4). Widen the slim (key, x) projection first; no-op on
    # frames already cluster-wide.
    per_rep = (cpu_widen(df.select(F.col(key_col), x.alias("x")))
               .select(F.col(key_col), "x", b)
               .select("b", (w * F.col("x")).alias("wx"), w.alias("w"))
               .groupBy("b")
               .agg(F.sum("wx").alias("s"), F.sum("w").alias("n")))
    rep_mean = per_rep.select(
        "b", (F.floor(F.col("s") / F.col("n") * 1_000_000 + F.lit(0.5))
              / 1_000_000.0).alias("m"))
    lo_rank = int(alpha / 2 * replicates) + 1        # floor + 1
    hi_rank = -(-int((1 - alpha / 2) * replicates))  # == ceil for int
    ww = Window.orderBy("m", "b")  # over exactly `replicates` rows
    ranked = rep_mean.withColumn("r", F.row_number().over(ww))
    ci = ranked.agg(
        F.max(F.when(F.col("r") == lo_rank, F.col("m"))).alias("ci_low"),
        F.max(F.when(F.col("r") == hi_rank, F.col("m"))).alias("ci_high"),
        F.count(F.lit(1)).alias("n_replicates"))
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.floor(F.sum(x) / F.count(F.lit(1)) * 1_000_000 + F.lit(0.5))
         / 1_000_000.0).alias("point_mean"))
    return (base.crossJoin(F.broadcast(ci))
            .select("n_rows", "point_mean", "ci_low", "ci_high",
                    "n_replicates"))


def bootstrap_mean_ci_grouped(df: DataFrame, *, key_col: str,
                              value_col: str, group_cols: Sequence[str],
                              replicates: int = 200,
                              alpha: float = 0.05) -> DataFrame:
    """``bootstrap_mean_ci`` per group (per source / language / shard):
    the same engine-exact Poisson bootstrap, with replicate means at
    (group, b) grain and percentile ranks windowed PER GROUP — the
    global stage is gone entirely, so the op is group-parallel at any
    scale (each window partition holds exactly B rows). Returns one row
    per group: (group..., n_rows, point_mean, ci_low, ci_high,
    n_replicates)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty — use "
                         "bootstrap_mean_ci for the global interval")
    if replicates < 4:
        raise ValueError(f"replicates must be >= 4, got {replicates}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    groups = list(group_cols)
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b")
    x = F.col(value_col).cast("long")
    w = poisson_bootstrap_weight(F.col(key_col).cast("string"),
                                 F.col("b").cast("string"))
    from ..operators.topology import cpu_widen
    # same stage-width fix as bootstrap_mean_ci (guide §2.4): widen the
    # slim projection so the B-way fan-out + md5 use the whole cluster
    per_rep = (cpu_widen(df.select(*groups, F.col(key_col), x.alias("x")))
               .select(*groups, F.col(key_col), "x", b)
               .select(*groups, "b", (w * F.col("x")).alias("wx"),
                       w.alias("w"))
               .groupBy(*groups, "b")
               .agg(F.sum("wx").alias("s"), F.sum("w").alias("n")))
    rep_mean = per_rep.select(
        *groups, "b",
        (F.floor(F.col("s") / F.col("n") * 1_000_000 + F.lit(0.5))
         / 1_000_000.0).alias("m"))
    lo_rank = int(alpha / 2 * replicates) + 1
    hi_rank = -(-int((1 - alpha / 2) * replicates))
    ww = Window.partitionBy(*groups).orderBy("m", "b")  # B rows/group
    ranked = rep_mean.withColumn("r", F.row_number().over(ww))
    ci = ranked.groupBy(*groups).agg(
        F.max(F.when(F.col("r") == lo_rank, F.col("m"))).alias("ci_low"),
        F.max(F.when(F.col("r") == hi_rank, F.col("m"))).alias("ci_high"),
        F.count(F.lit(1)).alias("n_replicates"))
    base = df.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.floor(F.sum(x) / F.count(F.lit(1)) * 1_000_000 + F.lit(0.5))
         / 1_000_000.0).alias("point_mean"))
    return (base.join(ci, groups)
            .select(*groups, "n_rows", "point_mean", "ci_low", "ci_high",
                    "n_replicates"))


# ---------------------------------------------------------------------------
# Differential privacy: discrete-Laplace noisy counts (round 7)
# ---------------------------------------------------------------------------

DP_NOISE_BOUND = 20  # truncation: P(|X| > 20) < 3e-9 at epsilon = 1


def dp_laplace_cdf_micro(epsilon_micro: int = 1_000_000,
                         bound: int = DP_NOISE_BOUND) -> list:
    """CDF of the TRUNCATED discrete Laplace (two-sided geometric)
    mechanism, P(X = k) ∝ p^|k| with p = exp(-eps), tabulated as
    (k, cdf_micro) pairs for k in [-bound, bound]. Computed ONCE in
    CPython and embedded as the same literal table in the Spark plan
    and the SQL oracle — the engine-exactness convention for
    transcendental constants (the DFT basis table's sibling). The final
    entry is pinned to exactly 1e6 so sampling is total."""
    import math
    p = math.exp(-epsilon_micro / 1_000_000)
    weights = [p ** abs(k) for k in range(-bound, bound + 1)]
    total = sum(weights)
    acc, out = 0.0, []
    for k, w in zip(range(-bound, bound + 1), weights):
        acc += w
        out.append((k, min(1_000_000, int(math.floor(acc / total * 1e6)))))
    out[-1] = (bound, 1_000_000)
    return out


def dp_noisy_counts(df, group_col: str, *, epsilon_micro: int = 1_000_000,
                    seed: int = 7, bound: int = DP_NOISE_BOUND):
    """Differentially-private count release: per group, true count plus
    truncated discrete-Laplace noise — the standard integer-valued DP
    mechanism for counting queries (sensitivity 1). Noise is sampled by
    inverse-CDF over a hash-uniform draw u = md5(group, seed) mod 1e6,
    so the release is REPRODUCIBLE (seeded DP, the practical deployment
    mode: re-running the release must not spend fresh privacy budget)
    and the gate can hash-check the mechanism end to end. Truncation at
    +/-``bound`` costs < 3e-9 probability mass at eps=1 (documented
    delta; raise bound to shrink it).

    Plan: one count aggregate (map-side partials), one broadcast join
    against the (2*bound+1)-row CDF table picking the smallest k with
    u_micro < cdf — group-grain work only."""
    if epsilon_micro <= 0:
        raise ValueError("epsilon_micro must be positive")
    from pyspark.sql import functions as F
    cdf = dp_laplace_cdf_micro(epsilon_micro, bound)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("true_n"))
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(group_col).cast("string"),
        F.lit(f"dp:{seed}"))), 1, 12), 16, 10).cast("long")
        % 1_000_000)
    # inverse CDF as a literal CASE chain (smallest k with u < cdf):
    # the table is a compile-time constant, so sampling is pure
    # whole-stage-codegen expression work — no join of any kind (a
    # non-equi join against the 41-row table would plan as a
    # BroadcastNestedLoopJoin, the node the registry audit forbids
    # for anything but scalar builds)
    noise_expr = F.lit(cdf[-1][0])
    for k, c in reversed(cdf[:-1]):
        noise_expr = F.when(F.col("u_micro") < F.lit(c),
                            F.lit(k)).otherwise(noise_expr)
    noisy = (counts.withColumn("u_micro", u)
             .withColumn("noise", noise_expr))
    return noisy.select(
        group_col,
        F.col("u_micro"),
        F.col("noise").cast("int").alias("noise"),
        F.greatest(F.col("true_n") + F.col("noise"), F.lit(0))
        .cast("long").alias("noisy_count"),
        F.lit(epsilon_micro).cast("long").alias("epsilon_micro"))


def dp_user_level_counts(df, group_col: str, user_col: str, *,
                         contribution_bound: int = 3,
                         epsilon_micro: int = 1_000_000, seed: int = 7):
    """USER-LEVEL differentially-private count release — the privacy
    unit real data releases need: ``dp_noisy_counts`` protects single
    EVENTS (sensitivity 1), but one user contributes many events, so
    event-level DP leaks under user adjacency. Standard recipe
    (Wilson et al., "Differentially Private SQL"): (1) clamp each
    user's contribution per group at ``contribution_bound`` C — a
    user-grain aggregate + least(); (2) the clamped count's user-level
    sensitivity is C, so sample truncated discrete Laplace at
    eps/C (CDF tabulated at epsilon_micro // C, truncation bound
    scaled by C to keep the dropped mass comparable). Same seeded
    inverse-CDF mechanism as the event-level release, so the oracle
    replays the whole pipeline including the noise.

    Plan: one (group, user)-grain aggregate, one group-grain aggregate,
    then a literal CASE chain for the noise — map-side combinable
    throughout, no user-grain state on the driver."""
    if contribution_bound < 1:
        raise ValueError("contribution_bound must be >= 1")
    if epsilon_micro <= 0:
        raise ValueError("epsilon_micro must be positive")
    cdf = dp_laplace_cdf_micro(epsilon_micro // contribution_bound,
                               DP_NOISE_BOUND * contribution_bound)
    per_user = (df.groupBy(group_col, user_col)
                .agg(F.least(F.count(F.lit(1)),
                             F.lit(contribution_bound)).alias("contrib")))
    counts = (per_user.groupBy(group_col)
              .agg(F.sum("contrib").cast("long").alias("true_n"),
                   F.count(F.lit(1)).cast("long").alias("n_users")))
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(group_col).cast("string"),
        F.lit(f"dpu:{seed}"))), 1, 12), 16, 10).cast("long")
        % 1_000_000)
    noise_expr = F.lit(cdf[-1][0])
    for k, c in reversed(cdf[:-1]):
        noise_expr = F.when(F.col("u_micro") < F.lit(c),
                            F.lit(k)).otherwise(noise_expr)
    return (counts.withColumn("u_micro", u)
            .withColumn("noise", noise_expr)
            .select(group_col, "n_users", "u_micro",
                    F.col("noise").cast("int").alias("noise"),
                    F.greatest(F.col("true_n") + F.col("noise"), F.lit(0))
                    .cast("long").alias("noisy_count"),
                    F.lit(contribution_bound).cast("int")
                    .alias("contribution_bound"),
                    F.lit(epsilon_micro).cast("long")
                    .alias("epsilon_micro")))


def ks_two_sample(df, *, value_col: str, side_col: str,
                  side_a: str, side_b: str):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of two groups — the distribution-drift
    test that sees what binned PSI smooths over (PSI is blind to shifts
    WITHIN a bin; KS is sup-norm over the exact empirical CDFs).

    D = sup_x |F_a(x) - F_b(x)| computed fully distributed and exactly
    in integers: values go to micro-units, one (value)-grain aggregate
    counts each side, then the cumulative counts come from the same
    two-pass scheme as operators.distributed_ordinal — range-partition
    by value, per-partition running sums in ONE Arrow pass, per-
    partition totals (one tiny row each) prefix-summed and broadcast
    back. No Exchange SinglePartition anywhere, so the sup runs at any
    value-grain cardinality. The statistic is reported as
    d_micro = floor(1e6 * max|cumA*nB - cumB*nA| / (nA*nB)) with the
    smallest attaining value for a deterministic argmax.

    Returns one row: (n_a, n_b, d_micro, at_value_micro)."""
    v = F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5)).cast("long")
    grain = (df.where(F.col(side_col).isin(side_a, side_b))
             .select(v.alias("v"), F.col(side_col).alias("s"))
             .groupBy("v")
             .agg(F.count(F.when(F.col("s") == side_a, 1)).alias("ca"),
                  F.count(F.when(F.col("s") == side_b, 1)).alias("cb")))
    n_parts = max(2, int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")))
    parted = (grain.repartitionByRange(n_parts, "v")
              .sortWithinPartitions("v"))

    def local_cum(it):
        # Arrow hands one partition as SEVERAL batches (maxRecordsPerBatch);
        # the running sums must carry across them or every batch would
        # restart the CDF (the carry is per-partition: each task gets its
        # own iterator). Batches arrive in the sortWithinPartitions order.
        carry_a = carry_b = 0
        for pdf in it:
            if len(pdf):
                pdf = pdf.reset_index(drop=True)
                pdf["cum_a"] = pdf["ca"].cumsum() + carry_a
                pdf["cum_b"] = pdf["cb"].cumsum() + carry_b
                carry_a = int(pdf["cum_a"].iloc[-1])
                carry_b = int(pdf["cum_b"].iloc[-1])
                yield pdf

    cum = parted.mapInPandas(
        local_cum, schema="v long, ca long, cb long, cum_a long, cum_b long")
    cum = (cum.withColumn("__mid", F.monotonically_increasing_id())
           .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
           .drop("__mid"))
    from ..plans.caching import track_persist
    cum = track_persist(cum)
    # per-partition totals: one tiny row per partition -> driver prefix
    # sums -> broadcast offsets (the distributed_ordinal contract; the
    # collect is bounded by the partition count, never the data)
    totals = (cum.groupBy("__pid")
              .agg(F.max("cum_a").alias("ta"), F.max("cum_b").alias("tb"))
              .collect())
    totals.sort(key=lambda r: r["__pid"])
    off_a, off_b, offsets = 0, 0, []
    for r in totals:
        offsets.append((r["__pid"], off_a, off_b))
        off_a += r["ta"] or 0
        off_b += r["tb"] or 0
    n_a, n_b = off_a, off_b
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        offsets, schema="__pid int, off_a long, off_b long"))
    gap = F.abs((F.col("off_a") + F.col("cum_a")) * F.lit(n_b)
                - (F.col("off_b") + F.col("cum_b")) * F.lit(n_a))
    scored = cum.join(off_df, "__pid").select(
        "v", gap.alias("gap"))
    best = scored.agg(F.max("gap").alias("g")).collect()[0]["g"] or 0
    at_v = (scored.where(F.col("gap") == F.lit(best))
            .agg(F.min("v").alias("v")).collect()[0]["v"])
    one = spark.range(1).select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.lit(int(best * 1_000_000 // max(n_a * n_b, 1))).cast("long")
        .alias("d_micro"),
        F.lit(at_v).cast("long").alias("at_value_micro"))
    return one


def compaction_bins(df, *, ts_col: str = "ts", row_bytes: int = 64,
                    target_bytes: int = 1_048_576):
    """Small-file compaction planner — the lakehouse maintenance pass
    (OPTIMIZE / rewriteDataFiles) that turns a long tail of tiny
    time-partitions into ~target-size output files: per-hour partition
    sizes (row count x estimated row width) are packed GREEDILY IN
    TIME ORDER into bins by cumulative size — bin k = rows whose
    cumulative-bytes-before falls in [k*target, (k+1)*target) — so
    every output file holds a contiguous time range (preserving
    time-predicate pruning, which arbitrary bin packing would destroy).

    Plan: one hour-grain aggregate, then one global ordered window over
    HOUR-GRID rows (bounded: one row per distinct hour, never event
    volume — the hour-grid bound class). Returns one row per planned
    output file: (bin, n_partitions, bytes, hour_first, hour_last)."""
    if target_bytes < 1 or row_bytes < 1:
        raise ValueError("target_bytes and row_bytes must be >= 1")
    hourly = (df.groupBy(F.date_trunc("hour", ts_col).alias("h"))
              .agg((F.count(F.lit(1)) * row_bytes).alias("bytes")))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    binned = (hourly
              .withColumn("cum", F.sum("bytes").over(w))
              .withColumn("bin", ((F.col("cum") - F.col("bytes"))
                                  / target_bytes).cast("long")))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_partitions"),
                 F.sum("bytes").cast("long").alias("bytes"),
                 F.min("h").alias("hour_first"),
                 F.max("h").alias("hour_last")))


def kaplan_meier(df, *, duration_col: str, event_col: str):
    """Kaplan-Meier survival estimator over (duration, event) subject
    rows — the classic right-censored form: ``event_col`` = 1 means the
    event happened at ``duration_col``, 0 means the subject was only
    observed that long (censored — leaves the risk set, no step). At
    each event time t:

        S(t) = S(t-) * (n_t - d_t) div n_t        (exact micro-units)

    with n_t = subjects with duration >= t and d_t = events at t.
    Truncating integer division keeps every step engine-exact, so a
    recursive CTE replays the whole curve.

    Plan shape: one duration-grain aggregate, a grid suffix-sum window
    (bounded: one row per distinct duration — declare the grid bound
    class on the query), and one sequential fold over the <= grid-many
    event times (one int of state). Nothing is subject-volume-sized
    past the first aggregate."""
    from typing import Iterator
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dist = (df.groupBy(F.col(duration_col).alias("__t"))
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.sum(F.col(event_col).cast("long")).alias("__d")))
    w = (Window.orderBy(F.col("__t").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    risk = (dist.withColumn("n_risk", F.sum("__n").over(w))
            .where(F.col("__d") > 0)
            .select(F.col("__t").alias("t"),
                    F.col("n_risk").cast("long"),
                    F.col("__d").cast("long").alias("n_events")))

    def _fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: r["t"])
        s = 1_000_000
        out = {"t": [], "n_risk": [], "n_events": [], "survival_micro": []}
        for r in rows:
            n, d = int(r["n_risk"]), int(r["n_events"])
            s = (s * (n - d)) // n  # operands non-negative: trunc == floor
            out["t"].append(r["t"])
            out["n_risk"].append(n)
            out["n_events"].append(d)
            out["survival_micro"].append(s)
        yield pd.DataFrame(out)

    t_type = dict(risk.dtypes)["t"]
    # the fold is one pass over grid-bounded rows; coalesce(1) makes the
    # sequential dependency explicit instead of relying on partition luck
    return risk.coalesce(1).mapInPandas(_fold, schema=(
        f"t {t_type}, n_risk long, n_events long, survival_micro long"))


# ---------------------------------------------------------------------------
# Markov-chain attribution (removal effects), round 7
# ---------------------------------------------------------------------------

MARKOV_STATES = ("start", "view", "click", "signup", "error")
MARKOV_ITERS = 32


def markov_conversion_value(counts: dict, removed: str | None = None,
                            iters: int = MARKOV_ITERS) -> int:
    """P(reach conversion from 'start') of the first-order journey
    chain, in exact integer micro-units, by fixed-iteration value
    iteration: v(conv) = 1e6, v(null) = 0, and per sweep (states in
    fixed declaration order, transitions in fixed target order)

        v(s) = sum_j (p_micro(s -> j) * v(j)) div 1e6 .

    ``removed`` implements the REMOVAL EFFECT: every transition into
    the removed channel is rerouted to 'null' (the channel stops
    existing; journeys that needed it die). Pure integer arithmetic in
    a fixed order — the one source of truth for both engines (the
    Spark path calls it on distributed counts, the oracle generator on
    independently-derived counts)."""
    outs: dict = {}
    for (a, b), n in counts.items():
        if a == removed:
            continue
        b2 = "null" if b == removed else b
        outs.setdefault(a, {})
        outs[a][b2] = outs[a].get(b2, 0) + n
    p_micro = {}
    for a, tos in outs.items():
        tot = sum(tos.values())
        for b, n in sorted(tos.items()):
            p_micro[(a, b)] = (n * 1_000_000) // tot
    v = {s: 0 for s in list(MARKOV_STATES) + ["conv", "null"]}
    v["conv"] = 1_000_000
    for _ in range(iters):
        nv = dict(v)
        for s in MARKOV_STATES:
            if s == removed:
                nv[s] = 0
                continue
            acc = 0
            for b in sorted(set(b for (a, b) in p_micro if a == s)):
                acc += (p_micro[(s, b)] * v.get(b, 0)) // 1_000_000
            nv[s] = acc
        v = nv
    return v["start"]


def markov_transition_counts(df, *, user_col: str = "user_id",
                             time_col: str = "ts",
                             type_col: str = "event_type",
                             id_col: str = "event_id",
                             conversion: str = "purchase") -> "DataFrame":
    """First-order journey transition counts: per user, events ordered
    by (time, id) up to and including the FIRST conversion (mapped to
    'conv'); 'start' prepended, 'null' appended when no conversion.
    One user-grain window pass; output is state-pair grain (<= 7x7
    rows — bounded model metadata, the codebook class)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(user_col).orderBy(time_col, id_col)
    ev = (df.withColumn("__rn", F.row_number().over(w))
          .withColumn("__prn", F.min(F.when(
              F.col(type_col) == conversion, F.col("__rn"))).over(
              Window.partitionBy(user_col)))
          .where(F.col("__prn").isNull() | (F.col("__rn") <= F.col("__prn")))
          .withColumn("__state", F.when(
              F.col(type_col) == conversion, F.lit("conv"))
              .otherwise(F.col(type_col))))
    seq = ev.select(user_col, "__rn", "__state",
                    F.lead("__state").over(w).alias("__next"),
                    F.col("__prn").isNotNull().alias("__has_conv"),
                    F.max("__rn").over(Window.partitionBy(user_col))
                    .alias("__last"))
    firsts = (ev.where(F.col("__rn") == 1)
              .select(F.lit("start").alias("from_state"),
                      F.col("__state").alias("to_state")))
    mids = (seq.where(F.col("__next").isNotNull())
            .select(F.col("__state").alias("from_state"),
                    F.col("__next").alias("to_state")))
    tails = (seq.where((F.col("__rn") == F.col("__last"))
                       & ~F.col("__has_conv"))
             .select(F.col("__state").alias("from_state"),
                     F.lit("null").alias("to_state")))
    return (firsts.unionByName(mids).unionByName(tails)
            .groupBy("from_state", "to_state")
            .agg(F.count(F.lit(1)).alias("n")))


def markov_attribution(df, **kwargs) -> "DataFrame":
    """Markov removal-effect attribution (Anderl et al.'s
    data-driven model): channel credit = how much the chain's
    conversion probability DROPS when the channel is removed,
    normalized into shares. Transition counting is distributed
    (markov_transition_counts); the <= 7x7 count matrix collects as
    bounded model metadata and the fixed-iteration integer value
    iteration runs once per channel + once for the base chain."""
    from pyspark.sql import functions as F  # noqa: F401
    counts_df = markov_transition_counts(df, **kwargs)
    counts = {(r["from_state"], r["to_state"]): r["n"]
              for r in counts_df.collect()}
    base = markov_conversion_value(counts)
    channels = [s for s in MARKOV_STATES if s != "start"]
    drops = {}
    for c in channels:
        without = markov_conversion_value(counts, removed=c)
        drops[c] = max(0, base - without)
    tot = sum(drops.values())
    spark = df.sparkSession
    rows = [(c,
             int(sum(n for (a, b), n in counts.items() if b == c)),
             (drops[c] * 1_000_000) // max(base, 1),
             (drops[c] * 1_000_000) // max(tot, 1))
            for c in channels]
    return spark.createDataFrame(
        rows, "channel string, transitions_in long, "
              "removal_drop_micro long, share_micro long")


def markov_attribution_oracle_sql(sf_dir: str) -> str:
    """Per-SF generated oracle for markov_attribution: journeys are
    re-derived in pure Python from a DuckDB read (independent of
    Spark's window/scan path), then the SAME fixed-iteration integer
    value iteration replays the removal effects into a VALUES table."""
    import os

    import duckdb

    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT user_id, event_type
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        ORDER BY user_id, ts, event_id
    """).fetchall()
    journeys: dict = {}
    for uid, et in rows:
        journeys.setdefault(uid, []).append(et)
    counts: dict = {}

    def bump(a, b):
        counts[(a, b)] = counts.get((a, b), 0) + 1

    for seq in journeys.values():
        states = []
        for et in seq:
            states.append("conv" if et == "purchase" else et)
            if et == "purchase":
                break
        prev = "start"
        for s in states:
            bump(prev, s)
            prev = s
        if prev != "conv":
            bump(prev, "null")
    base = markov_conversion_value(counts)
    channels = [s for s in MARKOV_STATES if s != "start"]
    drops = {c: max(0, base - markov_conversion_value(counts, removed=c))
             for c in channels}
    tot = sum(drops.values())
    vals = ",\n".join(
        f"('{c}', {sum(n for (a, b), n in counts.items() if b == c)}, "
        f"{(drops[c] * 1_000_000) // max(base, 1)}, "
        f"{(drops[c] * 1_000_000) // max(tot, 1)})"
        for c in channels)
    return f"""SELECT channel::VARCHAR AS channel,
       transitions_in::BIGINT AS transitions_in,
       removal_drop_micro::BIGINT AS removal_drop_micro,
       share_micro::BIGINT AS share_micro
FROM (VALUES
{vals}
) AS t(channel, transitions_in, removal_drop_micro, share_micro)"""
