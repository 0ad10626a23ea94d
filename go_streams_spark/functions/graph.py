"""Graph analytics over relationally-derived edge sets.

``connected_components`` (dedup clustering) lives in
``functions/dedup.py``; this module holds general graph ops. Everything
here is deterministic ACROSS ENGINES: PageRank runs in scaled INTEGER
arithmetic (BIGINT micro-units with floor division), so per-iteration
sums are order-independent and a DuckDB oracle reproduces every bit —
the usual float-PageRank is only reproducible run-to-run on one engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.caching import track_persist

#: PageRank mass is tracked in units of 1/SCALE (integer micro-probability)
PAGERANK_SCALE = 1_000_000_000_000


#: weighted edges: per-edge share of a node's outgoing mass is held in
#: integer parts-per-SHARE_SCALE (precomputed once; pr * share stays
#: under 2^63 because pr <= ~PAGERANK_SCALE and share <= SHARE_SCALE)
SHARE_SCALE = 1_000_000

#: ``broadcast_ranks="auto"`` switches to the co-partitioned join plan
#: above this node count (~tens of MB of (node, outdeg, pr) rows —
#: comfortably under executor memory, far under driver OOM territory)
BROADCAST_MAX_NODES = 5_000_000


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             weight: str | None = None,
             iterations: int = 3, damping_pct: int = 85,
             round_dp: int = 6,
             broadcast_ranks: bool | str = "auto",
             broadcast_max_nodes: int = BROADCAST_MAX_NODES) -> DataFrame:
    """Iterative PageRank with ENGINE-EXACT integer arithmetic.

    ``edges`` is a directed edge list (pass both directions for an
    undirected graph). Rank mass lives in BIGINT units of 1/SCALE:

        contrib(u)  = pr(u) div outdeg(u)
        pr'(v)      = (100-d)*SCALE div (100*N)  +  d*sum_in(v) div 100

    With ``weight`` set (an INTEGER edge-weight column, values > 0;
    duplicate (u, v) rows sum — a non-integral column raises at build
    time, a NULL/zero/negative value fails the first job that scans
    it), each edge instead carries a precomputed integer
    share = (w * SHARE_SCALE) div weighted_outdeg(u), and
    contrib = (pr * share) div SHARE_SCALE — still pure 64-bit floor
    arithmetic, still order-independent and oracle-exact; the share
    quantization (parts-per-million of u's mass) is the documented
    deterministic contract, mirrored verbatim in the SQL oracle.

    — floor division everywhere, so the result is independent of
    addition order AND identical in any engine with 64-bit integers
    (the SQL oracle chains one CTE per iteration). Total mass shrinks
    by the floor losses (bounded by N*iterations/SCALE — irrelevant at
    micro-unit scale).

    Two plan shapes, picked by ``broadcast_ranks``:

    * **Broadcast** (``True``, or ``"auto"`` with N <=
      ``broadcast_max_nodes``): rank tables are node-grain and small, so
      broadcast them into the edge join — each iteration's only shuffle
      is the dst-sum of contributions (map-side partials). Fastest, but
      every executor (and the driver) holds the full rank table:
      only safe while N is bounded.
    * **Co-partitioned shuffle** (``False``, or ``"auto"`` above the
      threshold): edges are hash-partitioned on ``u`` ONCE (pinned via
      track_persist) and the rank table is shuffle-hash-joined against
      them — 2 exchanges per iteration (rank table into the edge join +
      the dst-sum), both node/edge-partition-sized, memory bounded at
      any N. This is the GraphX/Pregel shape. Joins carry explicit
      ``shuffle_hash`` hints so Catalyst's size estimation can never
      silently re-introduce a broadcast of a table that grows with the
      graph.

    In both modes every input of iteration k is either cached (edges,
    degrees) or the node-grain rank table of iteration k-1. Returns
    (node, pr) with pr = scaled float, rounded.
    """
    if iterations < 0 or not 0 <= damping_pct <= 100:
        raise ValueError("iterations >= 0 and 0 <= damping_pct <= 100")
    if broadcast_ranks not in (True, False, "auto"):
        raise ValueError("broadcast_ranks must be True, False, or 'auto'")
    if weight is not None:
        # loud-failure contract (same as the other graph ops): a float
        # weight column would be silently floor-truncated by the long
        # cast, and a <= 0 / NULL weight makes the integer share
        # division emit NULL (silently dropped from sums) or divide by
        # zero. Dtype is checked here (free); values are checked with a
        # raise_error guard that rides the existing edge scan — first
        # bad row fails the job, zero extra cost on clean data.
        from pyspark.sql.types import (ByteType, ShortType, IntegerType,
                                       LongType)
        wtype = edges.schema[weight].dataType
        if not isinstance(wtype, (ByteType, ShortType, IntegerType,
                                  LongType)):
            raise ValueError(
                f"pagerank: weight column {weight!r} must be integral "
                f"(got {wtype.simpleString()}); cast explicitly if the "
                "truncation is intended")
    # staging pins: ONE materialization each of the canonical edge set
    # and the node table; the single nodes0.count() below both
    # materializes them and yields the node count that picks the mode
    # (a separate distinct-union count job was measured at +1.5-2.5 s
    # pure overhead at bench scale)
    if weight is None:
        e0 = track_persist(
            edges.select(F.col(src).alias("u"),
                         F.col(dst).alias("v")).distinct())
        deg_agg = F.count(F.lit(1)).alias("outdeg")
    else:
        w_checked = F.when(
            F.col(weight).isNull() | (F.col(weight) <= 0),
            F.raise_error(F.concat(
                F.lit("pagerank: weight must be a positive integer, got "),
                F.coalesce(F.col(weight).cast("string"), F.lit("NULL")),
                F.lit(f" (column {weight!r})")))
        ).otherwise(F.col(weight).cast("long"))
        e0 = track_persist(
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                         w_checked.alias("w"))
            .groupBy("u", "v").agg(F.sum("w").alias("w")))
        deg_agg = F.sum("w").alias("outdeg")  # weighted out-mass
    # deg is node-grain (grows with the graph): the one-time build join
    # is shuffle_hash-hinted unconditionally so Catalyst can never
    # estimate it broadcastable — mode-independent plan safety, at the
    # cost of a shuffle join where a small graph's build could have
    # broadcast (one-time, grain-bounded)
    deg = e0.groupBy("u").agg(deg_agg)
    nodes0 = track_persist(
        e0.select(F.col("u").alias("node")).union(
            e0.select(F.col("v").alias("node"))).distinct()
        .join(deg.hint("shuffle_hash"), F.col("node") == F.col("u"), "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    n = nodes0.count()  # scalar graph metadata (like an IVF codebook)
    if n == 0:
        return nodes0.select(F.col("node"), F.lit(0.0).alias("pr"))
    use_broadcast = broadcast_ranks is True or (
        broadcast_ranks == "auto" and n <= broadcast_max_nodes)
    if use_broadcast:
        e = e0
        nodes = nodes0
    else:
        # co-partition the per-iteration join inputs up front: edges on
        # the probe key u, nodes on the dst-sum key node. Both persists
        # expose hashpartitioning to EnsureRequirements, so the steady-
        # state loop only ever shuffles the iteration-k rank table.
        # Both derive from the CACHED staging pins (cheap repartition
        # reads, no recompute). The "auto" fallback takes this exact
        # same path as an explicit False (an earlier version decided
        # the mode after building the loop inputs — auto then ran with
        # un-repartitioned edges, re-shuffling the full edge set every
        # iteration). The staging pins stay tracked until
        # release_tracked() rather than being dropped eagerly:
        # CacheManager matches canonicalized plans across invocations,
        # so repeated calls (bench passes, retries) reuse the staging
        # materialization — an eager unpersist was measured to triple
        # warm-call latency. Transiently the edge set is cached at two
        # partitionings; MEMORY_AND_DISK eviction makes that a spill
        # concern, not an OOM, and release_tracked() frees both.
        e = track_persist(e0.repartition("u"))
        nodes = track_persist(nodes0.repartition("node"))

    # exact Python integer division — double division + floor can be
    # off by one ulp at an integer boundary
    base = ((100 - damping_pct) * PAGERANK_SCALE) // (100 * n)
    pr = nodes.select("node", "outdeg",
                      F.lit(PAGERANK_SCALE // n).cast("long").alias("pr"))
    if weight is not None:
        # per-edge integer share of u's outgoing mass, precomputed ONCE
        # and carried with the (cached) edge set
        wdeg = deg.withColumnRenamed("outdeg", "wdeg")
        if not use_broadcast:
            wdeg = wdeg.hint("shuffle_hash")
        e = track_persist(
            e.join(wdeg, "u")
            .select("u", "v",
                    F.expr(f"(w * {SHARE_SCALE}) div wdeg").alias("share")))
    for _ in range(iterations):
        live = pr.where(F.col("outdeg") > 0)
        rank_side = F.broadcast(live) if use_broadcast \
            else live.hint("shuffle_hash")
        contrib_expr = (F.expr("pr div outdeg") if weight is None
                        else F.expr(f"(pr * share) div {SHARE_SCALE}"))
        contrib = (e.join(rank_side, live["node"] == e["u"])
                   .select(F.col("v").alias("node"),
                           contrib_expr.alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        sums_side = F.broadcast(sums) if use_broadcast \
            else sums.hint("shuffle_hash")
        pr = (nodes.join(sums_side, "node", "left")
              .select("node", "outdeg",
                      (F.lit(base).cast("long")
                       + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100"))
                      .cast("long").alias("pr")))
    return pr.select("node",
                     F.round(F.col("pr") / F.lit(float(PAGERANK_SCALE)),
                             round_dp).alias("pr"))


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected distinct edge set (a < b, no self-loops) —
    the shared first step of k_core / triangle_count /
    label_propagation, factored so the canonicalization rule cannot
    drift between them (their oracles all assume it)."""
    a, b = F.col(src), F.col(dst)
    return (edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
            .where(F.col("a") != F.col("b")).distinct())


def k_core(edges: DataFrame, *, k: int, src: str = "src", dst: str = "dst",
           max_iterations: int = 12,
           on_nonconverged: str = "raise") -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    nodes whose degree in the REMAINING graph is < k until none remain,
    then return the surviving nodes with their core degrees.

    Plan per pass: one degree aggregation (hash shuffle on node) and a
    both-endpoint semi-join filter of the edge set — linear in the
    remaining edges, with the edge set ``localCheckpoint``'ed each pass
    so pass p's plan never replays passes 1..p-1 (the
    connected_components lineage rule). Pass count is bounded by the
    peel depth of the graph, which for real co-occurrence/social graphs
    is small (the degeneracy ordering collapses hubs in a handful of
    rounds). Convergence is checked with a per-pass scalar count;
    exhausting ``max_iterations`` unconverged raises (or warns with
    ``on_nonconverged="warn"``) — never a silent partial answer (same
    contract as connected_components).

    The SQL oracle chains one peel CTE per pass (a fixed chain of
    length ``max_iterations`` is exact whenever the peel converges
    within it — peeling is monotone and idempotent after convergence,
    and non-convergence raises loudly here instead of mismatching)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError("on_nonconverged must be 'raise' or 'warn'")
    e = _canonical_undirected(edges, src, dst).localCheckpoint()
    converged = False
    # max_iterations FILTER passes, max_iterations+1 probes: a peel that
    # drops its last node in pass max_iterations is converged (the final
    # probe confirms it) — probing only before each filter would reject
    # exactly-at-budget runs that produced the correct core
    for i in range(max_iterations + 1):
        # node-grain degree table, materialized ONCE per pass: both the
        # scalar convergence probe and the semi-join filter read it
        # (unmaterialized, the filter's plan would re-run the full
        # degree aggregation a second time). r9: the checkpoint is
        # LAZY and the probe count is its materializing action — the
        # filter below then reads the cached partitions, fusing what
        # was two blocking jobs per pass (checkpoint fill + count)
        # into one (the connected_components r9 pattern).
        deg = (e.select(F.col("a").alias("node"))
               .unionAll(e.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
               .localCheckpoint(eager=False))
        dropped = deg.where(F.col("d") < k).count()
        if dropped == 0:
            converged = True
            break
        if i == max_iterations:
            break  # budget exhausted with peeling still in progress
        keep = deg.where(F.col("d") >= k).select("node")
        e = (e.join(keep.withColumnRenamed("node", "a"), "a", "semi")
             .join(keep.withColumnRenamed("node", "b"), "b", "semi")
             .select("a", "b").localCheckpoint())
    if not converged:
        msg = (f"k_core(k={k}) did not converge within "
               f"{max_iterations} iterations")
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings
        warnings.warn(msg)
    return (e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("core_deg")))


def k_core_oracle_sql(edge_cte: str, *, k: int, passes: int) -> str:
    """Generate the chained-CTE DuckDB oracle for ``k_core``: ``passes``
    peel rounds over an edge CTE named ``e0`` (provided by
    ``edge_cte``), each keeping only edges whose BOTH endpoints have
    degree >= k in the previous round's edge set."""
    # every e{i} is referenced three times by pass i+1 — MATERIALIZED
    # stops DuckDB's default CTE inlining from expanding the chain
    # exponentially (2^passes lineitem scans otherwise)
    parts = [edge_cte]
    for i in range(passes):
        parts.append(f"""k{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT node, count(*) AS d FROM (
      SELECT a AS node FROM e{i} UNION ALL SELECT b AS node FROM e{i})
    GROUP BY node)
  WHERE d >= {k}
), e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a IN (SELECT node FROM k{i}) AND b IN (SELECT node FROM k{i})
)""")
    return (f"WITH {', '.join(parts)}\n"
            f"SELECT node, count(*) AS core_deg FROM (\n"
            f"  SELECT a AS node FROM e{passes}"
            f" UNION ALL SELECT b AS node FROM e{passes})\n"
            f"GROUP BY node")


def label_propagation(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst", iterations: int = 3) -> DataFrame:
    """Deterministic semi-synchronous label propagation (community
    detection): every node starts labeled with its own id; each round,
    every node adopts the most frequent label among its NEIGHBORS, ties
    broken by the smallest label — a total order, so the result is
    bit-reproducible across engines and partitionings (classic LPA
    breaks ties randomly; the deterministic rule is what makes a SQL
    oracle possible). Fixed ``iterations`` rounds (the oracle chains
    one CTE per round; LPA is conventionally run a small fixed number
    of rounds — it has no guaranteed fixpoint, labels can oscillate).

    Plan per round: adjacency join against the node-grain label table
    (shuffle on the neighbor key), a (node, label) count aggregation
    with map-side partials, and a per-node argmax window partitioned by
    node — all keyed hash exchanges, nothing node-quadratic; the label
    table is localCheckpoint'ed per round (lineage truncation, the
    iterative-op rule). Returns (node, community)."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    und = _canonical_undirected(edges, src, dst)
    adj = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionAll(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
           .localCheckpoint())
    # r9: per-round checkpoints (and the init) are LAZY — localCheckpoint
    # truncates the LOGICAL plan to an RDD scan eagerly either way, so
    # round r+1's plan never replays rounds 1..r regardless; with
    # eager=False the rounds execute as stages of the CALLER's one
    # action instead of `iterations` blocking driver jobs. adj stays
    # eager: it feeds every round (and two union branches), so one
    # materialization up front avoids any concurrent double-compute.
    labels = (adj.select(F.col("u").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint(eager=False))
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(iterations):
        labels = (adj.join(labels.withColumnRenamed("node", "u"), "u")
                  .groupBy(F.col("v").alias("node"), "label")
                  .agg(F.count(F.lit(1)).alias("c"))
                  .withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select("node", "label")
                  .localCheckpoint(eager=False))
    return labels.select("node", F.col("label").alias("community"))


def lpa_oracle_sql(edge_cte: str, *, iterations: int) -> str:
    """Generate the chained-CTE DuckDB oracle for ``label_propagation``
    over an edge CTE named ``e0``: one most-frequent-neighbor-label
    round per CTE, same (count desc, label asc) tie-break."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    parts = [edge_cte, """adj AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0
), l0 AS MATERIALIZED (
  SELECT DISTINCT u AS node, u AS label FROM adj
)"""]
    for i in range(iterations):
        parts.append(f"""l{i + 1} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rn
    FROM (
      SELECT adj.v AS node, l.label, count(*) AS c
      FROM adj JOIN l{i} l ON l.node = adj.u
      GROUP BY adj.v, l.label))
  WHERE rn = 1
)""")
    return (f"WITH {', '.join(parts)}\n"
            f"SELECT node, label AS community FROM l{iterations}")


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact triangle + wedge count with DEGREE-ORDERED orientation —
    the standard trick that makes distributed triangle enumeration
    O(m^1.5) instead of O(sum deg^2):

      1. canonicalize to undirected distinct edges (a < b, no loops);
      2. orient every edge from its lower-(degree, id) endpoint to the
         higher one — a DAG under the total order (deg, id), where
         every node's OUT-degree is O(sqrt(m)) (a node with out-degree
         t has t neighbors of degree >= its own >= t, so t^2 <= 2m);
      3. wedges: self-join oriented edges on the tail u, ordered
         (x before y under the same total order) so each wedge builds
         once — sum of out-deg^2 <= m * sqrt(2m) rows, the bound a
         naive (unoriented) neighbor join does not have: a single
         high-degree hub (every catalog has one) makes the naive wedge
         set quadratic in its degree, while orientation caps it;
      4. close: equi-join wedges against oriented edges on (x, y) —
         the closing edge is always oriented x -> y because the order
         is total and consistent across steps.

    All equi-joins and hash aggregations — no driver state, no
    cartesian. Returns ONE row: (triangles, wedges), where ``wedges``
    is the TOTAL path-of-length-2 count sum(C(deg(v), 2)) — the
    orientation-independent denominator of the global clustering
    coefficient 3*triangles/wedges (K4: 4 triangles, 12 wedges,
    CC = 1). The ORIENTED wedge set built internally is smaller (each
    triangle closes exactly one oriented wedge) and is never exposed."""
    und = _canonical_undirected(edges, src, dst)
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.struct(F.col("da"), F.col("a"))
                   < F.struct(F.col("db"), F.col("b")))
    o = (und.join(da, "a").join(db, "b")
         .select(F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
                 F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
                 F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv")))
    e1 = o.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = o.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = (e1.join(e2, "u")
              .where(F.struct(F.col("dx"), F.col("x"))
                     < F.struct(F.col("dy"), F.col("y")))
              .select("x", "y"))
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("triangles"))
    # total wedges from the degree table (node-grain, one tiny agg) —
    # NOT the oriented wedge count, which undercounts the CC denominator
    n_wedges = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long").alias("wedges"))
    return tri.crossJoin(n_wedges)


def link_prediction(edges: DataFrame, *, src: str = "src",
                    dst: str = "dst", hub_cap: int = 256,
                    top_k: int = 5) -> DataFrame:
    """Common-neighbors + resource-allocation link prediction — the
    classic structural recommender ("parts bought together predict the
    next co-purchase"): for every non-adjacent pair (x, y) sharing at
    least one neighbor, score

      cn        = |N(x) ∩ N(y)|
      ra_micro  = sum over shared z of floor(1e6 / deg(z))

    (Zhou et al.'s resource-allocation index — like Adamic-Adar but
    with a rational 1/deg instead of 1/log deg, so the score is an
    exact int64 and hash-reproducible in SQL).

    Scale shape: the wedge join enumerates 2-paths THROUGH each center
    z, so a degree-D hub contributes D^2 pairs — ``hub_cap`` excludes
    centers above the cap, the standard CN/RA hub guard (a hub's
    1/deg ≈ 0 contributes noise, not signal; recall loss is bounded and
    documented, not silent: at 100 TB you'd tier the cap by degree
    quantile). Candidate pruning is structural (>= 1 shared neighbor),
    existing edges drop via one anti-join on the canonical pair, and
    the per-node top-``top_k`` is a partitioned window (node grain,
    never global).
    """
    if hub_cap < 1:
        raise ValueError("hub_cap must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    # canonicalize like the other undirected ops (k_core/triangles):
    # reversed-stored or bidirectional inputs would otherwise slip the
    # existing-edge anti-join and double degrees
    # persist the canonical edge set: BOTH the adjacency (wedge join)
    # and the existing-edge anti-join read it, and its lineage is the
    # caller's whole edge-construction pipeline (a basket explode for
    # the part graph) — without the pin the anti-join branch replays it
    e0 = track_persist(_canonical_undirected(edges, src, dst))
    # both directions in ONE pass over the cached edges: explode a
    # 2-struct array instead of unionByName (which scanned the cache
    # twice and duplicated every downstream subtree that consumed it)
    adj = (e0.select(F.explode(F.array(
               F.struct(F.col("a").alias("node"), F.col("b").alias("nbr")),
               F.struct(F.col("b").alias("node"), F.col("a").alias("nbr"))))
           .alias("e")).select("e.node", "e.nbr"))
    # degree via partial aggregate + join — the SKEW-SAFE shape (r10,
    # guide §2.5): the r9 count-over-window buffered a hub node's whole
    # adjacency in ONE window task BEFORE hub_cap could drop it, and
    # AQE skew handling never applies to window exchanges. The degree
    # table is node-grain (tiny after map-side partials); AQE
    # broadcasts it or skew-splits the join at runtime. Same integer
    # per node; hubs drop from the agg OUTPUT before the join.
    deg = (adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
           .where(F.col("d") <= hub_cap))
    # persist the capped adjacency: BOTH wedge sides (a1, a2) read it,
    # and its lineage is the caller's whole edge-construction pipeline
    centers = track_persist(adj.join(deg, "node"))
    a1 = centers.select("node", F.col("nbr").alias("x"), "d")
    a2 = centers.select("node", F.col("nbr").alias("y"))
    wedges = (a1.join(a2, "node")
              .where(F.col("x") < F.col("y")))
    scored = (wedges.groupBy("x", "y")
              .agg(F.count(F.lit(1)).alias("cn"),
                   F.sum(F.expr("1000000 div d")).alias("ra_micro")))
    non_edges = scored.join(
        e0, (scored.x == e0.a) & (scored.y == e0.b), "left_anti")
    # emit each surviving pair in both orientations with ONE explode —
    # the former unionByName replayed the whole wedge+anti-join subtree
    # once per branch (plan audit r10: the entire pipeline appeared
    # twice under the final union)
    both = (non_edges.select(F.explode(F.array(
                F.struct(F.col("x").alias("node"),
                         F.col("y").alias("candidate")),
                F.struct(F.col("y").alias("node"),
                         F.col("x").alias("candidate"))))
            .alias("p"), "cn", "ra_micro")
            .select("p.node", "p.candidate", "cn", "ra_micro"))
    w = Window.partitionBy("node").orderBy(
        F.col("ra_micro").desc(), F.col("cn").desc(), "candidate")
    return (both.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_k))


def random_walks(edges: DataFrame, *, src: str = "src", dst: str = "dst",
                 walks: int = 2, steps: int = 4, seed: int = 7) -> DataFrame:
    """DeepWalk-style random-walk corpus over an undirected edge set —
    the sequence generator graph-embedding pipelines (DeepWalk,
    node2vec p=q=1) feed to a skip-gram trainer. Walks are HASH-SEEDED
    and therefore reproducible: at step s of walk w from start node v,
    the next hop is neighbor rank md5(start:w:s:cur:seed) mod deg(cur)
    — no RNG state, so the corpus is identical under any partitioning,
    re-run, or engine (the negative-sampling/training-shuffle
    convention).

    Plan shape: adjacency ranks come from one partitioned window
    (per-node grain); each step is ONE equi-join of the frontier
    against the ranked adjacency on the node key with the rank pick as
    a join predicate — walk extension is embarrassingly data-parallel,
    frontier size = nodes x walks at every step, and the loop unrolls
    ``steps`` joins into one lazy plan (chained-CTE replayable). Emits
    (start, walk, step, node) rows including step 0.

    The adjacency-side join strategy is SIZE-ADAPTIVE (the persisted
    adjacency's measured row count, not optimizer estimates, which
    undersell the union+window expansion): when the ranked adjacency
    fits the broadcast budget, every step joins broadcast-hash — the
    frontier never shuffles and the single broadcast exchange is reused
    across all ``steps`` joins; past the budget it pins shuffle_hash
    (the 100 TB shape — a corpus-scale adjacency must never broadcast).
    Round-8 alternatives measured and rejected: a (node, rank)
    composite-key 1:1 equi-join (frontier carries the degree) removed
    the per-probe deg(cur) fan-out but timed equal at sf10 (34.0 vs
    34.7 s — part-graph degrees are bounded, so the fan-out never
    dominates) and 15-40% slower at sf0.1 (extra adjacency-build join);
    the remaining cost is plan depth — ``steps`` chained joins is the
    floor for a sequential-dependency walk."""
    if walks < 1 or steps < 1:
        raise ValueError("walks and steps must be >= 1")
    e0 = _canonical_undirected(edges, src, dst)  # columns (a, b), a < b
    adj = (e0.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionByName(e0.select(F.col("b").alias("node"),
                                  F.col("a").alias("nbr"))))
    w_rank = Window.partitionBy("node").orderBy("nbr")
    ranked = adj.withColumn("rank", F.row_number().over(w_rank))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    ranked = track_persist(ranked.join(deg, "node"))
    # ~40 bytes/row (3 numeric cols + row overhead) against the
    # session's autoBroadcastJoinThreshold, CAPPED at 8 MB: measured at
    # sf10 (714k adjacency rows, ~28 MB estimate) the broadcast plan is
    # 1.4x SLOWER than shuffle-hash (49.6 vs 34.7 s — per-step rebuild
    # of a multi-MB hash relation on every executor thread beats the
    # frontier shuffle it saves), while at sf0.1-sf1 (<3 MB) broadcast
    # wins 27% (5.9 -> 4.3 s). The count() also pre-warms the persist
    # so the window/union runs once, not per step.
    n_adj = ranked.count()
    threshold = min(int(ranked.sparkSession.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "67108864") or 0),
        8 * 1024 * 1024)
    if threshold > 0 and n_adj * 40 <= threshold:
        ranked = F.broadcast(ranked)
    else:
        ranked = ranked.hint("shuffle_hash")

    # walk ids via explode of a literal array — a crossJoin against a
    # walk-id frame would plan as a nested-loop join (audit-forbidden)
    starts = (adj.select("node").distinct()
              .withColumn("walk", F.explode(F.array(
                  *[F.lit(i).cast("int") for i in range(walks)]))))
    frontier = starts.select(F.col("node").alias("start"), "walk",
                             F.col("node").alias("cur"))
    out = frontier.select("start", "walk", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))
    for s in range(1, steps + 1):
        pick = (frontier.join(ranked, frontier.cur == ranked.node)
                .withColumn("__r", F.conv(F.substring(F.md5(F.concat_ws(
                    ":", F.col("start").cast("string"),
                    F.col("walk").cast("string"), F.lit(str(s)),
                    F.col("cur").cast("string"),
                    F.lit(str(seed)))), 1, 12), 16, 10).cast("long")
                    % F.col("deg"))
                .where(F.col("rank") == F.col("__r") + 1)
                .select("start", "walk", F.col("nbr").alias("cur")))
        out = out.unionByName(pick.select(
            "start", "walk", F.lit(s).alias("step"),
            F.col("cur").alias("node")))
        frontier = pick
    return out.withColumn("step", F.col("step").cast("int"))
