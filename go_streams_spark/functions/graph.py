"""Graph analytics over relationally-derived edge sets.

``connected_components`` (dedup clustering) lives in
``functions/dedup.py``; this module holds general graph ops. Everything
here is deterministic ACROSS ENGINES: PageRank runs in scaled INTEGER
arithmetic (BIGINT micro-units with floor division), so per-iteration
sums are order-independent and a DuckDB oracle reproduces every bit —
the usual float-PageRank is only reproducible run-to-run on one engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.caching import track_persist

#: PageRank mass is tracked in units of 1/SCALE (integer micro-probability)
PAGERANK_SCALE = 1_000_000_000_000


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             iterations: int = 3, damping_pct: int = 85,
             round_dp: int = 6) -> DataFrame:
    """Iterative PageRank with ENGINE-EXACT integer arithmetic.

    ``edges`` is a directed edge list (pass both directions for an
    undirected graph). Rank mass lives in BIGINT units of 1/SCALE:

        contrib(u)  = pr(u) div outdeg(u)
        pr'(v)      = (100-d)*SCALE div (100*N)  +  d*sum_in(v) div 100

    — floor division everywhere, so the result is independent of
    addition order AND identical in any engine with 64-bit integers
    (the SQL oracle chains one CTE per iteration). Total mass shrinks
    by the floor losses (bounded by N*iterations/SCALE — irrelevant at
    micro-unit scale).

    Plan shape: edges + out-degrees are computed once and pinned
    (track_persist); each iteration is one join edges-to-ranks (shuffle
    on src) + one sum by dst — the same two-exchange loop GraphX/Pregel
    runs, with lineage kept shallow because every input of iteration k
    is either cached (edges, degrees) or the (node-grain) rank table of
    iteration k-1. Returns (node, pr) with pr = scaled float, rounded.
    """
    if iterations < 0 or not 0 <= damping_pct <= 100:
        raise ValueError("iterations >= 0 and 0 <= damping_pct <= 100")
    e = track_persist(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct())
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = track_persist(
        e.select(F.col("u").alias("node")).union(
            e.select(F.col("v").alias("node"))).distinct()
        .join(deg, F.col("node") == F.col("u"), "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    n = nodes.count()  # scalar graph metadata (like an IVF codebook)
    if n == 0:
        return nodes.select(F.col("node"), F.lit(0.0).alias("pr"))

    # exact Python integer division — double division + floor can be
    # off by one ulp at an integer boundary
    base = ((100 - damping_pct) * PAGERANK_SCALE) // (100 * n)
    pr = nodes.select("node", "outdeg",
                      F.lit(PAGERANK_SCALE // n).cast("long").alias("pr"))
    for _ in range(iterations):
        # rank tables are node-grain (tiny next to edges): broadcast
        # them into the edge join so each iteration's only shuffle is
        # the dst-sum of contributions (with map-side partials)
        contrib = (e.join(F.broadcast(pr.where(F.col("outdeg") > 0)),
                          pr["node"] == e["u"])
                   .select(F.col("v").alias("node"),
                           F.expr("pr div outdeg").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (nodes.join(F.broadcast(sums), "node", "left")
              .select("node", "outdeg",
                      (F.lit(base).cast("long")
                       + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100"))
                      .cast("long").alias("pr")))
    return pr.select("node",
                     F.round(F.col("pr") / F.lit(float(PAGERANK_SCALE)),
                             round_dp).alias("pr"))
