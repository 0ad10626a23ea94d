"""Retrieval pipeline over the synthetic embeddings table — the
ANN-serving lifecycle end to end: index HEALTH pre-flight (IVF balance
audit: imbalance factor, skew mass, probe-scan cost) -> two ANN
retrievers (adaptive sign-LSH and IVF) -> reciprocal-rank fusion
(integer micro-units) -> MMR diversity re-ranking of the fused list
(greedy 7*rel - 3*max_sim over a bounded pool).

The 100 TB shape: both retrievers are bucketed equi-joins; fusion is a
rank-grain union + one aggregate; MMR's quadratic half is bounded to
pool^2 per group; the audit aggregates list-grain (bounded) rows.

Run: python examples/retrieval_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.functions import similarity as S


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-retrieval")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. index health BEFORE serving: would IVF stragglers hurt?
    audit = S.ivf_balance_audit(emb, nlist="auto", nprobe=4).collect()[0]
    print(f"ivf: {audit['nonempty_lists']}/{audit['nlist']} lists, "
          f"imbalance {audit['imbalance_micro'] / 1e6:.2f}x, "
          f"probe scans {audit['probe_scan_micro'] / 1e4:.2f}% of corpus")

    # 2. two independent retrievers
    lsh = S.sign_lsh_knn(emb, k=5, nbits="auto") \
        .select("vec_id", "neighbor_id", "rank")
    ivf = S.ivf_knn(emb, k=5, nlist="auto", nprobe=4) \
        .select("vec_id", "neighbor_id", "rank")

    # 3. reciprocal-rank fusion: score = sum over lists of
    # floor(1e6 / (60 + rank)) — exact integers, the standard k=60 RRF
    fused = (lsh.unionByName(ivf)
             .groupBy("vec_id", "neighbor_id")
             .agg(F.sum(F.expr("1000000 div (60 + rank)"))
                  .alias("rrf_micro"),
                  F.count(F.lit(1)).alias("n_lists")))
    both = fused.where(F.col("n_lists") == 2).count()
    print(f"rrf: {fused.count()} fused candidates, {both} in both lists")

    # 4. MMR-diversify: relevance = integer label-centroid cosine,
    # greedy top-3 from the top-8 pool per label
    mmr = S.mmr_topk(emb, k=3, pool=8, w_rel=7, w_div=3)
    picks = mmr.orderBy("label", "rank").collect()
    print(f"mmr: {len(picks)} diverse picks across "
          f"{len({r['label'] for r in picks})} labels; "
          f"max_sim at rank 2+: "
          f"{[r['max_sim_micro'] for r in picks if r['rank'] > 1][:5]}")


if __name__ == "__main__":
    main()
