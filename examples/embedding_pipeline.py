"""Embedding-corpus pipeline over the synthetic embeddings table — the
vector-store lifecycle end to end: hygiene (Mahalanobis outliers) ->
PCA whitening (the OPQ/ZCA pre-stage) -> semantic dedup (trained
integer k-means SemDeDup) -> ANN index + query (adaptive sign-LSH) ->
recall evaluation against the exact blocked kNN -> an uncertainty line
(Poisson-bootstrap CI of the mean neighbor similarity).

The 100 TB shape: moments/codebooks/whitening rows are driver-resident
index METADATA; every corpus-sized operation is a bucketed equi-join
or a single vectorized pass; the one quadratic op (exact kNN) is the
recall EVALUATOR, which production samples.

Run: python examples/embedding_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.functions import similarity as S
from go_streams_spark.functions.checks import bootstrap_mean_ci


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-embeddings")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. hygiene: flag the farthest vectors under the corpus covariance
    outliers = (S.mahalanobis_scores_exact(emb)
                .orderBy(F.col("maha2").desc()).limit(5))
    print("top outliers (vec_id, maha2):",
          [(r["vec_id"], r["maha2"]) for r in outliers.collect()])

    # 2. whitening: top-4 unit-variance axes (feed these to PQ/k-means)
    white = S.pca_whiten_embeddings(emb, out_dim=4)
    print("whitened coords:", white.count(), "rows "
          f"({white.select('vec_id').distinct().count()} vectors x 4)")

    # 3. semantic dedup with a TRAINED integer k-means codebook
    verdicts = S.semdedup_prune_exact(emb, threshold_micro=400_000,
                                      nlist=8, iterations=2)
    kept = verdicts.where("kept").count()
    print(f"semdedup: kept {kept}/{verdicts.count()}")

    # 4. ANN index + query: adaptive sign-LSH (bucket equi-join shape)
    approx = S.sign_lsh_knn(emb, k=5, nbits="auto")
    print("ann rows:", approx.count())

    # 5. recall vs the exact blocked kNN (the eval pass)
    report = S.ann_recall_against_exact(
        emb, approx.select("vec_id", "neighbor_id"), k=5).collect()[0]
    print(f"recall@5 = {report['recall_at_5']} "
          f"({report['total_hits']}/{report['possible']})")

    # 6. uncertainty: CI of mean top-1 similarity in integer micro-units
    top1 = (approx.where(F.col("rank") == 1)
            .select("vec_id",
                    F.floor(F.col("sim") * 1_000_000 + F.lit(0.5))
                    .cast("long").alias("sim_micro")))
    ci = bootstrap_mean_ci(top1, key_col="vec_id", value_col="sim_micro",
                           replicates=100).collect()[0]
    print(f"mean top-1 sim (micro): {ci['point_mean']} "
          f"[{ci['ci_low']}, {ci['ci_high']}]")

    # 7. model-migration drift: align a planted "v2" space (signed
    # dimension permutation = harmless coordinate-frame change) with
    # orthogonal Procrustes; residuals near zero prove the rotation
    # was absorbed — a real migration joins the actual v2 table
    a = F.col("embedding")
    dsz = F.size(a)
    v2 = F.transform(
        F.sequence(F.lit(0), dsz - F.lit(1)),
        lambda j: F.when(j % 2 == 0, F.element_at(a, ((j + 3) % dsz) + 1))
        .otherwise(-F.element_at(a, ((j + 3) % dsz) + 1)))
    drift = S.procrustes_residuals(
        emb.select("vec_id", a.alias("va"), v2.alias("vb")))
    mx = drift.agg(F.max("residual_sq").alias("m")).collect()[0]["m"]
    print(f"procrustes max residual_sq after alignment: {mx}")


if __name__ == "__main__":
    main()
