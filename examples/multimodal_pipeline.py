"""Multimodal curation pipeline: binary media -> metadata -> (stubbed)
feature extraction -> near-duplicate detection over the extracted
features. The decode kernel is a deterministic fake (no codecs in this
container) but every Spark-side seam — binary columns, Arrow batches,
feature arrays into LSH — is the real production shape.

Run: python examples/multimodal_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.functions import multimodal as M, similarity as S


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-multimodal")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    media = docs.select("doc_id", F.col("text").cast("binary").alias("media"))
    tagged = M.attach_media_metadata(media)
    feats = M.extract_features(tagged, dim=16)

    emb = feats.select(F.col("doc_id").alias("vec_id"),
                       F.col("feature").alias("embedding"))
    near = S.sign_lsh_knn(emb, k=1, nbits=6)
    dups = near.where(F.col("sim") >= 0.999)

    print(f"media rows={tagged.count()}  features={feats.count()}  "
          f"near-identical feature pairs={dups.count()}")
    tagged.groupBy("media_type").count().show()


if __name__ == "__main__":
    main()
