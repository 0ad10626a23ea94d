import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from go_streams_spark.session import get_spark
from go_streams_spark.queries import QUERIES, _t
from go_streams_spark.plans import release_tracked
from go_streams_spark.functions.similarity import sign_band_rows, as_double, dot
from pyspark.sql import functions as F

spark = get_spark()
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
emb = _t(spark, sf_dir, "embeddings")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def timed(label, fn, n=2):
    best = 9e9
    for _ in range(n):
        t0 = time.time(); fn(); best = min(best, time.time()-t0)
    print(f"{label}: {best:.2f}s", flush=True)

timed("full query", lambda: (noop(QUERIES["embedding_near_dup_lsh"](spark, sf_dir)), release_tracked()), 3)

bands = (sign_band_rows(emb, id_col="vec_id", vec_col="embedding",
                        nbits=16, max_band_hamming=5)
         .select(F.col("vec_id"), "band", "band_key"))
a, b = bands.alias("a"), bands.hint("merge").alias("b")
cand = (a.join(b, ["band", "band_key"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct())
timed("candidates distinct", lambda: noop(cand))
print("n candidates:", cand.count())
nsq = F.aggregate(F.transform(F.col("v"), lambda x: x * x),
                  F.lit(0.0), lambda acc, x: acc + x)
vecs = emb.select(F.col("vec_id"), as_double("embedding").alias("v")).withColumn("nsq", nsq)
va = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nsq").alias("na"))
vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nsq").alias("nb"))
cand2 = (cand.join(va.hint("shuffle_hash"), "id_a").join(vb.hint("shuffle_hash"), "id_b"))
timed("attach vectors", lambda: noop(cand2))
res = (cand2.select("id_a", "id_b",
        F.round(dot(F.col("va"), F.col("vb")) / (F.sqrt("na") * F.sqrt("nb")), 6).alias("sim"))
       .where(F.col("sim") >= 0.5))
timed("verify (dot+filter)", lambda: noop(res))
