import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from go_streams_spark.session import get_spark
from go_streams_spark.queries import _t
from pyspark.sql import functions as F
from go_streams_spark.functions.similarity import quantized_vec

spark = get_spark()
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
emb = _t(spark, sf_dir, "embeddings")
print("n vectors:", emb.count(), "dim:", len(emb.select("embedding").first()[0]))

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def timed(label, fn, n=2):
    best = 9e9
    for _ in range(n):
        t0 = time.time(); fn(); best = min(best, time.time()-t0)
    print(f"{label}: {best:.2f}s", flush=True)

scale = 10**6
dl = [8, 16, 32]
def _isum(arr):
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
base = emb.select(F.col("vec_id"), quantized_vec("embedding", scale).alias("v"))
base = base.select("vec_id", "v",
    *[_isum(F.transform(F.slice("v", 1, d), lambda x: x*x)).alias(f"n{d}") for d in dl],
    _isum(F.transform(F.col("v"), lambda x: x*x)).alias("nfull"))
ncols = [f"n{d}" for d in dl] + ["nfull"]
probes = (base.where(F.pmod(F.col("vec_id"), F.lit(25)) == 0)
          .select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                  *[F.col(c).alias(f"a_{c}") for c in ncols]))
cands = base.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                    *[F.col(c).alias(f"b_{c}") for c in ncols])
blocks = 32
probes_x = probes.withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(blocks-1))))
cands_k = cands.withColumn("qb", F.pmod(F.col("id_b"), F.lit(blocks)).cast("int"))
def _q(dot, na, nb):
    return (F.floor(dot / (F.sqrt(F.greatest(na, F.lit(1))) * F.sqrt(F.greatest(nb, F.lit(1)))) * scale + F.lit(0.5)) / float(scale))

timed("base only", lambda: noop(base))
join_only = (cands_k.join(probes_x.hint("shuffle_hash"), "qb")
             .where(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b"))
timed("join only (no vec work)", lambda: noop(join_only))
pairs = (cands_k.join(probes_x.hint("shuffle_hash"), "qb")
         .where(F.col("id_a") != F.col("id_b"))
         .select("id_a", "id_b",
                 *[c for c in probes_x.columns if c.startswith("a_n")],
                 *[c for c in cands.columns if c.startswith("b_n")],
                 F.zip_with("va", "vb", lambda x, y: x * y).alias("pr"))
         .select("id_a", "id_b",
                 _q(_isum(F.col("pr")), F.col("a_nfull"), F.col("b_nfull")).alias("sim_f"),
                 *[_q(_isum(F.slice("pr", 1, d)), F.col(f"a_n{d}"), F.col(f"b_n{d}")).alias(f"sim_t{d}") for d in dl]))
timed("pairs+sims", lambda: noop(pairs))
print("pair count:", pairs.count())
