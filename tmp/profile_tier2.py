import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from go_streams_spark.session import get_spark
from go_streams_spark.queries import QUERIES
from go_streams_spark.plans import release_tracked

spark = get_spark()
sc = spark.sparkContext
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

def noop(df):
    df.write.format("noop").mode("overwrite").save()

names = sys.argv[1:] or [
    "mrl_truncation_eval", "image_png_decode_features",
    "bpe_fertility_by_lang", "wordpiece_segment_report",
    "link_prediction_parts", "ann_sign_lsh_multiprobe",
    "tokenizer_fertility_compare",
]
# warm the JVM broadly first
for n in names:
    try:
        noop(QUERIES[n](spark, sf_dir))
    except Exception as e:
        print("WARM FAIL", n, e)
    release_tracked()

st = sc.statusTracker()
for n in names:
    j0 = st.getJobIdsForGroup(None)
    best = 99e9
    for _ in range(2):
        t0 = time.time()
        noop(QUERIES[n](spark, sf_dir))
        best = min(best, time.time() - t0)
        release_tracked()
    jobs = len(st.getJobIdsForGroup(None)) - len(j0)
    print(f"{n}: {best:.2f}s  jobs(2 runs)={jobs}", flush=True)
