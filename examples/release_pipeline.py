"""Dataset RELEASE pipeline — the front half a corpus goes through
right before it ships, composing the round-6/7 operators end to end:

  hygiene (HTML strip -> unicode normalize) -> PII scrub (count, then
  redact) -> benchmark decontamination (drop training docs whose
  distinct word 5-grams are contained in the held-out benchmark split)
  -> token-budget selection (quality-ranked cut to ~60% of surviving
  tokens) -> dataset card (the release's audit row: sizes, PII totals,
  drop counts).

The 100 TB shape: hygiene + PII are per-row JVM expression chains (zero
shuffle); decontamination is a gram-keyed equi-join against the
DISTINCT benchmark-gram set (never doc x doc); the budget cut's only
ordered stage is one boundary quality-bucket; the card is a single
reduce. Nothing in the pipeline collects data to the driver.

Run: python examples/release_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.functions import text as T


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-release")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # treat src0 as the held-out benchmark split; everything else is the
    # candidate training corpus
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")

    # 1) hygiene: strip markup, repair mojibake, NFC, collapse spaces
    clean = corpus.select(
        "doc_id", "source",
        T.normalize_text(T.strip_html("text")).alias("text"))

    # 2) PII scrub: counts on the progressively-redacted text, then the
    # redaction itself — the card reports what was found, the release
    # ships only the redacted text
    redacted, counts = T.pii_scrub("text")
    scrubbed = clean.select("doc_id", "source", redacted.alias("text"),
                            *counts)
    pii_cols = [c for c in scrubbed.columns if c.startswith("n_")]
    scrubbed = scrubbed.withColumn(
        "n_pii", sum(F.col(c) for c in pii_cols))

    # 3) decontamination: a training doc is burned when >10% of its
    # distinct word 5-grams appear anywhere in the benchmark split —
    # containment, the asymmetric metric (a short benchmark item fully
    # inside a long training doc still scores 1.0 on the item; here we
    # score the training side to decide what to DROP)
    def grams(df):
        toks = F.filter(F.split(F.lower(F.col("text")), " "),
                        lambda x: x != "")
        pos = df.select("doc_id", F.posexplode(toks).alias("p", "tok"))
        w = Window.partitionBy("doc_id").orderBy("p")
        leads = [F.lead("tok", i).over(w) for i in range(1, 5)]
        return (pos.select("doc_id",
                           F.concat_ws(" ", F.col("tok"), *leads).alias("g"),
                           leads[-1].alias("_t"))
                .where(F.col("_t").isNotNull())
                .select("doc_id", "g").distinct())

    bench_grams = grams(bench).select("g").distinct()
    doc_grams = grams(scrubbed)
    contained = (doc_grams.join(
        bench_grams.withColumn("__hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.count("__hit").alias("n_leaked")))
    burned = contained.where(
        F.col("n_leaked") * 10 > F.col("n_grams"))  # containment > 0.1
    decontaminated = scrubbed.join(burned.select("doc_id"), "doc_id",
                                   "left_anti")

    # 4) quality-ranked token-budget cut: keep the best docs until ~60%
    # of the surviving corpus tokens
    verdicts = T.token_budget_select(decontaminated,
                                     budget_frac_micro=600_000)
    released = decontaminated.join(
        verdicts.where("selected").select("doc_id", "n_tokens"), "doc_id")

    # 5) dataset card — one audit row per release
    card = (released.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_pii").alias("pii_redactions"))
        .crossJoin(F.broadcast(
            corpus.agg(F.count(F.lit(1)).alias("n_candidates"))))
        .crossJoin(F.broadcast(
            burned.agg(F.count(F.lit(1)).alias("n_burned")))))
    row = card.first()
    assert row["n_docs"] > 0 and row["n_tokens"] > 0
    assert row["n_docs"] + row["n_burned"] <= row["n_candidates"]
    print("release card:", row.asDict())


if __name__ == "__main__":
    main()
