"""Training-data curation pipeline over the synthetic documents table:
quality-filter -> language-gate -> exact dedup -> near-dup (MinHash LSH)
-> LM perplexity gate -> domain-mixture sampling -> token-window
chunking -> token accounting. The 100 TB shape: every
stage is a narrow projection or a keyed equi-join; sampling and split
assignment are pure hash functions (reproducible under any
partitioning, engine, or re-ingest).

Run: python examples/training_data_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streams_spark import get_spark
from go_streams_spark.functions import text as T, dedup as D


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-curation")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    scored = docs.select(
        "doc_id", "text",
        T.lang_id("text").alias("lang_pred"),
        F.round(T.quality_score("text"), 4).alias("quality"),
        T.token_count("text").alias("n_tokens"))
    kept = scored.where((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))

    exact = D.exact_dedup(kept)
    survivors = kept.join(exact.select(F.col("keeper").alias("doc_id")), "doc_id")

    near = D.ngram_jaccard_pairs(survivors, threshold=0.5)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = survivors.join(drop, "doc_id", "left_anti")

    # LM-perplexity gate: the corpus is its own bigram model (add-1);
    # drop the most surprising tail (CCNet-style quality filtering)
    ppl = T.bigram_lm_doc_scores(docs).select("doc_id", "ppl")
    cutoff = ppl.agg(F.expr("percentile_approx(ppl, 0.95)")).first()[0]
    # LEFT join: docs with < 2 tokens have no bigram row; absence of a
    # perplexity score is not a reason to drop a doc that passed every
    # other gate
    deduped = (deduped.join(ppl, "doc_id", "left")
               .where(F.col("ppl").isNull() | (F.col("ppl") <= cutoff)))

    # domain-mixture sampling: a deterministic salted-hash coin applies
    # per-source target rates (down-weight over-represented sources)
    u = ((F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 13),
        16, 10).cast("double") + 1) / F.lit(4503599627370497.0))
    final = deduped.join(
        docs.select("doc_id", "source"), "doc_id").where(
        u <= F.when(F.col("source").isin("src0", "src1", "src2"), 0.5)
             .otherwise(0.9))

    print(f"input={docs.count()} kept={kept.count()} "
          f"exact_survivors={survivors.count()} deduped={deduped.count()} "
          f"final={final.count()}")
    final.select(F.sum("n_tokens").alias("total_tokens")).show()

    # training windows: size-32 token chunks at stride 24 (overlap 8)
    chunks = T.token_window_chunks(
        final.select("doc_id", "text"), size=32, stride=24)
    print(f"chunks={chunks.count()}")

    # train/valid/test assignment + sequence packing: both pure hash
    # functions of the doc — reproducible at any scale, no coordination
    from pyspark.sql import Window
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long") % 10
    split_col = (F.when(b < 8, "train").when(b == 8, "valid")
                 .otherwise("test").alias("split"))
    w = (Window.partitionBy("split").orderBy(F.md5(F.col("doc_id").cast("string")))
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = (final.select(split_col, "doc_id", "n_tokens")
              .withColumn("batch_id", F.floor(
                  F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2000)))
    (packed.groupBy("split")
     .agg(F.count(F.lit(1)).alias("docs"),
          F.countDistinct("batch_id").alias("batches"),
          F.sum("n_tokens").alias("tokens"))
     .orderBy("split").show())

    # the composed round-5 chains (each stage registry-gated on its own)
    curation_round5(spark, sf_dir)
    web_corpus_round5c(spark, sf_dir)
    tokenizer_and_mixing_round8(spark, sf_dir)
    corpus_statistics_round9(spark, sf_dir)


def curation_round5(spark, sf_dir="/root/testdata/sf0.001"):
    """The round-5 curation chain, end to end: exact-substring span
    removal -> NB quality classification -> isotonic calibration of
    the scores -> temperature mixture sampling -> leakage-safe
    splitting. Every stage is oracle-checked individually in the
    query registry; this shows them composed."""
    from go_streams_spark.functions import dedup as D
    from go_streams_spark.functions import text as T2
    from go_streams_spark.functions.checks import isotonic_calibration
    from go_streams_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")

    # 1. cut corpus-repeated 16-token spans (Lee et al. 2022)
    cleaned = D.remove_duplicate_spans(docs, span=16)
    base = (docs.select("doc_id", "lang", "source")
            .join(cleaned.where(F.col("clean_text") != "")
                  .select("doc_id", F.col("clean_text").alias("text")),
                  "doc_id"))

    # 2. model-based quality: NB over hashed n-grams, trained on a
    #    deterministic split with lang='en' as the class
    scored = T2.nb_classifier_scores(
        base, label=F.col("lang") == "en",
        train=F.col("doc_id") % 5 < 4, keep_cols=("lang", "source"))

    # 3. calibrate the raw log-odds into monotone probabilities
    cal = isotonic_calibration(
        scored.select("log_odds", (F.col("lang") == "en").alias("y")),
        score_col="log_odds", label_col="y", bins=16)
    print("calibration table (monotone):")
    cal.orderBy("bin").show()

    # 4. temperature-balance sources, then 5. leakage-safe split
    #    (near-dup clusters never straddle train/eval) — both in the
    #    registry as temperature_mixture_sample / leakage_safe_split
    kept = scored.where(F.col("pred"))
    print(f"docs={docs.count()} after_span_removal={base.count()} "
          f"quality_kept={kept.count()}")


def web_corpus_round5c(spark, sf_dir="/root/testdata/sf0.001"):
    """The round-5 web-corpus front half, end to end: HTML strip ->
    unicode normalization -> compression-ratio + heuristic quality
    filter -> canonical-URL dedup (keep lowest doc id per canonical
    key) -> deterministic training-shuffle export. Every stage is
    oracle-checked individually in the registry; this shows them
    composed the way a crawl-ingest job would run them."""
    from pyspark.sql import Window
    from go_streams_spark.functions import text as T2
    from go_streams_spark.operators.layout import training_shuffle
    from go_streams_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    # crawl shape: html-wrapped text + a URL with tracking noise
    crawl = docs.select(
        "doc_id",
        F.concat(F.lit("<html><body><p>"), "text",
                 F.lit("</p></body></html>")).alias("html"),
        F.concat(F.lit("https://Example.com/doc/"),
                 (F.col("doc_id") % 400).cast("string"),
                 F.lit("?utm_source=crawl")).alias("url"))

    # 1-2. extract + normalize text
    clean = crawl.select(
        "doc_id", "url",
        T2.normalize_text(T2.strip_html("html")).alias("text"))
    # 3. quality: drop highly-compressible (templated) or low-score docs
    ratio = T2.compression_ratio(clean, level=6).select("doc_id", "ratio")
    kept = (clean.join(ratio, "doc_id")
            .where((F.col("ratio") > 0.3)
                   & (T2.quality_score("text") > 0.2)))
    # 4. URL-level dedup on the canonical key (doc_id % 400 collides by
    #    construction -> ~20% drop), keep the lowest doc id
    canon = kept.withColumn("canon", T2.canonical_url("url"))
    w = Window.partitionBy("canon").orderBy("doc_id")
    deduped = (canon.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    # 5. reproducible pseudo-random epoch order, no global sort
    sharded = training_shuffle(deduped, id_col="doc_id", shards=4, seed=1)
    n_in, n_kept, n_out = crawl.count(), kept.count(), sharded.count()
    print(f"crawl={n_in} quality_kept={n_kept} url_deduped={n_out}")
    assert n_out <= n_kept <= n_in


def tokenizer_and_mixing_round8(spark, sf_dir="/root/testdata/sf0.001"):
    """The round-8 tokenizer + mixing chain: CCNet head/middle/tail
    perplexity terciles per language (keep head+middle), UniMax integer
    water-fill of a 40% token budget over the surviving sources, and a
    WordPiece segmentation report of the corpus's top words — the
    stages between "cleaned corpus" and "sampler config" in a
    pretraining data plan. Every stage is registry-gated on its own
    (ccnet_ppl_buckets / unimax_budget_allocation /
    wordpiece_segment_report)."""
    import os as _os

    from pyspark.sql import Window

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))

    # CCNet bucketing: per-language ppl terciles; drop the tail
    ppl = T.bigram_lm_doc_scores(docs).select("doc_id", "ppl")
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    bucketed = (ppl.join(docs.select("doc_id", "lang", "source", "text"),
                         "doc_id")
                .withColumn("tercile", F.ntile(3).over(w)))
    kept = bucketed.where(F.col("tercile") <= 2)
    print(f"ccnet gate: {docs.count()} docs -> {kept.count()} head+middle")

    # UniMax water-fill: 40% token budget spread max-uniformly across
    # sources, never oversampling a source past its (post-gate) supply
    d = (kept.select("source",
                     F.size(F.filter(F.split("text", " "),
                                     lambda x: x != "")).alias("nt"))
         .groupBy("source").agg(F.sum("nt").cast("long").alias("s")))
    t = d.agg(F.sum("s").cast("long").alias("tot"),
              F.expr("(sum(s) * 2) div 5").cast("long").alias("b"),
              F.count(F.lit(1)).cast("long").alias("n"))
    ws = Window.orderBy("s", "source")
    o = d.select("source", "s", F.row_number().over(ws).alias("rn"),
                 F.sum("s").over(ws).alias("cum"))
    wr = Window.orderBy("rn")
    lv = (o.crossJoin(F.broadcast(t))
          .select(F.expr("(b - coalesce(lag(cum) over (order by rn), 0))"
                         " div (n - rn + 1)").alias("lvl"),
                  F.coalesce(F.lag("s").over(wr), F.lit(0)).alias("s_prev"),
                  F.col("s").alias("s_cur")))
    pick = (lv.where((F.col("lvl") >= F.col("s_prev"))
                     & (F.col("lvl") < F.col("s_cur")))
            .agg(F.min("lvl").alias("lvl")))
    alloc = (o.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(pick))
             .select("source", "s",
                     F.when(F.col("b") >= F.col("tot"), F.col("s"))
                     .otherwise(F.least(F.col("s"), F.coalesce(
                         F.col("lvl"), F.col("tot")))).alias("alloc")))
    alloc.orderBy("source").show(5)

    # WordPiece: train on the gated corpus, segment its top words
    report = T.wordpiece_segment_report(kept.select("doc_id", "text"),
                                        rounds=4, top_words=8)
    report.orderBy(F.col("freq").desc(), "word").show(8, truncate=False)


def corpus_statistics_round9(spark, sf_dir="/root/testdata/sf0.001"):
    """The round-9 additions composed as the "should we ingest more of
    this?" report a curation pipeline runs before committing a crawl:
    containment pass (drop one-sided copies symmetric Jaccard missed),
    then the two corpus-statistics gates — Zipf tail fit (templated vs
    natural text per language shard) and the Heaps vocabulary-growth
    curve (is new data still adding new content). Each stage is
    oracle-gated on its own in the registry."""
    from go_streams_spark.functions import dedup as D2
    from go_streams_spark.queries import QUERIES, _t

    docs = _t(spark, sf_dir, "documents")

    # 1. subsumption pass: containment >= 0.7 catches excerpts and
    #    boilerplate-wrapped copies; drop the LARGER side's duplicate
    #    (keep the canonical smaller doc is a policy choice — here we
    #    keep the lower id, matching the exact-dedup convention)
    cont = D2.containment_pairs(docs, threshold_micro=700_000)
    drop = cont.select(F.col("id_b").alias("doc_id")).distinct()
    kept = docs.join(drop, "doc_id", "left_anti")
    print(f"containment pass: {docs.count()} -> {kept.count()} docs "
          f"({cont.count()} subsumption pairs)")

    # 2. shard-quality gate: slope near -1 + high r^2 is natural text;
    #    slope near 0 flags templated/boilerplate shards
    QUERIES["zipf_tail_fit"](spark, sf_dir) \
        .orderBy("lang").show(10, truncate=False)

    # 3. saturation: flattening new_types means the next batch of this
    #    source adds volume, not content — tighten filters instead
    QUERIES["heaps_vocab_growth"](spark, sf_dir) \
        .orderBy("bucket").show(10, truncate=False)


if __name__ == "__main__":
    main()
