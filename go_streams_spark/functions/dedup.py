"""Deduplication for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Design for 100 TB:
  - Exact dedup is a hash-groupBy on a digest column — one shuffle keyed
    by digest; AQE handles skew from boilerplate-heavy corpora.
  - MinHash+LSH avoids the O(N^2) pair space: signatures are computed
    per-row JVM-side (array lambdas over shingles, no UDFs), docs are
    exploded into (band, band_key) buckets, and only same-bucket docs
    join — the candidate join is an equi-join Catalyst can shuffle-hash.
    Verification (exact Jaccard) runs only on candidates.
  - SimHash packs a document into one 32-bit int; near-dup pairs are
    candidates whose hamming distance <= k (self-equi-join on band
    rotations would be the scale path; here candidates come from LSH or
    small-N cross).

All hashing is md5-based so results are bit-identical to the DuckDB
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens, word_ngrams


def content_digest(text: Column | str, *, normalize: bool = True) -> Column:
    """Exact-dup key: md5 of (optionally whitespace/case-normalized) text."""
    t = F.col(text) if isinstance(text, str) else text
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), "\\s+", " ")
    return F.md5(t)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content digest; keep the smallest id as canonical.

    One shuffle on the digest. Returns (dup_key, keeper, cnt).
    """
    return (df.withColumn("dup_key", content_digest(text_col))
            .groupBy("dup_key")
            .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 12) -> list[Column]:
    """num_hashes minhash values: min over shingles of md5(seed ':' s).

    Lexicographic min over hex digests == a deterministic hash family;
    computed entirely JVM-side per row (no shuffle, no UDF).
    """
    def _hasher(i: int):
        prefix = f"{i}:"
        # single-arg lambda: F.transform would pass the array INDEX as a
        # second argument to a two-arg callable, clobbering a default.
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return [F.array_min(F.transform(shingles, _hasher(i))) for i in range(num_hashes)]


def band_keys(mh: list[Column], rows_per_band: int) -> list[Column]:
    """LSH band keys: md5 of '|'-joined minhashes per band."""
    assert len(mh) % rows_per_band == 0
    return [F.md5(F.concat_ws("|", *mh[b:b + rows_per_band]))
            for b in range(0, len(mh), rows_per_band)]


def minhash_lsh_candidates(df: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id", ngram: int = 3,
                           num_hashes: int = 12, rows_per_band: int = 3) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >= 1 LSH bucket.

    Plan shape: project signature -> explode to (band, key) -> self
    equi-join on (band, key) -> distinct pairs. The join is key-bucketed,
    never all-pairs; distinct is one extra shuffle on the pair.
    """
    shingled = df.select(F.col(id_col), word_ngrams(text_col, ngram).alias("sh"))
    mh = minhash_signature(F.col("sh"), num_hashes)
    bands = band_keys(mh, rows_per_band)
    sig = shingled.select(
        id_col,
        F.posexplode(F.array(*bands)).alias("band", "band_key"))
    a, b = sig.alias("a"), sig.alias("b")
    return (a.join(b, ["band", "band_key"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def jaccard_verify(df: DataFrame, candidates: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", ngram: int = 3,
                   threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only; keep >= threshold.

    Joins the (small) candidate set back to shingle arrays — at scale
    both joins are shuffle-hash on the doc id; shingle arrays never
    leave their row.
    """
    sh = df.select(F.col(id_col), word_ngrams(text_col, ngram).alias("sh"))
    out = (candidates
           .join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
           .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (out.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
                        ngram: int = 3, threshold: float = 0.5,
                        num_hashes: int = 12, rows_per_band: int = 3) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify."""
    cands = minhash_lsh_candidates(df, text_col=text_col, id_col=id_col, ngram=ngram,
                                   num_hashes=num_hashes, rows_per_band=rows_per_band)
    return jaccard_verify(df, cands, text_col=text_col, id_col=id_col,
                          ngram=ngram, threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash32(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash per document from distinct lowercase tokens.

    Bit j of md5(token) (hex-decoded) contributes +1/-1; simhash bit j is
    the sign of the sum. Entirely relational: explode tokens x 32 bit
    positions, two aggregations — shuffles are keyed by (doc, j) then doc
    and combine map-side. Exactly mirrors the SQL oracle.
    """
    toks = (df.select(F.col(id_col),
                      F.explode(F.array_distinct(F.transform(tokens(text_col), F.lower)))
                      .alias("tok"))
            .withColumn("h", F.md5("tok")))
    bits = (toks.select(id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"))
            .withColumn("digit",
                        F.instr(F.lit("0123456789abcdef"),
                                F.substring(F.col("h"), (F.col("j") / 4 + 1).cast("int"), 1)) - 1)
            .withColumn("bit", F.expr("(digit >> (j % 4)) & 1")))
    sums = bits.groupBy(id_col, "j").agg(F.sum(F.col("bit") * 2 - 1).alias("s"))
    return (sums.groupBy(id_col)
            .agg(F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)"))
                       .otherwise(F.lit(0))).alias("simhash")))


def simhash_pairs(sim: DataFrame, *, id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_hamming.

    Small-N: direct self-join. Scale path: LSH on simhash bit-bands
    (split the 32 bits into max_hamming+1 bands; by pigeonhole, any pair
    within distance k shares one exact band -> equi-join per band).
    """
    a = sim.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"))
    b = sim.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
