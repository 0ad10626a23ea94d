"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting.

All hot-path logic is JVM-side Column expressions (split/regexp/array
lambdas) — no Python UDFs — so it stays inside whole-stage codegen and
scales linearly with input splits. Every function is deterministic and
has an exact ANSI-SQL equivalent (used by the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual marker-word lists for the n-gram/stopword language
# heuristic. Deliberately tiny + deterministic (this is the classic
# stopword-hit langid baseline, not a model).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
# punctuation — the standard GPT-2-style pre-split shape.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(t, " "), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens over lowercased text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_REGEX), 0)).cast("long")


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return (F.size(F.regexp_extract_all(t, F.lit("[^a-zA-Z0-9\\s]"), 0))
            / F.greatest(F.length(t), F.lit(1)))


def avg_token_len(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    toks = tokens(text)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword presence
    and moderate token length, penalizes punctuation soup — the
    length/punct/stopword-ratio baseline used by web-scale corpus
    filters."""
    sw = stopword_ratio(text)
    pr = punct_ratio(text)
    tl = avg_token_len(text)
    len_ok = F.when((tl >= 3) & (tl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.least(F.lit(1.0), F.greatest(
        F.lit(0.0), (F.lit(0.4) * F.least(sw * 4, F.lit(1.0))
                     + F.lit(0.4) * len_ok + F.lit(0.2) * (1 - F.least(pr * 5, F.lit(1.0))))))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit count per language over whitespace tokens."""
    toks = F.transform(tokens(text), F.lower)
    return {lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
            for lang, words in LANG_MARKERS.items()}


def lang_id(text: Column | str) -> Column:
    """argmax language by marker hits; ties resolve en > de > fr
    (declaration order); zero hits -> 'und'."""
    scores = lang_scores(text)
    best_val = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(scores)):  # earlier langs win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best_val), F.lit(lang)).otherwise(out)
    return out


def word_ngrams(text: Column | str, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct word n-gram shingles (space-joined)."""
    t = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(t) if lowercase else t)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    return F.array_distinct(F.when(F.size(toks) >= n, F.transform(idx, gram))
                            .otherwise(F.array()))


def fingerprint(text: Column | str, n: int = 4) -> Column:
    """Rolling-hash document fingerprint: min md5 over word n-gram
    shingles (winnowing-style 1-of-N selection; deterministic)."""
    grams = word_ngrams(text, n)
    return F.array_min(F.transform(grams, F.md5))
