"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal plumbing (north-star ops beyond the reference surface)."""

from . import text, dedup, similarity, multimodal  # noqa: F401
