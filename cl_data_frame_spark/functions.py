"""Scalar/collection function surface (SURVEY §2.2 'Scalar function
library' — absent in the reference, whose row functions are arbitrary
Lisp closures).

The engine's deliberate design is passthrough: ``pyspark.sql.functions``
IS the scalar library (string/date/math/array/map/json, all JVM-side and
whole-stage-codegen'd), re-exported here as ``F`` so user code imports
one engine namespace. On top of that live the engine-specific expression
builders that the reference's capability class needs but Spark lacks as
built-ins — exact decimal-routed sums for cross-engine reproducibility,
cosine similarity over embedding arrays, shingling/tokenization, hash
fingerprints.

Everything here returns ``Column`` expressions: they compose with
``SparkFrame.map_rows``/``add_columns`` and stay inside Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# engine-specific expression builders, one namespace
from .operators.dedup import (char_shingles, cosine_similarity,
                              shingle_hashes, word_ngrams)
from .operators.multimodal import content_hash
from .operators.textstats import (bpe_ish_token_count, fingerprint,
                                  mean_word_length, punct_ratio,
                                  quality_score, remove_stopwords,
                                  rolling_hash_fingerprints,
                                  stopword_ratio, token_count, tokens)

__all__ = [
    "F",
    "dec_sum",
    "char_shingles", "word_ngrams", "shingle_hashes", "cosine_similarity",
    "content_hash",
    "tokens", "token_count", "bpe_ish_token_count", "remove_stopwords",
    "mean_word_length", "punct_ratio", "stopword_ratio", "quality_score",
    "fingerprint", "rolling_hash_fingerprints",
]


def dec_sum(col, scale: int = 2, precision: int = 18) -> Column:
    """Exact, order-independent SUM of a floating column: route through a
    decimal so partial/final aggregation order cannot perturb the result —
    required for cross-engine (oracle) reproducibility of big sums."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
