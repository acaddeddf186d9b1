"""Byte-pair encoding: train + apply, Spark-first.

Tier X (SURVEY.md §2.4): the reference (`cl-data-frame.lisp:1-583`) has no
text surface; training pipelines budget chunking/packing in REAL tokenizer
tokens, so the engine needs an exact BPE rather than only the
``bpe_ish_token_count`` heuristic (VERDICT r6 #4). This implements the
public Sennrich et al. 2016 word-boundary BPE algorithm (ACL '16,
"Neural Machine Translation of Rare Words with Subword Units"):

- **Training** (``train_bpe``): ONE distributed aggregation builds the
  pre-token frequency table; the top ``max_words`` rows (by count, then
  lexicographic — deterministic) come to the driver and the classic
  merge loop runs there. Driver state is the word-frequency dict — the
  k-sized-model-state pattern (same shape as k-means centroids): real
  tokenizer training samples/truncates its word table exactly like this,
  because merge quality is dominated by high-frequency words.
- **Apply** (``bpe_token_count`` / ``bpe_encode``): the merges list is a
  few-KB broadcast artifact; the apply is an Arrow-batched pandas_udf
  with an in-executor word→pieces memo cache (corpus word frequency is
  Zipfian, so the cache hit rate is extreme). Per-batch cost is linear
  in text size; nothing shuffles.
- **Expression apply** (``bpe_apply_expr``): for SMALL merge tables
  (≤ ``EXPR_MERGE_LIMIT``) the merge fold is expressible as pure Column
  operations (one array fold per merge, processed in rank order — the
  rank-order single pass is equivalent to the iterative min-rank apply
  because a merge can only create pairs of LATER rank). Used for
  plan-transparent demos and as the oracle-able twin; the pandas_udf
  path is the production path for real merge tables.

Equivalence note (why rank-order folding is exact): merging pair (a, b)
at rank k creates symbol ``ab``; any merge involving ``ab`` was created
after rank k, and merging never makes two previously non-adjacent old
symbols adjacent, so no pair with rank < k can (re)appear after rank k
is processed.  Within one pair's pass, occurrences merge left-to-right
greedily — the reference behavior.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame

#: end-of-word sentinel (Sennrich et al. §3.2) — lets merges distinguish
#: word-final subwords ("est</w>" vs "est") without crossing word bounds.
EOW = "</w>"

#: above this the nested-fold expression plan is unreasonable; use the
#: Arrow-batched apply.
EXPR_MERGE_LIMIT = 64


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


_PRETOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def pretokens(col) -> Column:
    """Pre-tokenizer: alphanumeric runs and single punctuation marks
    (whitespace dropped). The word-boundary unit BPE trains/applies
    within."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_PRETOKEN_RE), F.lit(0))


def word_frequency_table(frame, text_col: str,
                         max_words: int = 20_000) -> list[tuple[str, int]]:
    """Distributed pre-token frequency table, truncated to the top
    *max_words* by (count desc, word asc) — ONE explode + hash agg +
    top-k; deterministic."""
    sdf = _plain(frame)
    wc = (sdf.select(F.explode(pretokens(text_col)).alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
          .orderBy(F.col("c").desc(), F.col("w").asc())
          .limit(max_words))
    return [(r["w"], int(r["c"])) for r in wc.collect()]


def train_bpe(frame, text_col: str, n_merges: int = 200,
              max_words: int = 20_000) -> list[tuple[str, str]]:
    """Learn *n_merges* BPE merges from a corpus (Sennrich et al. 2016
    algorithm 1): start from characters (+ ``EOW``), repeatedly merge
    the most frequent adjacent symbol pair (ties broken
    lexicographically — deterministic across runs/engines).

    Plan: one distributed word-count aggregation; the merge loop runs
    on the driver over the truncated word table (k-sized model state).
    Returns the ranked merges list — a few-KB artifact to ship to
    ``bpe_token_count`` / ``bpe_encode``.
    """
    vocab = {}
    for w, c in word_frequency_table(frame, text_col, max_words):
        vocab[tuple(list(w) + [EOW])] = c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int],
                 cache: dict) -> list[str]:
    """Greedy min-rank BPE apply for one pre-token (reference apply)."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = sym[best_i], sym[best_i + 1]
        ab = a + b
        # merge ALL occurrences of (a, b) left-to-right
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    cache[word] = sym
    return sym


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched pandas_udf: text -> array of BPE pieces. The
    merges list travels in the closure (a few KB, serialized once per
    executor); the word->pieces memo cache amortizes Zipfian corpora."""
    import re
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    pat = re.compile(_PRETOKEN_RE)

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in pat.findall(t):
                pieces.extend(_encode_word(w, ranks, cache))
            out.append(pieces)
        return pd.Series(out)

    return _encode


def bpe_encode(frame, text_col: str, merges: list[tuple[str, str]],
               out_col: str = "bpe_pieces") -> SparkFrame:
    """Attach the BPE piece array for each document (scale path)."""
    sdf = _plain(frame)
    return SparkFrame(sdf.withColumn(
        out_col, bpe_encode_udf(merges)(F.col(text_col))))


def bpe_token_count(frame, text_col: str, merges: list[tuple[str, str]],
                    out_col: str = "n_bpe_tokens") -> SparkFrame:
    """Exact BPE token count per document — the budget unit
    ``chunk_documents`` / ``pack_sequences`` should target when real
    tokenizer parity matters (VERDICT r6 #4)."""
    sdf = _plain(frame)
    return SparkFrame(sdf.withColumn(
        out_col,
        F.size(bpe_encode_udf(merges)(F.col(text_col))).cast("long")))


def bpe_apply_expr(col, merges: list[tuple[str, str]]) -> Column:
    """Pure-expression BPE piece array for SMALL merge tables: one
    array fold per merge, in rank order (exact — see module docstring).
    Each fold rebuilds the symbol array merging adjacent (a, b)
    left-to-right. Raises above ``EXPR_MERGE_LIMIT`` (the nested plan
    stops being reasonable; use the Arrow path)."""
    if len(merges) > EXPR_MERGE_LIMIT:
        raise ValueError(
            f"{len(merges)} merges > EXPR_MERGE_LIMIT={EXPR_MERGE_LIMIT}; "
            "use bpe_encode (Arrow-batched) for real merge tables")
    c = F.col(col) if isinstance(col, str) else col
    words = F.regexp_extract_all(c, F.lit(_PRETOKEN_RE), F.lit(0))
    # char-split each word and append the EOW sentinel
    sym = F.flatten(F.transform(
        words,
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW)))))
    # NOTE: word boundaries stay intact under folding because no merge
    # pair ever spans EOW on its left (every learned left symbol ends a
    # word only via EOW itself as the right part)
    for a, b in merges:
        ab = a + b
        sym = F.aggregate(
            sym,
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(ab))))
            .otherwise(F.concat(acc, F.array(s))))
    return sym
