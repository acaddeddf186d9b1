"""Dedup operator cross-checks on synthetic corpora: the prefix-filtered
set-similarity join must equal the exhaustive quadratic baseline; MinHash
LSH must find planted near-duplicates; exact-normalized dedup keeps the
min id."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.operators import dedup as X


@pytest.fixture(scope="module")
def corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    rows = []
    for i in range(30):
        rows.append((i, base + f" variant token{i}"))       # near-dups
    rows.append((100, "completely different text about spark "
                      "catalyst optimizer plans and shuffles here"))
    rows.append((101, "completely different text about spark "
                      "catalyst optimizer plans and shuffles here"))
    rows.append((102, "unrelated short text"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(frame):
    return sorted((r["id_a"], r["id_b"])
                  for r in frame.spark_df.collect())


def test_prefix_join_equals_quadratic(corpus):
    exact = _pairs(X.ngram_jaccard_pairs(corpus, n=3, threshold=0.5,
                                         candidates="allpairs",
                                         block_col="doc_id"))  # dummy block
    prefix = _pairs(X.ngram_jaccard_pairs_prefix(corpus, n=3, threshold=0.5))
    # a per-doc block yields no pairs; rebuild quadratic without blocking
    # via a constant block column instead
    from pyspark.sql import functions as F2
    blocked = corpus.withColumn("blk", F2.lit(1))
    exact = _pairs(X.ngram_jaccard_pairs(blocked, n=3, threshold=0.5,
                                         candidates="allpairs",
                                         block_col="blk"))
    assert prefix == exact
    assert len(prefix) > 0


def test_blocked_prefix_equals_blocked_quadratic(corpus):
    from pyspark.sql import functions as F2
    blocked = corpus.withColumn("blk", (F2.col("doc_id") % 2))
    quad = _pairs(X.ngram_jaccard_pairs(blocked, n=3, threshold=0.5,
                                        candidates="allpairs",
                                        block_col="blk"))
    pref = _pairs(X.ngram_jaccard_pairs(blocked, n=3, threshold=0.5,
                                        block_col="blk"))
    assert pref == quad


def test_minhash_finds_planted_near_dups(corpus):
    out = _pairs(X.minhash_near_duplicates(corpus, num_hashes=96, bands=24,
                                           jaccard_threshold=0.8))
    # identical docs 100/101 must be found; all pairs verified >= 0.8
    assert (100, 101) in out
    jac = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in X.minhash_near_duplicates(
               corpus, num_hashes=96, bands=24,
               jaccard_threshold=0.8).spark_df.collect()}
    assert all(v >= 0.8 for v in jac.values())


def test_dedup_exact_normalized_min_id(spark):
    rows = [(5, "Hello   World"), (3, "hello world"), (9, "other text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.dedup_exact_normalized(df)
    ids = sorted(r["doc_id"] for r in out.spark_df.collect())
    assert ids == [3, 9]   # 5 collapses into 3 (min id per fingerprint)


def test_simhash_identical_docs_pair(spark):
    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "something else entirely unrelated")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = X.simhash_near_duplicates(df, max_hamming=0)
    assert sorted((r["id_a"], r["id_b"]) for r in out.spark_df.collect()) \
        == [(0, 1)]


# ---------------------------------------------------------------------------
# duplicated-span removal
# ---------------------------------------------------------------------------

def test_span_removal_drops_shared_ngrams(spark):
    shared = "one two three four five six seven eight"
    rows = [
        (1, f"alpha {shared} beta"),
        (2, f"gamma delta {shared}"),
        (3, "epsilon zeta " + " ".join(f"w{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           X.duplicated_span_removal(df, n=8).spark_df.collect()}
    # the shared 8-gram is removed from both docs that contain it
    assert out[1]["dup_tokens"] == 8
    assert out[1]["clean_text"] == "alpha beta"
    assert out[2]["dup_tokens"] == 8
    assert out[2]["clean_text"] == "gamma delta"
    # the unique doc is untouched
    assert out[3]["dup_tokens"] == 0
    assert out[3]["dup_spans"] == 0
    assert out[3]["clean_text"].startswith("epsilon zeta w0")


def test_span_removal_overlapping_spans_cover_once(spark):
    # doc 1 and 2 share a 9-token run -> two overlapping flagged 8-grams
    # in each; covered tokens are removed once, not twice
    run = "a b c d e f g h i"
    df = spark.createDataFrame(
        [(1, f"x {run}"), (2, f"{run} y")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           X.duplicated_span_removal(df, n=8).spark_df.collect()}
    assert out[1]["dup_spans"] == 2
    assert out[1]["dup_tokens"] == 9
    assert out[1]["clean_text"] == "x"
    assert out[2]["clean_text"] == "y"


def test_span_removal_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "   "), (3, "also short")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           X.duplicated_span_removal(df, n=8).spark_df.collect()}
    assert out[1]["dup_tokens"] == 0 and out[1]["clean_text"] == "too short"
    assert out[2]["n_tokens"] == 0 and out[2]["clean_text"] == ""
    assert out[3]["dup_spans"] == 0


def test_span_removal_hashed_grams_matches_plain(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = X.duplicated_span_removal(docs, n=8).spark_df
    hashed = X.duplicated_span_removal(docs, n=8, hash_grams=True).spark_df
    assert plain.select("doc_id", "dup_tokens", "clean_text").subtract(
        hashed.select("doc_id", "dup_tokens", "clean_text")).count() == 0


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

def test_semantic_dedup_min_id_rule(spark):
    # two clusters around orthogonal axes; 1/2 near-identical, 3 alone
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {r["vec_id"]: r for r in
           X.semantic_dedup(df, cents, threshold=0.95).spark_df.collect()}
    assert out[1]["keep"] is True and out[1]["dup_of"] is None
    assert out[2]["keep"] is False and out[2]["dup_of"] == 1
    assert out[3]["keep"] is True
    # cross-cluster near-identity is never compared
    assert out[3]["max_sim"] is None


def test_semantic_dedup_never_compares_across_clusters(spark):
    # identical vectors but routed to different centroids stay kept
    rows = [(1, [1.0, 1.0]), (2, [1.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # centroid 0 catches id 1? no — both route to the SAME centroid here;
    # use distinct centroids each exactly matching one vector id ordering
    cents = [(0, [1.0, 1.0])]
    out = {r["vec_id"]: r for r in
           X.semantic_dedup(df, cents, threshold=0.99).spark_df.collect()}
    # same cluster -> 2 is redundant against 1
    assert out[1]["keep"] is True and out[2]["keep"] is False


def test_self_repetition_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "p q r s x y p q r s"),       # 4-gram 'p q r s' repeats
         (2, "a b c d e f g h")],          # no repetition
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           X.self_repetition_removal(df, n=4).spark_df.collect()}
    assert out[1]["rep_spans"] == 1
    assert out[1]["rep_tokens"] == 4
    assert out[1]["clean_text"] == "p q r s x y"
    assert out[2]["rep_tokens"] == 0
    assert out[2]["clean_text"] == "a b c d e f g h"


def test_skew_safe_dedup_matches_default(spark):
    """The pre-aggregate + semi-join escape hatch must produce exactly
    the window-rank path's output — including on a mass-duplicated
    fingerprint (the case it exists for)."""
    rows = [(i, "THE  same   doc " if i % 3 else "the same doc")
            for i in range(200)]
    rows += [(1000 + i, f"unique doc number {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = X.dedup_exact_normalized(df).spark_df
    safe = X.dedup_exact_normalized(df, skew_safe=True).spark_df
    assert default.columns == safe.columns
    a = sorted(tuple(r) for r in default.collect())
    b = sorted(tuple(r) for r in safe.collect())
    assert a == b
    # the normalized mass-duplicate family collapses to its min id
    assert (0,) == tuple(r[0] for r in safe.collect()
                         if "same" in r[1])[:1]


def test_edit_distance_join_pairs_and_blocking(spark):
    from cl_data_frame_spark.operators import dedup as X
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"),
            (4, "kitten!"), (5, "dog"), (6, "completely-different")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in X.edit_distance_join(df, "id", "name", max_dist=1)
           .spark_df.collect()}
    # kitten~sitten (1 sub), sitten~sittin (1 sub), kitten~kitten! (1
    # insert, crosses a length-band boundary -> probes the +-1 bucket)
    assert out == {(1, 2): 1, (2, 3): 1, (1, 4): 1}


def test_edit_distance_join_matches_naive(spark):
    """Bucket-grid candidates must find exactly the naive quadratic
    result (soundness of the length-band blocking)."""
    from cl_data_frame_spark.operators import dedup as X
    import itertools
    names = ["alpha", "alphb", "alpha1", "beta", "betta", "bet",
             "gamma", "gamm", "gamma12", "delta"]
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = sorted((r["id_a"], r["id_b"], r["dist"])
                 for r in X.edit_distance_join(df, "id", "name",
                                               max_dist=2)
                 .spark_df.collect())

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = sorted((i, j, lev(a, b))
                  for (i, a), (j, b) in itertools.combinations(rows, 2)
                  if lev(a, b) <= 2)
    assert got == want


def test_simhash_md5_family_finds_duplicates(spark):
    """The portable md5 hash family must behave like the xxhash64 one:
    identical texts pair at hamming 0, near-identical at small hamming,
    unrelated docs don't pair."""
    from cl_data_frame_spark.operators import dedup as X
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [(1, base), (2, base),
            (3, base + "iota"),          # one extra token
            (4, "totally different words nothing shared here at all")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in X.simhash_near_duplicates(
               df, max_hamming=3, hash_fn="md5").spark_df.collect()}
    assert out[(1, 2)] == 0
    assert (1, 4) not in out and (2, 4) not in out
    for k, h in out.items():
        assert 0 <= h <= 3


def test_token_hash64_md5_matches_manual(spark):
    from cl_data_frame_spark.operators.dedup import _token_hash64
    import hashlib
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("hello",), ("world",)], ["t"])
    got = {r["t"]: r["h"] for r in df.select(
        "t", _token_hash64(F.col("t"), "md5").alias("h")).collect()}
    for t in ("hello", "world"):
        assert got[t] == int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


def test_containment_pairs_directed_subset(spark):
    from cl_data_frame_spark.frame import SparkFrame
    from cl_data_frame_spark.operators.dedup import containment_pairs
    quote = "alpha beta gamma delta epsilon zeta"
    article = quote + " eta theta iota kappa lambda mu nu xi " \
                      "omicron pi rho sigma tau"
    rows = [(1, quote), (2, article), (3, "unrelated words entirely here")]
    df = SparkFrame(spark.createDataFrame(rows, ["doc_id", "text"]))
    got = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, n=3, threshold=0.8)
           .spark_df.collect()}
    # quote's grams are fully inside the article: containment(1->2)=1.0
    assert got[(1, 2)] == 1.0
    # the reverse direction is weak (article >> quote) and filtered out
    assert (2, 1) not in got
    assert all(3 not in pair for pair in got)


def test_dedup_keep_best_prefers_score_then_min_id(spark):
    from cl_data_frame_spark.frame import SparkFrame
    from cl_data_frame_spark.operators.dedup import dedup_keep_best
    rows = [
        (1, "Hello  World", 5.0),
        (2, "hello world", 9.0),     # same normalized text, best score
        (3, "hello world ", 9.0),    # tie -> loses on id
        (4, "different doc", 1.0),
    ]
    df = SparkFrame(spark.createDataFrame(
        rows, ["doc_id", "text", "quality"]))
    kept = sorted(r.doc_id for r in
                  dedup_keep_best(df, "quality").spark_df.collect())
    assert kept == [2, 4]


def test_edit_distance_all_methods_agree(spark):
    """The deletion-neighbourhood, Ed-Join q-gram prefix, and
    length-band paths must produce identical pairs — including on a
    UNIFORM-length corpus (every name 12 chars: one hot length band,
    the measured 20x-on-10x hazard the signature paths exist to kill)
    with short/empty strings exercising the sentinel and D_0 cases."""
    from cl_data_frame_spark.operators import dedup as X
    names = [f"supplier{i:04d}" for i in range(80)]        # all len 12
    names[10] = "supplier00O1"   # 1 sub of names[1]
    names[20] = "supplier0x02"   # 1 sub+shift of names[2]
    names += ["ab", "ac", "b", ""]                         # sentinel band
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, ["id", "name"])
    for d in (1, 2):
        results = {
            m: sorted((r["id_a"], r["id_b"], r["dist"]) for r in
                      X.edit_distance_join(df, "id", "name", max_dist=d,
                                           method=m).spark_df.collect())
            for m in ("deletion", "qgram", "lengthband")}
        assert results["deletion"] == results["qgram"] == \
            results["lengthband"], d
        assert results["deletion"], d  # planted near-dups must appear


def test_edit_distance_auto_routes_by_length(spark):
    """auto = deletion for short strings; qgram once variants would
    blow up (len > 46 at d=2). Both exact — results must agree."""
    from cl_data_frame_spark.operators import dedup as X
    long = "x" * 60
    rows = [(1, long), (2, long[:-1] + "y"), (3, "abc"), (4, "abd")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in
                 X.edit_distance_join(df, "id", "name", max_dist=2)
                 .spark_df.collect())
    assert got == [(1, 2, 1), (3, 4, 1)]


def test_phonetic_join_blocks_sound_alikes(spark):
    from cl_data_frame_spark.operators import dedup as X
    rows = [(1, "Smith"), (2, "Smyth"), (3, "Smithe"),
            (4, "Jones"), (5, "Jonas"), (6, "Walker")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {(r.id_a, r.id_b): r.dist for r in
           X.phonetic_join(df, "id", "name", max_dist=2)
           .spark_df.collect()}
    assert got[(1, 2)] == 1          # Smith ~ Smyth share S530
    assert got[(1, 3)] == 1          # Smith ~ Smithe
    assert (4, 5) in got             # Jones ~ Jonas (J520)
    assert all(6 not in pair for pair in got)   # Walker blocks alone


def test_fellegi_sunter_pairs_weights_and_blocking(spark):
    import math
    from cl_data_frame_spark.operators.dedup import fellegi_sunter_pairs
    rows = [
        (1, "b1", "smith", "london"),
        (2, "b1", "smith", "london"),    # full agreement with 1
        (3, "b1", "jones", "paris"),     # full disagreement
        (4, "b2", "smith", "london"),    # different block: never paired
        (5, "b1", "smith", None),        # NULL field contributes 0
    ]
    df = spark.createDataFrame(rows, "id bigint, blk string, "
                                     "name string, city string")
    fields = {"name": (0.95, 0.05), "city": (0.9, 0.1)}
    got = {(r.id_a, r.id_b): r for r in
           fellegi_sunter_pairs(df, "id", "blk",
                                fields).spark_df.collect()}
    assert (1, 4) not in got and (2, 4) not in got     # blocking
    wa_n, wd_n = math.log2(0.95 / 0.05), math.log2(0.05 / 0.95)
    wa_c, wd_c = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    assert abs(got[(1, 2)].weight - round(wa_n + wa_c, 6)) < 1e-6
    assert got[(1, 2)].n_agree == 2
    assert abs(got[(1, 3)].weight - round(wd_n + wd_c, 6)) < 1e-6
    # NULL city: only the name term fires
    assert abs(got[(1, 5)].weight - round(wa_n, 6)) < 1e-6
    assert got[(1, 5)].n_agree == 1
    # threshold filters
    kept = fellegi_sunter_pairs(df, "id", "blk", fields,
                                threshold=5.0).spark_df.collect()
    assert {(r.id_a, r.id_b) for r in kept} == {(1, 2), (2, 5), (1, 5)} \
        or all(r.weight >= 5.0 for r in kept)
    import pytest
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter_pairs(df, "id", "blk", {"name": (0.05, 0.95)})


def test_fellegi_sunter_pruned_candidates_match_quadratic(spark):
    """The minimal-agreement-subset candidate pruning must reproduce
    the block-quadratic output exactly — including pairs that clear
    the threshold through a WEAK field pair while the strong field is
    NULL (the subset {weak1, weak2} branch), and pairs that agree on
    the strong field but are dragged under the threshold by non-null
    disagreements elsewhere (superset candidates the final filter must
    drop)."""
    from cl_data_frame_spark.operators.dedup import (
        fellegi_sunter_pairs, _min_agree_subsets)
    fields = {"seg": (0.9, 0.2), "pos": (0.85, 0.5),
              "nm": (0.95, 0.001)}
    # agree-weights: seg 2.17, pos 0.77, nm 9.89; threshold 2.9 ->
    # minimal subsets {nm} and {seg, pos}
    subs = _min_agree_subsets(
        {"seg": 2.1699, "pos": 0.7655, "nm": 9.8918}, 2.9 - 1e-6)
    assert sorted(subs) == [("nm",), ("pos", "seg")]
    rows = [
        (1, "b", "A", True, "wxyz"),
        (2, "b", "A", True, None),      # pairs with 3 via {seg,pos}
        (3, "b", "A", True, None),      # nm NULL on both sides
        (4, "b", "B", False, "wxyz"),   # pairs with 1 via {nm} only
        (5, "b", "A", True, "qqqq"),    # nm DISAGREES with 1: weight
                                        # 2.17+0.77-9.97 < 2.9 even
                                        # though {seg,pos} agree+nm
                                        # non-null -> candidate via
                                        # {seg,pos}, kept out by the
                                        # exact filter? no: weight =
                                        # 2.17+0.77+wd_nm < 2.9 ->
                                        # dropped; vs (2,5): nm NULL ->
                                        # 2.935 >= 2.9 kept
        (6, "c", "A", True, "wxyz"),    # other block: never paired
    ]
    df = spark.createDataFrame(
        rows, "id bigint, blk string, seg string, pos boolean, "
              "nm string")
    got = fellegi_sunter_pairs(df, "id", "blk", fields,
                               threshold=2.9).spark_df
    got_rows = {(r.id_a, r.id_b): (r.weight, r.n_agree)
                for r in got.collect()}
    # quadratic reference: same operator with the pruning disabled by
    # scoring without a threshold, filtered in Python
    ref = fellegi_sunter_pairs(df, "id", "blk", fields).spark_df
    ref_rows = {(r.id_a, r.id_b): (r.weight, r.n_agree)
                for r in ref.collect() if r.weight >= 2.9}
    assert got_rows == ref_rows
    assert (2, 3) in got_rows          # weak-pair pass, strong NULL
    assert (1, 4) in got_rows          # strong-field-only pass
    assert (1, 5) not in got_rows      # candidate, filtered exactly
    # no pair duplicated by the union of candidate branches
    assert got.count() == got.dropDuplicates(["id_a", "id_b"]).count()


def test_ngram_profile_reuse_matches_fresh_build(spark):
    """A shared ngram_order_profile must produce byte-identical pairs
    through ngram_jaccard_pairs_prefix for both the blocked and the
    global form — the substrate-sharing contract the bench composite
    relies on."""
    from cl_data_frame_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix, ngram_order_profile)
    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat today fine"),
         (2, "en", "the cat sat on the mat today okay"),
         (3, "de", "der hund lief durch den park heute"),
         (4, "de", "der hund lief durch den park gestern"),
         (5, "en", "completely different text with no overlap here")],
        "doc_id bigint, lang string, text string")
    prof = ngram_order_profile(docs, n=2, carry_cols=["lang"]).persist()
    try:
        for bc in ("lang", None):
            fresh = sorted(map(tuple, ngram_jaccard_pairs_prefix(
                docs, n=2, threshold=0.3, block_col=bc)
                .spark_df.collect()))
            shared = sorted(map(tuple, ngram_jaccard_pairs_prefix(
                docs, n=2, threshold=0.3, block_col=bc, profile=prof)
                .spark_df.collect()))
            assert fresh == shared and len(fresh) >= 2
    finally:
        prof.unpersist()
