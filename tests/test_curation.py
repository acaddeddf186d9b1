"""Curation operators: decontamination, PII redaction, BM25, quantization.

The reference has no text/embedding pipeline (cl-data-frame.lisp:1-583);
these are Tier X operators per SURVEY §2.3/2.4.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cl_data_frame_spark.operators import curation as CUR
from cl_data_frame_spark.operators import similarity as SIM
from cl_data_frame_spark.operators import textstats as TS


def test_decontaminate_overlap_fractions(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e"),       # ngrams: abc bcd cde -> 2 hits
         (2, "u v w z"),          # ngrams: uvw vwz -> 0 hits
         (3, "a b c x y z")],     # abc bcx cxy xyz -> 2 hits
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(10, "a b c d"), (11, "p q r x y z")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           CUR.decontaminate(corpus, bench, n=3, threshold=0.5)
           .spark_df.collect()}
    assert out[1]["n_ngrams"] == 3 and out[1]["n_hit"] == 2
    assert out[1]["contaminated"] is True  # 2/3 >= 0.5
    assert out[2]["n_hit"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_ngrams"] == 4 and out[3]["n_hit"] == 2
    assert abs(out[3]["overlap_frac"] - 0.5) < 1e-9


def test_decontaminate_short_doc_single_ngram(spark):
    # fewer tokens than n: word_ngrams emits one (short) gram
    corpus = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    row = CUR.decontaminate(corpus, bench, n=3).spark_df.collect()[0]
    assert row["n_ngrams"] == 1 and row["n_hit"] == 1


def test_pii_redact_counts_and_text(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.com or call 555-123-4567 from 10.0.0.1 now"),
         (2, "nothing here"),
         (3, "ssn 123-45-6789 twice 999-88-7777")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in CUR.pii_redact(df).spark_df.collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["n_ipv4"] == 1 and out[1]["n_pii"] == 3
    assert out[2]["n_pii"] == 0
    assert out[3]["n_ssn"] == 2 and out[3]["n_pii"] == 2
    red = {r["doc_id"]: r["redacted"]
           for r in spark.createDataFrame(
               [(1, "mail bob@x.com or call 555-123-4567 now"),
                (3, "ssn 123-45-6789 end")], ["doc_id", "text"])
           .select("doc_id", CUR.redact("text").alias("redacted")).collect()}
    assert red[1] == "mail [EMAIL] or call [PHONE] now"
    assert red[3] == "ssn [SSN] end"


def test_pii_phone_not_double_matched_as_ssn(spark):
    # phone pattern wins positionally; an embedded d3-d2 prefix must not
    # also produce an SSN count (fixed-width quantifiers, no overlap)
    df = spark.createDataFrame([(1, "call 555-123-4567")], ["doc_id", "text"])
    row = CUR.pii_redact(df).spark_df.collect()[0]
    assert row["n_phone"] == 1 and row["n_ssn"] == 0


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "spark table spark"), (2, "table chair"), (3, "lamp chair")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TS.bm25_scores(docs, ["spark", "table"]).spark_df.collect()}
    # corpus stats: N=3, dl = [3,2,2], avgdl = 7/3
    n, avgdl, k1, b = 3, 7.0 / 3.0, 1.2, 0.75

    def bm25(tf, df_, dl):
        idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        return idf * (tf * (k1 + 1.0)
                      / (tf + k1 * (1.0 - b + b * dl / avgdl)))

    exp1 = bm25(2, 1, 3) + bm25(1, 2, 3)   # spark tf=2 df=1; table tf=1 df=2
    assert out[1]["n_terms_hit"] == 2
    assert abs(out[1]["score"] - exp1) < 1e-5
    exp2 = bm25(1, 2, 2)
    assert out[2]["n_terms_hit"] == 1
    assert abs(out[2]["score"] - exp2) < 1e-5
    assert 3 not in out  # no query terms -> no row


def test_quantize_embeddings_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in
           SIM.quantize_embeddings(df).spark_df.collect()}
    # vec 1: maxabs=1.0, scale=1/127; q = [64, -127, 32] (0.5*127=63.5
    # rounds half-up to 64); q_sum = -31
    assert abs(out[1]["scale"] - round(1.0 / 127.0, 6)) < 1e-9
    assert out[1]["q_sum"] == 64 - 127 + 32
    assert out[1]["q_absmax"] == 127
    s = 1.0 / 127.0
    exp_err = math.sqrt((0.5 - 64 * s) ** 2 + (-1.0 + 127 * s) ** 2
                        + (0.25 - 32 * s) ** 2)
    assert abs(out[1]["l2_err"] - exp_err) < 1e-5
    # zero vector: scale falls back to 1.0, perfect reconstruction
    assert out[2]["scale"] == 1.0
    assert out[2]["q_sum"] == 0 and out[2]["l2_err"] == 0.0


def test_quantize_values_fit_int8(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mx = (SIM.quantize_embeddings(emb).spark_df
          .agg(F.max("q_absmax").alias("m")).collect()[0]["m"])
    assert mx <= 127


def test_token_entropy_uniform_vs_repetitive(spark):
    from cl_data_frame_spark.operators import textstats as TS
    df = spark.createDataFrame(
        [(1, "a b c d"),          # uniform: H = 2 bits
         (2, "a a a a"),          # degenerate: H = 0
         (3, "a a b b"),          # H = 1 bit
         (4, "   ")],             # empty
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TS.token_entropy(df).spark_df.collect()}
    assert out[1]["entropy_bits"] == 2.0
    assert out[1]["top_token_mass"] == 0.25
    assert out[2]["entropy_bits"] == 0.0
    assert out[2]["top_token_mass"] == 1.0
    assert out[3]["entropy_bits"] == 1.0
    assert out[4]["entropy_bits"] is None
    assert out[4]["n_distinct_tokens"] == 0


def test_expectation_gate_single_pass(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators import curation as CUR
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 60.0, "A"), (None, 5.0, "x"), (4, 20.0, "N")],
        "id long, v double, flag string")
    out = {r["rule"]: r for r in CUR.expect(df, {
        "null_id": CUR.rule_not_null("id"),
        "v_in_range": CUR.rule_in_range("v", 1, 50),
        "flag_shape": CUR.rule_matches("flag", "^[AN]$"),
    }).spark_df.collect()}
    assert out["null_id"]["n_violations"] == 1
    assert out["v_in_range"]["n_violations"] == 1
    assert out["flag_shape"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())
    assert not out["null_id"]["passed"]


def test_rule_unique_counts_extra_rows(spark):
    from cl_data_frame_spark.operators import curation as CUR
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "a long, b long")
    row = CUR.rule_unique(df, ["a", "b"]).spark_df.collect()[0]
    assert row["n_violations"] == 1 and row["n_rows"] == 4
    assert not row["passed"]


def test_phrase_search_counts_and_positions(spark):
    rows = [
        (1, "the quick brown fox the quick brown"),
        (2, "quick brown"),
        (3, "the quick"),          # phrase absent (needs 'quick brown')
        (4, "brown quick"),        # reversed -> no match
        (5, "quick"),              # shorter than phrase
        (6, ""),                   # empty doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in TS.phrase_search(df, "quick brown")
           .spark_df.collect()}
    assert out == {1: (2, 2), 2: (1, 1)}


def test_phrase_search_three_word_phrase(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b"), (2, "a b"), (3, "c a b c")],
        ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in TS.phrase_search(df, "a b c").spark_df.collect()}
    assert out == {1: (2, 1), 3: (1, 2)}  # doc3: 'c a b c' has 'a b c' @2


def test_postings_roundtrip_and_stats(spark):
    rows = [(1, "x y x"), (2, "y z"), (3, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flat = sorted(tuple(r) for r in TS.build_postings(df)
                  .spark_df.collect())
    assert flat == sorted([
        ("x", 1, 1), ("y", 1, 2), ("x", 1, 3),
        ("y", 2, 1), ("z", 2, 2), ("x", 3, 1)])
    lists = {r["term"]: (r["df"], r["cf"], [tuple(p) for p in r["postings"]])
             for r in TS.posting_lists(df).spark_df.collect()}
    assert lists["x"] == (2, 3, [(1, 1), (1, 3), (3, 1)])
    assert lists["z"] == (1, 1, [(2, 2)])
    stats = [(r["term"], r["df"], r["cf"], r["rank"])
             for r in TS.postings_stats(df, k=2).spark_df.collect()]
    assert sorted(stats) == [("x", 2, 3, 1), ("y", 2, 2, 2)]


def test_pq_encode_matches_bruteforce(spark):
    """Codes must equal the numpy argmin over the same deterministic
    codebooks, and recon_err the sqrt of the summed min distances."""
    import math
    dim, m, k = 8, 2, 3
    books = SIM.pq_codebooks(dim, m, k, seed=11)
    vecs = [(1, [0.1 * i for i in range(dim)]),
            (2, [(-1.0) ** i * 0.3 for i in range(dim)]),
            (3, [0.0] * dim)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in
           SIM.pq_encode(df, dim=dim, m=m, k=k, seed=11)
           .spark_df.collect()}
    for vid, v in vecs:
        mins = []
        codes = []
        for j in range(m):
            sub = v[j * 4:(j + 1) * 4]
            ds = [sum((a - b) ** 2 for a, b in zip(sub, cw))
                  for cw in books[j]]
            codes.append(ds.index(min(ds)))
            mins.append(min(ds))
        assert list(out[vid]["codes"]) == codes
        assert abs(out[vid]["recon_err"] - math.sqrt(sum(mins))) < 1e-5


def test_pq_codebooks_deterministic_and_shaped(spark):
    a = SIM.pq_codebooks(16, 4, 2, seed=3)
    b = SIM.pq_codebooks(16, 4, 2, seed=3)
    assert a == b
    assert len(a) == 4 and len(a[0]) == 2 and len(a[0][0]) == 4
    assert all(-1.0 < x < 1.0 for bk in a for cw in bk for x in cw)
    import pytest
    with pytest.raises(ValueError):
        SIM.pq_codebooks(10, 3, 2)


def test_unigram_logprob_orders_fluency(spark):
    """Documents made of corpus-common tokens must score a LOWER mean
    NLL than documents of corpus-rare tokens, and the per-doc mean must
    match a driver-side recomputation of the quantized-decimal sum."""
    import math
    from decimal import Decimal
    common = "the the the cat cat sat"
    rows = [(1, common), (2, "the cat"), (3, "zyx qwv")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TS.unigram_logprob_scores(df).spark_df.collect()}
    # corpus counts: the=4, cat=3, sat=1, zyx=1, qwv=1; total=10
    cnt = {"the": 4, "cat": 3, "sat": 1, "zyx": 1, "qwv": 1}

    def nll_q(t):
        return Decimal(str(round(-math.log(cnt[t] / 10.0), 9)))

    for doc_id, text in rows:
        toks = text.split()
        want = float(sum(nll_q(t) for t in toks)) / len(toks)
        assert abs(out[doc_id]["mean_nll"] - round(want, 6)) < 1e-9
        assert out[doc_id]["n_lm_tokens"] == len(toks)
    assert out[2]["mean_nll"] < out[3]["mean_nll"]  # common < rare


def test_bigram_logprob_penalizes_scrambled_order(spark):
    """Same token multiset, scrambled order -> higher bigram NLL; and a
    driver-side recomputation of the add-one-smoothed formula matches
    exactly."""
    import math
    from decimal import Decimal
    fluent = "the cat sat the cat sat the cat sat"
    scrambled = "cat the sat sat the cat sat cat the"
    rows = [(1, fluent), (2, fluent), (3, scrambled)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TS.bigram_logprob_scores(df).spark_df.collect()}
    assert out[1]["n_bigrams"] == 8
    assert out[1]["mean_nll2"] < out[3]["mean_nll2"]
    # recompute doc 1 by hand: V = 3 distinct tokens
    pairs = list(zip(fluent.split(), fluent.split()[1:]))
    allp = pairs * 2 + list(zip(scrambled.split(), scrambled.split()[1:]))
    bc = {}
    uc = {}
    for a, b in allp:
        bc[(a, b)] = bc.get((a, b), 0) + 1
        uc[a] = uc.get(a, 0) + 1

    def nll_q(a, b):
        return Decimal(str(round(
            -math.log(bc[(a, b)] + 1) + math.log(uc[a] + 3), 9)))

    want = float(sum(nll_q(a, b) for a, b in pairs)) / len(pairs)
    assert abs(out[1]["mean_nll2"] - round(want, 6)) < 1e-9


def test_bigram_logprob_single_token_doc_drops(spark):
    rows = [(1, "hello"), (2, "hello world")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"] for r in
           TS.bigram_logprob_scores(df).spark_df.collect()}
    assert got == {2}


def test_collocations_rank_phrases_over_chance_pairs(spark):
    """A pair that ALWAYS co-occurs ('new york') outranks a pair of
    independently common tokens, and min_count prunes hapaxes."""
    # (new, york) occurs 3x and its tokens occur NOWHERE else; (the,
    # dog) also occurs 3x but 'the' is common (9x), so its expected
    # co-occurrence is high and PMI low: ln(3*24^2/(22*3*3)) ~ 2.17
    # for new-york vs ln(3*24^2/(22*9*3)) ~ 1.07 for the-dog
    text1 = " ".join(["new york"] * 3)
    text2 = ("the dog the cat the dog the cat the dog "
             "the mouse the house the fish the bird")
    df = spark.createDataFrame([(1, text1), (2, text2)],
                               ["doc_id", "text"])
    out = TS.collocations(df, min_count=3, top_k=10).spark_df.collect()
    grams = [(r["gram_a"], r["gram_b"]) for r in out]
    assert ("york", "new") not in grams           # 2 < min_count
    assert ("the", "mouse") not in grams          # 1 < min_count
    assert ("new", "york") in grams and ("the", "dog") in grams
    top = out[0]
    assert (top["gram_a"], top["gram_b"]) == ("new", "york")
    pmis = {(r["gram_a"], r["gram_b"]): r["pmi"] for r in out}
    assert pmis[("new", "york")] > pmis[("the", "dog")]


def test_phrase_snippets_window_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b target phrase c d e"),
         (2, "target phrase at start"),
         (3, "ends with target phrase"),
         (4, "no match here"),
         (5, "target phrase then target phrase")],
        ["doc_id", "text"])
    out = {(r.doc_id, r.pos): r.snippet
           for r in TS.phrase_snippets(df, "target phrase", window=2)
           .spark_df.collect()}
    assert out[(1, 3)] == "a b target phrase c d"
    assert out[(2, 1)] == "target phrase at start"      # clamped left
    assert out[(3, 3)] == "ends with target phrase"     # clamped right
    assert 4 not in {k[0] for k in out}
    assert out[(5, 1)] == "target phrase then target"
    assert out[(5, 4)] == "phrase then target phrase"   # both hits


def test_blocklist_screen_counts_and_flags(spark):
    from cl_data_frame_spark.operators import curation as CUR
    rows = [(1, "the SPAM king sells spam and Spam"),
            (2, "perfectly clean prose here"),
            (3, "one casino visit"),
            (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           CUR.blocklist_screen(df, ["spam", "casino"], max_hits=1)
           .spark_df.collect()}
    assert out[1].n_hits == 3 and out[1].n_terms == 1   # case-folded
    assert out[1].blocked == 1
    assert out[3].n_hits == 1 and out[3].blocked == 0   # <= max_hits
    assert out[2].n_hits == 0 and out[2].blocked == 0
    assert out[4].n_hits == 0


def test_random_projection_preserves_cosine_structure(spark, sf_dir):
    """JL projection 64->16: projected cosine similarities must track
    the originals (high for near-identical vectors, low for random
    pairs), outputs unit-norm, deterministic across runs."""
    import math

    from pyspark.sql import functions as F

    from cl_data_frame_spark.operators.similarity import random_projection
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    out = random_projection(emb, dim=dim, out_dim=16).spark_df
    rows = {r.vec_id: list(r.proj) for r in out.limit(200).collect()}
    # unit norm after renorm
    for v in list(rows.values())[:10]:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-6
    # determinism
    again = {r.vec_id: list(r.proj) for r in
             random_projection(emb, dim=dim, out_dim=16)
             .spark_df.limit(200).collect()}
    assert rows == again

    # structure: a vector projected twice is identical; near-duplicates
    # (vector + tiny noise) stay close while random pairs stay apart
    base = spark.createDataFrame(
        [(1, [1.0] * 8 + [0.0] * 8),
         (2, [1.0] * 8 + [0.01] * 8),     # near-dup of 1
         (3, [0.0] * 8 + [1.0] * 8)],     # orthogonal to 1
        "vec_id bigint, embedding array<double>")
    p = {r.vec_id: list(r.proj) for r in
         random_projection(base, dim=16, out_dim=8).spark_df.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num  # unit vectors

    assert cos(p[1], p[2]) > 0.95
    assert abs(cos(p[1], p[3])) < 0.7


def test_tfidf_cosine_pairs_matches_hand_computation(spark):
    import math
    from collections import Counter

    from cl_data_frame_spark.operators import textstats as TS
    rows = [(1, "apple banana apple cherry"),
            (2, "apple banana durian"),
            (3, "elderberry fig grape"),
            (4, "apple banana apple cherry")]   # dup of 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b): r.cosine for r in
           TS.tfidf_cosine_pairs(df, threshold=0.0).spark_df.collect()}

    texts = {i: t for i, t in rows}
    n = len(rows)
    dfreq = Counter(t for _, txt in rows for t in set(txt.split()))

    def wvec(txt):
        tf = Counter(txt.split())
        return {t: round(c * (math.log((1 + n) / (1 + dfreq[t])) + 1), 6)
                for t, c in tf.items()}

    def cos(i, j):
        wa, wb = wvec(texts[i]), wvec(texts[j])
        dot = sum(wa[t] * wb[t] for t in wa if t in wb)
        na = math.sqrt(sum(v * v for v in wa.values()))
        nb = math.sqrt(sum(v * v for v in wb.values()))
        return dot / (na * nb)

    assert got[(1, 4)] == 1.0                       # exact duplicate
    assert abs(got[(1, 2)] - cos(1, 2)) < 1e-5
    assert (3, 4) not in got and (1, 3) not in got  # no shared terms
    # threshold prunes
    high = TS.tfidf_cosine_pairs(df, threshold=0.9).spark_df.collect()
    assert {(r.id_a, r.id_b) for r in high} == {(1, 4)}


def test_chunk_by_sentences_boundaries_and_budget(spark):
    from cl_data_frame_spark.operators import textstats as TS
    text = ("one two three. four five six! seven eight? "
            "nine ten eleven twelve. end.")
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = sorted((r.chunk_id, r.chunk_text, r.n_sentences, r.n_tokens)
                 for r in TS.chunk_by_sentences(df, max_tokens=6)
                 .spark_df.collect())
    # sentences: 3 + 3 + 2 + 4 + 1 tokens; running-before totals
    # 0,3,6,8,12 -> chunks floor(/6): 0,0,1,1,2
    assert out[0] == (0, "one two three. four five six!", 2, 6)
    assert out[1] == (1, "seven eight? nine ten eleven twelve.", 2, 6)
    assert out[2] == (2, "end.", 1, 1)
    # no sentence is ever split mid-way
    assert all(c.endswith((".", "!", "?")) for _, c, _, _ in out)


def test_chunk_by_sentences_oversized_sentence_own_chunk(spark):
    from cl_data_frame_spark.operators import textstats as TS
    text = "short one. " + " ".join(f"w{i}" for i in range(20)) + ". tail."
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = {r.chunk_id: r for r in
           TS.chunk_by_sentences(df, max_tokens=5)
           .spark_df.collect()}
    assert out[0].n_tokens == 2 + 20      # overflow by the crosser
    assert out[4].chunk_text == "tail."   # 22 // 5 = 4


def test_readability_scores_hand_computation(spark):
    from cl_data_frame_spark.operators import textstats as TS
    rows = [(1, "The cat sat. The dog ran away!"),
            (2, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in
           TS.readability_scores(df).spark_df.collect()}
    r = got[1]
    assert r.n_words == 7 and r.n_sents == 2
    # vowel runs: The=1 cat=1 sat.=1 The=1 dog=1 ran=1 away!=2 -> 8
    assert r.n_syllables == 8
    want = 206.835 - 1.015 * (7 / 2) - 84.6 * (8 / 7)
    assert abs(r.flesch - want) < 1e-4
    assert got[2].flesch is None and got[2].n_words == 0


def test_readability_orders_simple_before_dense(spark):
    from cl_data_frame_spark.operators import textstats as TS
    rows = [(1, "I like to run. It is fun. We go now."),
            (2, "Multisyllabic terminology necessitates extraordinary "
                "comprehension capabilities notwithstanding brevity.")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.flesch for r in
           TS.readability_scores(df).spark_df.collect()}
    assert got[1] > 80          # simple prose reads easy
    assert got[2] < got[1] - 50  # dense prose scores far lower


def test_url_normalize_canonicalization(spark):
    from cl_data_frame_spark.operators.curation import url_normalize
    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Docs/A/?utm_source=x&b=2&a=1&fbclid=z#frag"),
        (2, "http://example.com:80/"),
        (3, "https://sub.shop.co.uk/p//?gclid=1"),
        (4, "https://example.com/Docs/A?a=1&b=2"),
        (5, "ftp://Files.Example.org/pub/"),
        (6, "https://example.com:8443/x"),          # NON-default port kept
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    out = {r.id: (r.url_norm, r.domain) for r in
           url_normalize(df, "url").spark_df.collect()}
    assert out[1] == ("https://www.example.com/Docs/A?a=1&b=2",
                      "example.com")        # path case preserved
    assert out[2] == ("http://example.com", "example.com")
    assert out[3] == ("https://sub.shop.co.uk/p", "shop.co.uk")
    assert out[4] == ("https://example.com/Docs/A?a=1&b=2", "example.com")
    assert out[5] == ("ftp://files.example.org/pub", "example.org")
    assert out[6] == ("https://example.com:8443/x", "example.com")
    # 1 and 4 differ only by www + mess -> distinct url_norm (www kept
    # in the URL, stripped in the domain)
    assert out[1][0] != out[4][0]


def test_url_dedup_and_domain_cap(spark):
    from cl_data_frame_spark.operators.curation import (
        url_dedup, domain_cap)
    rows = [(i,
             f"https://A{'x' if i % 2 else ''}.example.com/p/{i % 3}/"
             f"?utm_source=s{i}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    # 2 hosts x 3 paths = 6 canonical URLs; min doc_id survives each
    kept = url_dedup(df, "url", "doc_id").spark_df.collect()
    assert len(kept) == 6
    assert {r.doc_id for r in kept} == {0, 1, 2, 3, 4, 5}
    # all 30 rows share the registered domain example.com -> cap at 4
    capped = domain_cap(df, "url", "doc_id", k=4).spark_df.collect()
    assert len(capped) == 4
    assert all(r.domain == "example.com" for r in capped)
    # deterministic: same rows every run
    again = domain_cap(df, "url", "doc_id", k=4).spark_df.collect()
    assert {r.doc_id for r in capped} == {r.doc_id for r in again}


def test_normalize_text_unicode_forms(spark):
    from cl_data_frame_spark.operators.textstats import normalize_text
    rows = [
        (1, "Café  DELUXE"),          # decomposed accent + case + ws
        (2, "Ｈｅllo"),             # fullwidth H, e
        (3, "ﬁne"),                    # fi ligature (NFKC expands)
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    out = {r.id: r.text_norm for r in
           normalize_text(df, "text").spark_df.collect()}
    assert out[1] == "café deluxe"      # NFKC composes, lower, ws
    assert out[2] == "hello"                 # fullwidth folded
    assert out[3] == "fine"                  # ligature expanded
    assert out[4] is None
    # accent stripping
    out2 = {r.id: r.text_norm for r in
            normalize_text(df, "text",
                           strip_accents=True).spark_df.collect()}
    assert out2[1] == "cafe deluxe"
    # expression-only path (form=None): no Python in the plan
    expr = normalize_text(df, "text", form=None)
    p = expr.spark_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert {r.id: r.text_norm for r in expr.spark_df.collect()}[1] \
        == "café deluxe"


def test_tfidf_cosine_pairs_max_df_is_lazy(spark, monkeypatch):
    """The max_df_frac doc-count must fold into the lazy plan (a
    broadcast scalar), not run an eager frame.count() — that was a
    separate full corpus scan per call."""
    from pyspark.sql import DataFrame
    from cl_data_frame_spark.operators import textstats as TS
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a x y"), (4, "a z w")],
        "doc_id bigint, text string")

    def boom(self):
        raise AssertionError("eager count() in tfidf_cosine_pairs")
    monkeypatch.setattr(DataFrame, "count", boom)
    fr = TS.tfidf_cosine_pairs(df, threshold=0.0, max_df_frac=0.8)
    monkeypatch.undo()
    got = {(r.id_a, r.id_b) for r in fr.spark_df.collect()}
    # 'a' (df=4 > 0.8*4) is excluded; 'b' still pairs docs 1-2
    assert (1, 2) in got
    assert all(p[0] < p[1] for p in got)


def test_minhash_decontaminate_flags_near_duplicates(spark):
    """Fuzzy decontamination: verbatim and lightly-edited copies of a
    benchmark doc are flagged with their best match; unrelated docs
    come back clean with NULL match columns."""
    from cl_data_frame_spark.operators.curation import (
        minhash_decontaminate)
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near "
             "the river bank today"),
         (2, "volcanoes and geology formations are entirely "
             "unrelated to the benchmark"),
         (3, "the quick brown fox jumps over the lazy dog near "
             "the river bank again"),
         (4, "a second benchmark question about gravity and "
             "planetary orbital mechanics")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near "
               "the river bank today"),
         (200, "a second benchmark question about gravity and "
               "planetary orbital mechanics")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in minhash_decontaminate(
        corpus, bench, jaccard_threshold=0.7).spark_df.collect()}
    assert len(out) == 4                 # one row per corpus doc
    assert out[1].contaminated and out[1].bench_id == 100
    assert out[1].jaccard == 1.0
    assert out[3].contaminated and out[3].bench_id == 100
    assert 0.7 <= out[3].jaccard < 1.0
    assert out[4].contaminated and out[4].bench_id == 200
    assert not out[2].contaminated
    assert out[2].bench_id is None and out[2].jaccard is None


def test_minhash_decontaminate_best_match_ties_min_bench_id(spark):
    from cl_data_frame_spark.operators.curation import (
        minhash_decontaminate)
    text = "identical benchmark text appearing twice in the eval set"
    corpus = spark.createDataFrame([(1, text)],
                                   "doc_id bigint, text string")
    bench = spark.createDataFrame([(9, text), (5, text)],
                                  "doc_id bigint, text string")
    r = minhash_decontaminate(corpus, bench,
                              jaccard_threshold=0.9) \
        .spark_df.collect()[0]
    assert r.contaminated and r.jaccard == 1.0
    assert r.bench_id == 5               # tie -> smallest bench id


def test_quality_classifier_hand_computation(spark):
    # two one-token docs + an empty doc: score must equal the exact
    # weight of the token's bucket / 1000, and empty docs survive with
    # NULL score/label
    import hashlib
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "ALPHA"), (3, "   "), (4, "alpha beta")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           CUR.quality_classifier(docs).spark_df.collect()}

    def w(tok):
        b = int(hashlib.md5((tok + "|qclf").encode()).hexdigest()[:8],
                16) % CUR.QCLF_DIM
        return (b * CUR.QCLF_MIX) % 2001 - 1000

    assert out[1]["n_tokens"] == 1
    assert out[1]["logit_milli"] == w("alpha")
    assert out[1]["score"] == w("alpha") / 1000.0
    # lowercased before hashing: ALPHA == alpha
    assert out[2]["logit_milli"] == out[1]["logit_milli"]
    # empty doc: zero tokens, NULL score/label
    assert out[3]["n_tokens"] == 0
    assert out[3]["score"] is None and out[3]["label"] is None
    # two tokens: exact integer sum, mean logit
    s = w("alpha") + w("beta")
    assert out[4]["logit_milli"] == s
    assert out[4]["score"] == s / 2000.0
    assert out[4]["label"] == (s > 0)


def test_quality_classifier_threshold_and_custom_weights(spark):
    # a supplied (trained) weight table overrides the stand-in, and the
    # label thresholds the MEAN milli-weight exactly
    docs = spark.createDataFrame(
        [(1, "good good"), (2, "good bad")], ["doc_id", "text"])
    import hashlib

    def bucket(tok):
        return int(hashlib.md5((tok + "|qclf").encode())
                   .hexdigest()[:8], 16) % CUR.QCLF_DIM

    weights = spark.createDataFrame(
        [(bucket("good"), 500), (bucket("bad"), -100)],
        ["bucket", "w_milli"])
    out = {r["doc_id"]: r for r in
           CUR.quality_classifier(docs, weights=weights,
                                  threshold_milli=300)
           .spark_df.collect()}
    assert out[1]["score"] == 0.5 and out[1]["label"] is True
    # mean = (500-100)/2 = 200 milli < 300 threshold
    assert out[2]["logit_milli"] == 400 and out[2]["label"] is False


def test_quality_classifier_sparse_weights_zero_fill(spark):
    # a token whose bucket is missing from the weight table contributes
    # weight 0 but still counts in n_tokens (the mean's divisor)
    import hashlib
    docs = spark.createDataFrame([(1, "good unseen")],
                                 ["doc_id", "text"])
    b = int(hashlib.md5(b"good|qclf").hexdigest()[:8], 16) % CUR.QCLF_DIM
    weights = spark.createDataFrame([(b, 800)], ["bucket", "w_milli"])
    row = CUR.quality_classifier(docs, weights=weights) \
        .spark_df.collect()[0]
    assert row["n_tokens"] == 2
    assert row["logit_milli"] == 800
    assert row["score"] == 800 / 2000.0


def test_card_pii_luhn_gates_redaction(spark):
    df = spark.createDataFrame([
        (1, "pay 4111111111111111 now"),          # valid Visa test PAN
        (2, "order 1234567812345678 shipped"),    # 16 digits, bad Luhn
        (3, "grouped 4111 1111 1111 1111 card"),  # valid, grouped
        (4, "call 555-123-4567 no card"),         # too short
        (5, "amex 378282246310005 ok"),           # 15-digit valid
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           CUR.card_pii(df).spark_df.collect()}
    assert (out[1]["n_candidates"], out[1]["n_valid"]) == (1, 1)
    assert out[1]["redacted"] == "pay [CARD] now"
    # a Luhn-failing digit run is COUNTED as a candidate but neither
    # validated nor redacted (the false-positive gate)
    assert (out[2]["n_candidates"], out[2]["n_valid"]) == (1, 0)
    assert out[2]["redacted"] == "order 1234567812345678 shipped"
    assert out[3]["redacted"] == "grouped [CARD] card"
    assert (out[4]["n_candidates"], out[4]["n_valid"]) == (0, 0)
    assert (out[5]["n_candidates"], out[5]["n_valid"]) == (1, 1)


def test_luhn_expr_known_vectors(spark):
    rows = [("4111111111111111", True), ("4111111111111112", False),
            ("378282246310005", True), ("6011111111111117", True),
            ("123", False)]
    df = spark.createDataFrame(rows, ["digits", "expect"])
    got = df.select("expect",
                    CUR.luhn_valid_expr(F.col("digits"))
                    .alias("valid")).collect()
    assert all(r["valid"] == r["expect"] for r in got)


def test_semantic_decontaminate_flags_scaled_paraphrases(spark):
    # cosine is scale-invariant: a benchmark vector scaled 3x must
    # flag at cosine 1.0; an orthogonal vector must pass clean
    corpus = spark.createDataFrame(
        [(1, [3.0, 0.0, 0.0]),        # 3x benchmark vec 100
         (2, [0.0, 1.0, 0.0]),        # orthogonal: clean
         (3, [1.0, 0.05, 0.0])],      # nearly parallel: flagged
        ["vec_id", "embedding"])
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"])
    out = {r.vec_id: r for r in
           CUR.semantic_decontaminate(corpus, bench, threshold=0.95)
           .spark_df.collect()}
    assert out[1].contaminated and out[1].bench_id == 100
    assert out[1].cosine == 1.0
    assert not out[2].contaminated
    assert out[2].bench_id is None and out[2].cosine is None
    assert out[3].contaminated and out[3].bench_id == 100
    assert 0.95 <= out[3].cosine < 1.0


def test_semantic_decontaminate_on_real_embeddings(spark, sf_dir):
    # benchmark = a slice of the corpus itself: every slice member is
    # a guaranteed cosine-1.0 hit against its own vector
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") % 17 == 0)
    out = CUR.semantic_decontaminate(emb, bench,
                                     threshold=0.999).spark_df
    hits = {r.vec_id: r for r in
            out.filter(F.col("contaminated")).collect()}
    for vid in [r.vec_id for r in bench.select("vec_id").collect()]:
        assert vid in hits and hits[vid].cosine == 1.0
    # the corpus side is one narrow pass: the only Exchanges are the
    # benchmark fold (SinglePartition over the tiny side) and its
    # broadcast — no corpus-keyed shuffle anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    leftover = (plan.replace("BroadcastExchange", "")
                .replace("Exchange SinglePartition", ""))
    assert "Exchange" not in leftover
