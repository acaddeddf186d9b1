"""Corpus-curation operators beyond dedup: benchmark decontamination and
PII redaction.

Tier X (SURVEY.md §2.4): the reference (`cl-data-frame.lisp:1-583`) has no
text pipeline at all; these are the standard pre-training curation steps a
100 TB corpus needs before the dedup/quality gates in ``dedup.py`` /
``textstats.py`` / ``pipeline.py``.

Scale notes
-----------
- ``decontaminate``: the benchmark n-gram dictionary is tiny relative to
  the corpus (benchmarks are MBs, corpora are TBs), so it is broadcast and
  the corpus side never shuffles by n-gram — the only shuffle is the
  per-document hit aggregation on ``id_col``, which AQE coalesces.
- ``pii_redact``: a pure per-row expression chain (regexp_extract_all +
  chained regexp_replace), fully whole-stage-codegen'd — no shuffle, no
  UDF, scales linearly with scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.dedup import word_ngrams


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def benchmark_ngrams(benchmark, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams over the whole benchmark set — the
    contamination dictionary. One explode + one distinct; the result is
    broadcast-sized by construction (benchmarks are small)."""
    sdf = _plain(benchmark)
    return (sdf.select(F.explode(word_ngrams(text_col, n)).alias("ngram"))
            .distinct())


def decontaminate(corpus, benchmark, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  threshold: float = 0.5) -> SparkFrame:
    """Benchmark decontamination: per corpus document, the fraction of its
    distinct word ``n``-grams that also appear in the benchmark set.
    Documents at or above ``threshold`` are flagged contaminated (the
    standard n-gram-overlap decontamination test used for pre-training
    corpora, e.g. Brown et al. 2020 §C / Rae et al. 2021 appendix —
    public methodology).

    Output: (id_col, n_ngrams, n_hit, overlap_frac, contaminated), one row
    per corpus document.

    Plan shape: corpus explodes its distinct n-grams (rows ≈ docs ×
    distinct-ngrams/doc), LEFT joins the **broadcast** benchmark
    dictionary (no shuffle of the corpus by n-gram), then one hash
    aggregation back to one row per document. At 100 TB the only shuffle
    is that final groupBy(id_col), with map-side partial aggregation.
    """
    cdf = _plain(corpus)
    bench = benchmark_ngrams(benchmark, text_col, n)
    exploded = cdf.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("ngram"))
    marked = (exploded
              .join(F.broadcast(bench.withColumn("__hit__", F.lit(1))),
                    on="ngram", how="left"))
    out = (marked.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_ngrams"),
                F.coalesce(F.sum("__hit__"), F.lit(0)).cast("long")
                 .alias("n_hit"))
           .withColumn("overlap_frac",
                       F.round(F.col("n_hit") / F.col("n_ngrams"), 6))
           .withColumn("contaminated",
                       (F.col("n_hit") / F.col("n_ngrams"))
                       >= F.lit(threshold)))
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

#: Default PII patterns. Deliberately conservative regex subset (character
#: classes + bounded quantifiers only) so the same pattern string means the
#: same thing to Java regex (Spark) and RE2 (DuckDB/Go) — no lookarounds,
#: no \d shorthands, no backrefs. Order matters: longer/more specific
#: patterns first so e.g. an SSN-shaped run inside a phone number is not
#: double-redacted.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,6}",
    "phone": "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}


def pii_counts(col, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-pattern match counts for a text column — pure expressions."""
    text = F.col(col) if isinstance(col, str) else col
    pats = patterns or PII_PATTERNS
    return {name: F.size(F.regexp_extract_all(text, F.lit(rx), F.lit(0)))
            for name, rx in pats.items()}


def redact(col, patterns: dict[str, str] | None = None) -> Column:
    """Chained ``regexp_replace`` redaction: each match becomes
    ``[NAME]``. Pattern order is dict order (see PII_PATTERNS)."""
    text = F.col(col) if isinstance(col, str) else col
    pats = patterns or PII_PATTERNS
    for name, rx in pats.items():
        text = F.regexp_replace(text, rx, f"[{name.upper()}]")
    return text


def pii_redact(frame, id_col: str = "doc_id", text_col: str = "text",
               patterns: dict[str, str] | None = None) -> SparkFrame:
    """PII scrub: per document, per-type match counts plus the redacted
    text and its md5 digest (the digest gives an exact equality signal
    without hauling full text through downstream joins).

    Counts are computed on the ORIGINAL text, so overlapping patterns
    (ssn inside phone) each report their own raw matches, while the
    redaction applies patterns in dict order.

    Narrow, shuffle-free, codegen'd — scales with scan bandwidth.
    """
    sdf = _plain(frame)
    counts = pii_counts(text_col, patterns)
    red = redact(text_col, patterns)
    cols = [F.col(id_col)]
    cols += [c.cast("long").alias(f"n_{name}") for name, c in counts.items()]
    total = None
    for name in (patterns or PII_PATTERNS):
        piece = F.col(f"n_{name}")
        total = piece if total is None else total + piece
    out = (sdf.select(*cols, red.alias("redacted"))
           .withColumn("n_pii", total.cast("long"))
           .withColumn("redacted_md5", F.md5("redacted")))
    return SparkFrame(out)


def blocklist_screen(frame, terms: list[str], id_col: str = "doc_id",
                     text_col: str = "text",
                     max_hits: int = 0) -> SparkFrame:
    """Term-blocklist screen: per document, the count of whitespace
    tokens that appear (case-insensitively) in *terms*, plus the
    distinct matched-term count and a keep/drop flag
    (``blocked = n_hits > max_hits``) — the wordlist filter every
    web-scale curation pipeline runs (adult/spam/boilerplate lists,
    e.g. the C4 badwords pass).

    Plan: the blocklist compiles into a LITERAL lowercase array (lists
    are thousands of terms — expression-side constant, no join at all,
    unlike ``decontaminate``'s broadcast n-gram table which scales with
    the benchmark); per row it is two higher-order array expressions
    over the token array — whole-stage codegen, no shuffle, no UDF.
    """
    from .textstats import tokens
    sdf = _plain(frame)
    lit_terms = F.array(*[F.lit(t.lower()) for t in terms])
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    hits = F.filter(toks, lambda t: F.array_contains(lit_terms, t))
    out = sdf.select(
        id_col,
        F.size(hits).alias("n_hits"),
        F.size(F.array_distinct(hits)).alias("n_terms"),
        (F.size(hits) > max_hits).cast("int").alias("blocked"))
    return SparkFrame(out)


def expect(frame, rules: dict) -> SparkFrame:
    """Data-quality expectation gate: evaluate named rules over the
    whole input in ONE aggregation pass and return one row per rule with
    its violation count — the pipeline pattern of Deequ/Great-
    Expectations-style checks, expressed as plain conditional
    aggregates.

    *rules* maps rule name -> a boolean Column that is TRUE when the row
    VIOLATES the rule (e.g. ``F.col("id").isNull()``); helpers below
    build the common shapes. Every rule is a ``sum(case)`` in the same
    aggregate, so the whole suite costs one scan + one single-row
    reduction no matter how many rules run — at 100 TB you pay the scan
    once, not per rule.
    """
    sdf = _plain(frame)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for name, viol in rules.items():
        aggs.append(F.sum(viol.cast("bigint")).alias(name))
    row = sdf.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(name).alias("n_violations"),
                 F.col("__n__").alias("n_rows"))
        for name in rules])
    out = (row.select(F.explode(pairs).alias("r"))
           .select("r.rule", "r.n_violations", "r.n_rows",
                   (F.col("r.n_violations") == 0).alias("passed")))
    return SparkFrame(out)


def rule_not_null(col) -> Column:
    return (F.col(col) if isinstance(col, str) else col).isNull()


def rule_in_range(col, lo, hi) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ~c.between(lo, hi)


def rule_matches(col, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ~c.rlike(pattern)


def rule_unique(frame, cols) -> SparkFrame:
    """Key-uniqueness check (needs its own aggregation — uniqueness is
    not a per-row predicate): returns (rule, n_violations, n_rows,
    passed) where violations = rows beyond the first per key."""
    sdf = _plain(frame)
    cols = [cols] if isinstance(cols, str) else list(cols)
    agg = (sdf.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c__"))
           .agg(F.sum(F.col("__c__") - 1).alias("n_violations"),
                F.sum("__c__").alias("n_rows")))
    out = agg.select(
        F.lit("unique_" + "_".join(cols)).alias("rule"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"))
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# URL / domain curation (VERDICT r6 #8) — web-corpus pipelines dedup by
# normalized URL and cap per-domain mass BEFORE content dedup: both are
# narrow expression chains + one bounded per-domain rank, so they run at
# scan bandwidth ahead of the expensive MinHash/embedding stages.
# ---------------------------------------------------------------------------

#: tracking parameters stripped by ``url_normalize`` — the public
#: utm/click-id convention (Google Analytics utm_*, Facebook fbclid,
#: Google gclid, Microsoft msclkid).
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)="

#: second-level labels that commonly sit under a 2-letter ccTLD
#: (co.uk, com.au, ...): the heuristic slice of the public-suffix idea
#: that needs no bundled suffix list.
_SECOND_LEVEL = ["co", "com", "net", "org", "gov", "ac", "edu"]


def url_normalize_expr(col) -> Column:
    """Canonical URL as a pure Column expression (no UDF, no shuffle):

    1. trim; strip the ``#fragment``;
    2. lowercase ONLY the scheme+authority (paths are case-sensitive);
    3. drop default ports (``http://…:80``, ``https://…:443``);
    4. drop tracking query params (``TRACKING_PARAM_RE``), sort the
       survivors (param order is not semantic), rebuild the query;
    5. drop trailing slashes from the path (``…/a/`` == ``…/a``; a
       bare authority keeps no slash at all).

    Regex subset is RE2-safe (no lookaround) so the DuckDB oracle can
    mirror it verbatim.
    """
    u = F.regexp_replace(F.trim(col), "#.*", "")
    auth = F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(auth) + F.lit(1), F.lit(1 << 30))
    auth = F.lower(auth)
    auth = F.regexp_replace(auth, "^(http://[^/?#:]*):80$", "$1")
    auth = F.regexp_replace(auth, "^(https://[^/?#:]*):443$", "$1")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    query = F.regexp_extract(rest, "^[^?]*\\?(.*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM_RE)))
    qnorm = F.array_join(params, "&")
    path = F.regexp_replace(path, "/+$", "")
    return F.concat(
        auth, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")))


def url_host_expr(col) -> Column:
    """Hostname of a URL (port stripped, lowercased, leading ``www.``
    dropped) — pure expression."""
    host = F.lower(F.regexp_extract(col, "://([^:/?#]*)", 1))
    return F.regexp_replace(host, "^www\\.", "")


def url_domain_expr(col) -> Column:
    """Registered-domain heuristic (eTLD+1-ish) as a pure expression:
    last two host labels, or last three when the second-to-last label
    is a common second-level label (``co``/``com``/…) under a 2-letter
    ccTLD — the no-bundled-list slice of the public-suffix rules
    (a full publicsuffix.org table can be broadcast-joined on the host
    suffix when exactness matters)."""
    host = url_host_expr(col)
    labels = F.split(host, "\\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = ((n >= 3) & (F.length(tld) == 2)
             & second.isin(_SECOND_LEVEL))
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    return (F.when(n <= 1, host)
            .when(take3, last3)
            .when(n >= 2, last2)
            .otherwise(host))


def url_normalize(frame, url_col: str, out_col: str = "url_norm",
                  domain_col: str | None = "domain") -> SparkFrame:
    """Attach canonical-URL (+ optionally registered-domain) columns.
    Narrow projection — zero shuffle, whole-stage codegen."""
    sdf = _plain(frame)
    out = sdf.withColumn(out_col, url_normalize_expr(F.col(url_col)))
    if domain_col:
        out = out.withColumn(domain_col, url_domain_expr(F.col(out_col)))
    return SparkFrame(out)


def url_dedup(frame, url_col: str, id_col: str,
              out_col: str = "url_norm") -> SparkFrame:
    """URL-level exact dedup: keep the lowest-``id_col`` row per
    canonical URL — the first, cheapest web-corpus dedup stage (runs
    before any content hashing). One hash aggregation on the
    normalized URL; survivors join back by (url, id) — both sides
    slim, AQE-broadcast when small."""
    sdf = _plain(url_normalize(frame, url_col, out_col=out_col,
                               domain_col=None))
    keep = (sdf.groupBy(out_col)
            .agg(F.min(F.col(id_col)).alias(id_col)))
    out = sdf.join(keep, on=[out_col, id_col], how="inner")
    return SparkFrame(out)


def domain_cap(frame, url_col: str, id_col: str, k: int,
               salt: str = "", domain_col: str = "domain") -> SparkFrame:
    """Cap per-domain document mass at *k* (deterministic): normalize,
    extract the registered domain, keep a fixed uniform-ordered sample
    of ≤ k docs per domain via ``per_group_sample`` — the standard
    anti-domination step (one site must not dominate the corpus mix).
    One hash shuffle on the domain; output bounded at k per domain."""
    from cl_data_frame_spark.operators.sampling import per_group_sample
    fr = url_normalize(frame, url_col, out_col="__unorm__",
                       domain_col=domain_col)
    out = per_group_sample(fr, id_col, domain_col, k, salt=salt)
    return SparkFrame(_plain(out).drop("__unorm__"))


def minhash_decontaminate(corpus, benchmark, id_col: str = "doc_id",
                          text_col: str = "text",
                          bench_id_col: str = "doc_id",
                          bench_text_col: str = "text",
                          num_hashes: int = 96, bands: int = 24,
                          shingle_k: int = 5,
                          jaccard_threshold: float = 0.8) -> SparkFrame:
    """FUZZY benchmark decontamination — the near-duplicate sibling of
    ``decontaminate`` (which needs verbatim n-gram overlap): flag
    corpus documents whose char-shingle Jaccard against ANY benchmark
    document reaches the threshold, catching paraphrase-lite
    contamination (reformatted whitespace, shuffled fields, trailing
    edits) that exact n-gram overlap misses — the published fuzzy
    eval-decontamination recipe of the large-model training reports.

    Plan — the cross-table form of ``dedup.minhash_near_duplicates``,
    exploiting the size asymmetry: a benchmark is KBs-MBs against a
    100 TB corpus, so its banded signature table BROADCASTS and the
    candidate join is map-side. Corpus docs hash once (explode +
    grouped-min signature; the shuffle carries signatures, never
    shingles); candidates = band-bucket equi-join; exact-Jaccard
    verify on hashed shingle sets (benchmark side broadcast again);
    best match per corpus doc chosen deterministically (highest
    rounded Jaccard, ties to the smallest benchmark id). At the
    default 96/24 (r=4) parameters a pair at j >= 0.8 escapes banding
    with P ~ 3e-6 — the verified output equals the exact-Jaccard
    screen, which is what the oracle checks.

    Output: one row per corpus doc —
    (id_col, contaminated bool, bench_id, jaccard), NULL
    bench_id/jaccard for clean docs.
    """
    from cl_data_frame_spark.operators.dedup import (
        char_shingles, ensure_min_partitions)
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    def parts(sdf, idc, txc, alias):
        shingled = sdf.select(
            F.col(idc).alias(alias),
            char_shingles(txc, shingle_k).alias("__sh__"))
        exploded = shingled.select(
            alias, F.explode("__sh__").alias("__s__")
        ).select(alias, F.xxhash64("__s__").alias("__h__"))
        # the 96 min-aggregates and 24 band hashes are assembled as SQL
        # expression strings — identical expression trees, but ONE py4j
        # round trip each instead of one per operator (~2s of driver
        # latency per entry build at the default parameters)
        min_exprs = ", ".join(
            f"min(xxhash64(__h__, {i})) AS __m{i}__"
            for i in range(num_hashes))
        sigs = exploded.groupBy(alias).agg(
            F.expr(f"struct({min_exprs})").alias("__sg__"))
        band_exprs = ", ".join(
            "xxhash64(" + ", ".join(
                f"__sg__.__m{i}__"
                for i in range(b * rows_per_band,
                               (b + 1) * rows_per_band)) + ")"
            for b in range(bands))
        banded = sigs.select(
            alias, F.posexplode(F.expr(f"array({band_exprs})"))
            .alias("__band__", "__bh__"))
        hashed = shingled.select(
            alias, F.array_distinct(
                F.transform("__sh__", lambda s: F.xxhash64(s)))
            .alias(f"sh_{alias}"))
        return banded, hashed

    corp = ensure_min_partitions(_plain(corpus).select(id_col,
                                                       text_col))
    bench = _plain(benchmark).select(bench_id_col, bench_text_col)
    c_band, c_sh = parts(corp, id_col, text_col, "cid")
    b_band, b_sh = parts(bench, bench_id_col, bench_text_col, "bid")
    cand = (c_band.join(F.broadcast(b_band), on=["__band__", "__bh__"])
            .select("cid", "bid")
            .dropDuplicates(["cid", "bid"]))
    verified = (cand.join(c_sh, on="cid")
                .join(F.broadcast(b_sh), on="bid"))
    inter = F.size(F.array_intersect("sh_cid", "sh_bid"))
    uni = F.size("sh_cid") + F.size("sh_bid") - inter
    hits = (verified.withColumn("__j__", F.round(inter / uni, 6))
            .filter(F.col("__j__") >= jaccard_threshold)
            .groupBy("cid")
            .agg(F.max(F.struct(
                F.col("__j__").alias("j"),
                (-F.col("bid")).alias("nb"))).alias("__best__"))
            .select(F.col("cid").alias(id_col),
                    F.col("__best__.j").alias("jaccard"),
                    (-F.col("__best__.nb")).alias("bench_id")))
    out = (corp.select(F.col(id_col))
           .join(hits, on=id_col, how="left")
           .select(id_col,
                   F.col("bench_id").isNotNull().alias("contaminated"),
                   "bench_id", "jaccard"))
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# hashed linear quality classifier (fastText-style model APPLY)
# ---------------------------------------------------------------------------

QCLF_DIM = 1024
#: Knuth's multiplicative-hash constant — used only to synthesize the
#: deterministic stand-in weight table in :func:`classifier_weights`.
QCLF_MIX = 2654435761


def classifier_weights(spark, dim: int = QCLF_DIM,
                       seed_mix: int = QCLF_MIX) -> DataFrame:
    """Deterministic stand-in weight table ``(bucket, w_milli)`` for the
    hashed classifier — integer milli-weights in [-1000, 1000].

    A real deployment loads trained weights (a fastText / logistic
    model exported as one row per hash bucket); this synthesizes an
    arbitrary-but-fixed table of the same shape so the APPLY plumbing
    is exercised end-to-end and the oracle can regenerate it exactly.
    """
    b = F.col("id")
    return spark.range(dim).select(
        b.alias("bucket"),
        ((b * F.lit(seed_mix)) % 2001 - 1000).cast("long")
        .alias("w_milli"))


def quality_classifier(frame, id_col: str = "doc_id",
                       text_col: str = "text",
                       weights: DataFrame | None = None,
                       dim: int = QCLF_DIM, salt: str = "qclf",
                       threshold_milli: int = 0) -> SparkFrame:
    """Hashed linear quality-classifier APPLY — the fastText-style
    (Joulin et al., EACL 2017 "Bag of Tricks") model-based quality
    filter of the CCNet / GPT-3 WebText curation recipes, scored with
    EXACT integer arithmetic so any engine reproduces it bit-for-bit.

    Per document: whitespace-tokenize, lowercase, hash each token into
    one of ``dim`` buckets (md5-based — portable across engines), look
    the bucket up in the broadcast ``weights`` table (integer
    milli-weights), and score the document with the MEAN token weight:
    ``score = sum(w_milli) / (1000 * n_tokens)`` (one exact-integer
    division — bit-identical everywhere). ``label`` is the integer
    compare ``sum_milli > threshold_milli * n_tokens``, i.e.
    ``mean > threshold`` with no float in the decision path. The
    monotone sigmoid is deliberately NOT applied: thresholding the
    logit is the same classifier, and ``exp()`` is not cross-engine
    exact.

    100 TB posture: the weight table is k-sized (``dim`` rows) and
    BROADCAST; the corpus side is one narrow explode + map-side join +
    per-doc aggregation on ``id_col`` — no token-keyed shuffle, no UDF,
    whole-stage codegen throughout. Documents with zero tokens survive
    via the left join with NULL score/label.

    The reference (`cl-data-frame.lisp:1-583`) has no text pipeline;
    this is Tier X (SURVEY.md §2.3 text analysis).
    """
    sdf = _plain(frame)
    spark = sdf.sparkSession
    if weights is None:
        weights = classifier_weights(spark, dim=dim)
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    tok = (sdf.select(id_col, F.explode(toks).alias("__t__"))
           .select(id_col, F.lower("__t__").alias("__t__")))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("__t__"), F.lit("|" + salt))), 1, 8),
        16, 10).cast("long") % dim)
    # LEFT join: a bucket absent from a sparse trained table means
    # weight 0, and the token still counts toward the mean's divisor
    scored = (tok.select(id_col, bucket.alias("bucket"))
              .join(F.broadcast(weights), on="bucket", how="left")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum(F.coalesce("w_milli", F.lit(0)))
                   .alias("logit_milli")))
    out = (sdf.select(id_col)
           .join(scored, on=id_col, how="left")
           .select(id_col,
                   F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                   "logit_milli",
                   (F.col("logit_milli")
                    / (1000.0 * F.col("n_tokens"))).alias("score"),
                   F.when(F.col("n_tokens") > 0,
                          (F.col("logit_milli")
                           > F.lit(threshold_milli) * F.col("n_tokens"))
                          .cast("boolean"))
                   .alias("label")))
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# Luhn-validated payment-card detection (checksum-gated PII)
# ---------------------------------------------------------------------------

#: candidate card numbers: 13-19 digits, optionally space/dash grouped
CARD_CANDIDATE_RE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def luhn_valid_expr(digits: Column) -> Column:
    """Luhn (ISO/IEC 7812) checksum over a digits-only string column —
    pure expressions: reverse, double every second digit, subtract 9
    above 9, sum mod 10 == 0. The validation step real PII scanners
    gate card matches on (a raw 16-digit regex fires on order ids,
    timestamps, and phone numbers all day)."""
    rev = F.reverse(digits)
    idx = F.sequence(F.lit(1), F.length(rev))
    terms = F.transform(idx, lambda i: F.when(
        i % 2 == 0,
        F.when(F.substring(rev, i, 1).cast("int") * 2 > 9,
               F.substring(rev, i, 1).cast("int") * 2 - 9)
        .otherwise(F.substring(rev, i, 1).cast("int") * 2))
        .otherwise(F.substring(rev, i, 1).cast("int")))
    total = F.aggregate(terms, F.lit(0), lambda a, x: a + x)
    return (F.length(digits).between(13, 19)) & (total % 10 == 0)


def card_pii(frame, id_col: str = "doc_id", text_col: str = "text",
             redact_token: str = "[CARD]") -> SparkFrame:
    """Checksum-gated payment-card PII: extract candidate digit runs
    (13-19 digits, space/dash grouping allowed), keep only those whose
    digits pass the Luhn check, and redact exactly the validated ones.
    Output per document: candidate count, valid count, redacted text +
    md5 (exact cross-engine equality signal).

    One narrow codegen'd pass — candidates live in an in-row array,
    the redaction is an ``aggregate`` fold replacing each validated
    literal; nothing shuffles.
    """
    sdf = _plain(frame)
    text = F.col(text_col)
    cands = F.regexp_extract_all(text, F.lit(CARD_CANDIDATE_RE),
                                 F.lit(0))
    digits_of = (lambda s: F.regexp_replace(s, "[ -]", ""))
    valid = F.filter(cands, lambda s: luhn_valid_expr(digits_of(s)))
    red = F.aggregate(valid, text,
                      lambda acc, s: F.replace(acc, s,
                                               F.lit(redact_token)))
    out = sdf.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(valid).cast("long").alias("n_valid"),
        red.alias("redacted")).withColumn(
            "redacted_md5", F.md5("redacted"))
    return SparkFrame(out)


def semantic_decontaminate(corpus_emb, benchmark_emb,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bench_id_col: str = "vec_id",
                           bench_vec_col: str = "embedding",
                           threshold: float = 0.95) -> SparkFrame:
    """EMBEDDING-space benchmark decontamination — the semantic member
    of the decontamination triad (exact n-gram ``decontaminate``,
    fuzzy ``minhash_decontaminate``, and this): flag corpus items
    whose cosine against ANY benchmark embedding reaches the
    threshold, catching paraphrases that share no surface form at all
    (the published embedding-decontamination recipe of recent model
    reports; same geometry as SemDeDup, arXiv:2303.09540, applied
    cross-table).

    Plan — the benchmark is broadcast-sized by construction
    (benchmarks are KBs-MBs against a TB corpus), so its vectors fold
    into ONE collected-array row broadcast onto the corpus scan; each
    corpus row finds its best match with an in-row ``aggregate`` fold
    over that array. ZERO shuffle, zero candidate join — the corpus
    side is a pure narrow pass, which beats any LSH routing when the
    right side fits in a broadcast.

    Output: one row per corpus item —
    (id_col, contaminated, bench_id, cosine)."""
    from cl_data_frame_spark.operators.similarity import (dot_product,
                                                          vector_norm)
    cdf = _plain(corpus_emb)
    bdf = _plain(benchmark_emb)
    bv = F.col(bench_vec_col).cast("array<double>")
    bench_row = bdf.agg(F.collect_list(F.struct(
        F.col(bench_id_col).cast("long").alias("bid"),
        bv.alias("bvec"),
        vector_norm(bv).alias("bnorm"))).alias("__bench__"))
    v = F.col(vec_col).cast("array<double>")
    base = (cdf.select(id_col, v.alias("__v__"))
            .withColumn("__n__", vector_norm(F.col("__v__")))
            .crossJoin(F.broadcast(bench_row)))
    acc0 = F.struct(F.lit(-2.0).cast("double").alias("c"),
                    F.lit(None).cast("long").alias("bid"))

    def step(acc, b):
        cos = (dot_product(F.col("__v__"), b["bvec"])
               / (F.col("__n__") * b["bnorm"]))
        better = cos > acc["c"]
        return F.struct(
            F.when(better, cos).otherwise(acc["c"]).alias("c"),
            F.when(better, b["bid"]).otherwise(acc["bid"])
            .alias("bid"))

    best = F.aggregate("__bench__", acc0, step)
    out = (base.withColumn("__best__", best)
           .select(id_col,
                   (F.round(F.col("__best__.c"), 6)
                    >= threshold).alias("contaminated"),
                   F.when(F.round(F.col("__best__.c"), 6)
                          >= threshold,
                          F.col("__best__.bid")).alias("bench_id"),
                   F.when(F.round(F.col("__best__.c"), 6)
                          >= threshold,
                          F.round(F.col("__best__.c"), 6))
                   .alias("cosine")))
    return SparkFrame(out)
