"""Property-based invariants (hypothesis) for the round-4 operators:
span-removal bookkeeping, incremental-aggregate split independence, and
quantile-bin monotonicity. Example counts are small — every example runs
Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st


def _round_half_up(x: float, digits: int = 6) -> float:
    """Mirror Spark's F.round, which ties away from zero (HALF_UP),
    unlike Python's builtin round() (HALF_EVEN).  Exact dyadic values
    like 1.9546875 land on a .…5 tie at the 7th decimal where the two
    rules diverge; the engine is HALF_UP, so the mirror must be too."""
    import decimal
    q = decimal.Decimal(1).scaleb(-digits)
    return float(decimal.Decimal(repr(x)).quantize(
        q, rounding=decimal.ROUND_HALF_UP))

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=5)


@given(docs=docs_strategy)
@settings(**SETTINGS)
def test_span_removal_token_bookkeeping(spark, docs):
    from cl_data_frame_spark.operators.dedup import duplicated_span_removal
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_span_removal(df, n=3).spark_df.collect()
    assert len(out) == len(docs)
    for r in out:
        toks = docs[r["doc_id"]]
        assert r["n_tokens"] == len(toks)
        clean = r["clean_text"].split() if r["clean_text"] else []
        # removed-token count is consistent with the reassembled text
        assert r["dup_tokens"] == len(toks) - len(clean)
        # a doc with no flagged spans is reproduced verbatim
        if r["dup_spans"] == 0:
            assert clean == toks


@given(vals=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-100, max_value=100)),
    min_size=1, max_size=30),
    cut=st.integers(min_value=0, max_value=29))
@settings(**SETTINGS)
def test_incremental_agg_split_independence(spark, vals, cut):
    from cl_data_frame_spark.operators.relational import (
        incremental_agg_build, incremental_agg_merge)
    rows = [(k, float(v)) for k, v in vals]
    df = spark.createDataFrame(rows, ["k", "v"])
    cut = min(cut, len(rows))
    a = spark.createDataFrame(rows[:cut] or [(99, 0.0)], ["k", "v"]) \
        if cut else None
    # split at an arbitrary point; empty side handled by merging the
    # full build with an empty-partial build
    left = rows[:cut]
    right = rows[cut:]
    full = incremental_agg_build(df, "k", ["v"]).spark_df
    if not left or not right:
        return
    merged = incremental_agg_merge(
        incremental_agg_build(
            spark.createDataFrame(left, ["k", "v"]), "k", ["v"]),
        incremental_agg_build(
            spark.createDataFrame(right, ["k", "v"]), "k", ["v"]),
        "k", ["v"]).spark_df
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))


@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=4, max_size=40),
       n_bins=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_quantile_bins_monotone_in_value(spark, vals, n_bins):
    from cl_data_frame_spark.operators.stats import quantile_bins
    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    out = quantile_bins(df, "v", n_bins=n_bins).spark_df.collect()
    by_val = sorted((r["v"], r["bin"]) for r in out)
    bins = [b for _, b in by_val]
    assert bins == sorted(bins)
    assert all(1 <= b <= n_bins for b in bins)


@given(ivs=st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),     # key
              st.integers(min_value=0, max_value=50),    # start
              st.integers(min_value=0, max_value=20)),   # length
    min_size=1, max_size=20))
@settings(**SETTINGS)
def test_merge_intervals_invariants(spark, ivs):
    """Islands per key are disjoint and non-touching, ordered, cover
    every input interval, and their interval counts sum to the
    inputs."""
    from cl_data_frame_spark.operators.relational import merge_intervals
    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "k int, s int, e int")
    out = merge_intervals(df, "k", "s", "e").spark_df.collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    n_total = 0
    for k, islands in by_key.items():
        islands.sort(key=lambda r: r.island_start)
        for a, b in zip(islands, islands[1:]):
            assert a.island_end < b.island_start   # gap between islands
        for r in islands:
            assert r.island_start <= r.island_end
            n_total += r.n_intervals
        # every input interval of this key fits inside some island
        for (kk, s, e) in rows:
            if kk != k:
                continue
            assert any(r.island_start <= s and e <= r.island_end
                       for r in islands)
    assert n_total == len(rows)


@given(vals=st.lists(st.floats(min_value=-100, max_value=100,
                               allow_nan=False, width=32),
                     min_size=1, max_size=15))
@settings(**SETTINGS)
def test_ewma_bounded_by_window_extremes(spark, vals):
    """An average with positive weights stays within [min, max] of the
    lags it covers; first row equals its own value."""
    from datetime import datetime
    from cl_data_frame_spark.operators.relational import ewma
    rows = [(1, i, datetime(2024, 1, 1, 0, 0, i), float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double")
    got = {r.event_id: r.ewma
           for r in ewma(df, alpha=0.4, k=4).spark_df.collect()}
    for i in range(len(vals)):
        window = vals[max(0, i - 3):i + 1]
        assert min(window) - 1e-6 <= got[i] <= max(window) + 1e-6
    assert abs(got[0] - round(vals[0], 6)) <= 1e-6


@given(vals=st.lists(st.integers(min_value=-5, max_value=5),
                     min_size=2, max_size=25))
@settings(**SETTINGS)
def test_global_avg_ranks_are_a_permutation_average(spark, vals):
    """Tie-averaged ranks sum to n(n+1)/2 and are monotone in value."""
    from cl_data_frame_spark.operators.stats import global_avg_ranks
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = sorted(global_avg_ranks(df, "x").spark_df.collect(),
                 key=lambda r: r.x)
    total = sum(r.avg_rank * r.cnt for r in out)
    n = len(vals)
    assert abs(total - n * (n + 1) / 2) < 1e-6
    ranks = [r.avg_rank for r in out]
    assert ranks == sorted(ranks)
    assert sum(r.cnt for r in out) == n


strings_strategy = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=10),
    min_size=1, max_size=10, unique=True)


@given(names=strings_strategy, d=st.sampled_from([1, 2]))
@settings(**SETTINGS)
def test_edit_distance_deletion_scheme_is_exact(spark, names, d):
    """FastSS deletion-neighbourhood candidates must reproduce the
    naive quadratic levenshtein result on arbitrary short strings —
    including empties, shared prefixes, and pure repetitions."""
    from cl_data_frame_spark.operators.dedup import edit_distance_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in
                 edit_distance_join(df, "id", "name", max_dist=d,
                                    method="deletion")
                 .spark_df.collect())
    want = sorted((i, j, lev(a, b))
                  for (i, a) in rows for (j, b) in rows
                  if i < j and lev(a, b) <= d)
    assert got == want


_url_piece = st.text(alphabet="abXY19", min_size=0, max_size=4)


@given(host=st.lists(st.sampled_from(["ex", "Sub", "co", "uk", "org"]),
                     min_size=1, max_size=4),
       path=st.lists(_url_piece, min_size=0, max_size=3),
       params=st.lists(st.sampled_from(
           ["a=1", "b=2", "utm_source=x", "fbclid=z", "C=9"]),
           min_size=0, max_size=4),
       scheme=st.sampled_from(["http", "HTTPS", "ftp"]),
       frag=st.booleans(), slash=st.booleans())
@settings(**SETTINGS)
def test_url_normalize_idempotent(spark, host, path, params, scheme,
                                  frag, slash):
    """normalize(normalize(u)) == normalize(u): canonical forms are
    fixed points (the property every canonicalizer must satisfy, or
    URL-dedup keys drift across pipeline stages)."""
    from cl_data_frame_spark.operators.curation import url_normalize
    u = (scheme + "://" + ".".join(host)
         + ("/" + "/".join(path) if path else "")
         + ("/" if slash else "")
         + ("?" + "&".join(params) if params else "")
         + ("#frag" if frag else ""))
    df = spark.createDataFrame([(1, u)], "id bigint, url string")
    once = url_normalize(df, "url", out_col="n1",
                         domain_col=None).spark_df
    twice = url_normalize(once, "n1", out_col="n2",
                          domain_col=None).spark_df.first()
    assert twice["n2"] == twice["n1"], u


@given(li=st.lists(st.tuples(st.integers(-20, 20), st.integers(0, 10)),
                   min_size=1, max_size=6),
       ri=st.lists(st.tuples(st.integers(-20, 20), st.integers(0, 10)),
                   min_size=1, max_size=6),
       width=st.sampled_from([1.0, 3.0, 7.5]))
@settings(**SETTINGS)
def test_interval_overlap_join_equals_naive(spark, li, ri, width):
    """Bucket-grid overlap join == the naive quadratic definition for
    arbitrary (incl. empty and boundary-touching) intervals at any
    bucket width."""
    from cl_data_frame_spark.operators.relational import \
        interval_overlap_join
    from cl_data_frame_spark.frame import SparkFrame
    lrows = [(i, float(lo), float(lo + ln)) for i, (lo, ln)
             in enumerate(li)]
    rrows = [(i, float(lo), float(lo + ln)) for i, (lo, ln)
             in enumerate(ri)]
    l = SparkFrame(spark.createDataFrame(
        lrows, "lid bigint, l_lo double, l_hi double"))
    r = SparkFrame(spark.createDataFrame(
        rrows, "rid bigint, r_lo double, r_hi double"))
    got = sorted((row.lid, row.rid) for row in
                 interval_overlap_join(l, r, "l_lo", "l_hi",
                                       "r_lo", "r_hi",
                                       bucket_width=width)
                 .spark_df.collect())
    want = sorted((a, b)
                  for a, lo1, hi1 in lrows for b, lo2, hi2 in rrows
                  if lo1 < hi2 and lo2 < hi1
                  and lo1 < hi1 and lo2 < hi2)   # half-open, non-empty
    assert got == want


@given(texts=st.lists(st.text(alphabet="abc .", min_size=0,
                              max_size=20), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_bpe_pieces_reconstruct_pretokens(spark, texts):
    """Lossless-ness: stripping EOW and concatenating a document's BPE
    pieces reproduces the concatenation of its pre-tokens, for any
    merge table learned from any corpus."""
    from cl_data_frame_spark.operators import bpe
    import re
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe.train_bpe(df, "text", n_merges=6)
    enc = bpe.bpe_encode(df, "text", merges).spark_df.collect()
    pat = re.compile(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]")
    for r in enc:
        joined = "".join(p for p in r.bpe_pieces).replace(bpe.EOW, "")
        assert joined == "".join(pat.findall(r.text)), r.text


# the mirror rounds HALF_UP like Spark's F.round (not Python's
# half-even round()): integer inputs still produce exact dyadic folds
# (e.g. level 1.9546875 for ys=[0,0,25,0,0,0], a=0.5, b=0.1) that land
# on a 7th-decimal half where the two tie rules diverge
@given(ys=st.lists(st.integers(min_value=-50, max_value=50)
                   .map(float),
                   min_size=2, max_size=15),
       alpha=st.sampled_from([0.2, 0.5, 0.8]),
       beta=st.sampled_from([0.1, 0.3]))
@example(ys=[0.0, 0.0, 25.0, 0.0, 0.0, 0.0], alpha=0.5, beta=0.1)
@settings(**SETTINGS)
def test_holt_fold_matches_python_reference(spark, ys, alpha, beta):
    """The distributed Holt array fold equals the sequential Python
    recurrence for arbitrary series and smoothing constants."""
    from cl_data_frame_spark.operators.relational import holt_linear
    df = spark.createDataFrame(
        [("g", t, float(v)) for t, v in enumerate(ys)],
        "g string, t int, v double")
    got = holt_linear(df, "t", "v", by=["g"], alpha=alpha,
                      beta=beta, horizon=2).spark_df.first()
    l, bt = ys[0], ys[1] - ys[0]
    c1, c2 = beta * alpha, 1 - beta * alpha
    for y in ys[1:]:
        ln = alpha * y + (1 - alpha) * (l + bt)
        bt = c1 * (y - l) + c2 * bt
        l = ln
    assert got["level"] == _round_half_up(l, 6)
    assert got["trend"] == _round_half_up(bt, 6)
    assert got["forecast"] == _round_half_up(l + 2.0 * bt, 6)


# integer-valued inputs: the operator casts values to decimal(38,2)
# with HALF_UP while Python round() is half-even — exact decimal
# quarter values (0.125, ...) would round differently; integers are
# exact under both, keeping the reference comparison sound
@given(ys=st.lists(st.integers(min_value=-50, max_value=50)
                   .map(float),
                   min_size=2, max_size=15))
@settings(**SETTINGS)
def test_cusum_fold_matches_python_reference(spark, ys):
    """The CUSUM fold equals the sequential reference: same mean/std
    derivation, same max statistics."""
    import math
    from cl_data_frame_spark.operators.relational import cusum_drift
    df = spark.createDataFrame(
        [("g", t, float(v)) for t, v in enumerate(ys)],
        "g string, t int, v double")
    got = cusum_drift(df, "t", "v", by=["g"], kappa=0.5,
                      h=4.0).spark_df.first()
    n = len(ys)
    q = [round(v, 2) for v in ys]          # decimal(38,2) input cast
    sx, sxx = sum(q), sum(v * v for v in q)
    mu = sx / n
    var = (n * sxx - sx * sx) / (n * (n - 1.0))
    sd = math.sqrt(var) if var > 0 else 0.0
    sp = sm = mp = mm = 0.0
    for y in ys:
        sp = max(0.0, sp + (y - mu - 0.5 * sd))
        sm = max(0.0, sm + (mu - y - 0.5 * sd))
        mp, mm = max(mp, sp), max(mm, sm)
    assert got["n"] == n
    # <= (not <): at an exact .…5 tie HALF_UP vs half-even differ by
    # exactly 1e-6, which is still a correct engine answer
    assert abs(got["max_s_plus"] - round(mp, 6)) <= 1e-6
    assert abs(got["max_s_minus"] - round(mm, 6)) <= 1e-6
    assert got["alarm"] == (mp > 4.0 * sd or mm > 4.0 * sd)


@given(rows=st.lists(
    st.tuples(st.integers(min_value=1, max_value=12),   # value
              st.integers(min_value=1, max_value=9)),   # weight
    min_size=1, max_size=60),
    probs=st.lists(st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
                   min_size=1, max_size=3, unique=True))
@settings(**SETTINGS)
def test_weighted_percentile_unkeyed_property(spark, rows, probs):
    """Round 8: the bucketed two-pass by=None plan equals the
    sequential lower weighted-quantile rule on arbitrary tie-heavy
    integer data (integers: the decimal sums and double thresholds
    are exact, so equality is strict)."""
    from cl_data_frame_spark.operators.stats import weighted_percentile
    df = spark.createDataFrame(
        [(float(v), float(w)) for v, w in rows], "v double, w double")
    got = weighted_percentile(df, "v", "w", probs).spark_df.first()

    srt = sorted((float(v), float(w)) for v, w in rows)
    tot = sum(w for _v, w in srt)
    for p in probs:
        cum, want = 0.0, srt[-1][0]
        for v, w in srt:
            cum += w
            if cum >= p * tot:
                want = v
                break
        assert got[f"p{int(round(p * 100))}"] == want, (p, rows)


@given(rows=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=40),
       lo=st.integers(min_value=-50, max_value=50),
       op=st.sampled_from(["==", "<", "<=", ">", ">="]))
@settings(**SETTINGS)
def test_snapshot_stats_pruning_sound(spark, tmp_path_factory, rows,
                                      lo, op):
    """Round 8: file pruning is SOUND for every op — the predicated
    snapshot read equals the brute-force filter of the full table, no
    matter how the values straddle the per-file ranges."""
    from pyspark.sql import functions as F
    from cl_data_frame_spark.sources.snapshots import (snapshot_read,
                                                       snapshot_write)
    t = str(tmp_path_factory.mktemp("snapprop") / "tbl")
    df = spark.createDataFrame([(v,) for v in rows], "v bigint")
    snapshot_write(df.repartitionByRange(3, "v"), t, stats_cols=["v"])
    got = sorted(r.v for r in snapshot_read(
        spark, t, where=[("v", op, lo)]).spark_df.collect())
    pred = {"==": lambda x: x == lo, "<": lambda x: x < lo,
            "<=": lambda x: x <= lo, ">": lambda x: x > lo,
            ">=": lambda x: x >= lo}[op]
    assert got == sorted(v for v in rows if pred(v))


@given(rows=st.lists(st.integers(min_value=-9, max_value=9),
                     min_size=1, max_size=12),
       positions=st.lists(st.integers(min_value=-12, max_value=11),
                          min_size=0, max_size=6),
       val=st.integers(min_value=-99, max_value=99))
@settings(**SETTINGS)
def test_set_slice_positional_property(spark, rows, positions, val):
    """Round 8 (setf slice): positional assignment touches exactly the
    requested cells — the Python-list semantics of the reference's
    typed columns."""
    from cl_data_frame_spark.frame import df as make_df
    n = len(rows)
    positions = [p for p in positions if -n <= p < n]
    g = make_df(spark, "a", list(rows), "b", [str(x) for x in rows])
    out = g.set_slice(positions, "a", val)
    want = list(rows)
    for p in positions:
        want[p if p >= 0 else n + p] = val
    assert out.column("a") == want
    assert out.column("b") == [str(x) for x in rows]


# ---------------------------------------------------------------------------
# snapshot-table lifecycle model test (round 9): a random sequence of
# append / overwrite / delete / merge / optimize / restore operations
# applied BOTH to a snapshot table and to an in-memory dict model —
# the latest read-back must equal the model after every op, and every
# historical version must replay exactly (time-travel immutability).
# ---------------------------------------------------------------------------

_snap_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.integers(0, 900), st.integers(1, 60)),
        st.tuples(st.just("overwrite"),
                  st.integers(0, 900), st.integers(1, 60)),
        st.tuples(st.just("delete"),
                  st.integers(0, 900), st.integers(1, 120)),
        st.tuples(st.just("merge"),
                  st.integers(0, 900), st.integers(1, 30)),
        st.tuples(st.just("update"),
                  st.integers(0, 900), st.integers(1, 120)),
        st.tuples(st.just("rename"), st.just(0), st.just(0)),
        st.tuples(st.just("optimize"), st.just(0), st.just(0)),
        st.tuples(st.just("restore"), st.just(0), st.just(0)),
    ),
    min_size=2, max_size=6)


@given(ops=_snap_ops, seed=st.integers(0, 10))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_lifecycle_matches_model(spark, tmp_path_factory,
                                          ops, seed):
    from cl_data_frame_spark.sources.snapshots import (
        snapshot_add_constraint, snapshot_delete, snapshot_merge,
        snapshot_optimize, snapshot_read, snapshot_rename_column,
        snapshot_restore, snapshot_update, snapshot_write, _versions)
    t = str(tmp_path_factory.mktemp("snapmodel") / "tbl")
    vcol = "v"

    def frame(lo, n, tag):
        return spark.range(lo, lo + n).selectExpr(
            "id AS k", f"concat('{tag}', id) AS {vcol}")

    model: dict[int, str] = {int(k): f"base{k}"
                             for k in range(seed, seed + 40)}
    snapshot_write(frame(seed, 40, "base")
                   .repartitionByRange(4, "k"), t, stats_cols=["k"])
    # an always-true CHECK constraint rides along: every later commit
    # must carry and satisfy it (a false rejection would abort an op)
    snapshot_add_constraint(t, "k_bounds", "k >= 0 AND k < 2000")
    history = [dict(model)]
    for i, (op, a, b) in enumerate(ops):
        if op == "append":
            snapshot_write(frame(a, b, f"a{i}_"), t, mode="append",
                           stats_cols=["k"])
            # append is row-level: duplicate keys legitimately pile up,
            # so the model is a multiset — keep it a dict by avoiding
            # key overlap in appends
            for k in range(a, a + b):
                if k in model:
                    break
            else:
                for k in range(a, a + b):
                    model[k] = f"a{i}_{k}"
                history.append(dict(model))
                continue
            return  # overlapping append: skip this example's rest
        elif op == "overwrite":
            snapshot_write(frame(a, b, f"o{i}_"), t, mode="overwrite",
                           stats_cols=["k"])
            model = {k: f"o{i}_{k}" for k in range(a, a + b)}
        elif op == "delete":
            snapshot_delete(spark, t,
                            [("k", ">=", a), ("k", "<=", a + b)])
            model = {k: v for k, v in model.items()
                     if not (a <= k <= a + b)}
        elif op == "merge":
            snapshot_merge(spark, t, frame(a, b, f"m{i}_"), on="k")
            for k in range(a, a + b):
                model[k] = f"m{i}_{k}"
        elif op == "update":
            snapshot_update(spark, t,
                            [("k", ">=", a), ("k", "<=", a + b)],
                            {vcol: f"concat('u{i}_', k)"})
            model = {k: (f"u{i}_{k}" if a <= k <= a + b else v)
                     for k, v in model.items()}
        elif op == "rename":
            new = "v2" if vcol == "v" else "v"
            snapshot_rename_column(t, vcol, new)
            vcol = new
        elif op == "optimize":
            snapshot_optimize(spark, t, num_files=2)
        elif op == "restore":
            vs = _versions(t)
            target = vs[max(0, len(vs) // 2 - 1)]
            snapshot_restore(t, target)
            # restore rewinds table state to an old version: rebase
            # the model on the restored read (restore's file-set
            # correctness is pinned in test_sources) so subsequent
            # ops keep checking against it
            restored = snapshot_read(spark, t).spark_df
            vcol = [c for c in restored.columns if c != "k"][0]
            model = {r.k: r[vcol] for r in restored.collect()}
        got = {r.k: r[vcol] for r in
               snapshot_read(spark, t).spark_df.collect()}
        assert got == model, (op, i)
        history.append(dict(model))
    # time-travel immutability: version 1 still reads as the base
    base = {r.k: r.v for r in
            snapshot_read(spark, t, version=1).spark_df.collect()}
    assert base == history[0]


@given(ops=st.lists(
    st.tuples(st.sampled_from(["append", "overwrite", "delete",
                               "merge", "update", "optimize",
                               "restore"]),
              st.integers(min_value=0, max_value=120),
              st.integers(min_value=1, max_value=25)),
    min_size=1, max_size=6),
    seed=st.integers(min_value=0, max_value=50))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_replay_reproduces_any_history(spark, tmp_path_factory,
                                           ops, seed):
    """Round 10 CDC soundness: for ANY random DML history (deletion
    vectors, rewrites, overwrites, optimize, restore all mixed),
    applying the batch change feed's rows onto the version-1 state
    reproduces the final table exactly — deletes/pre-images out,
    inserts/post-images in, commit order respected."""
    from cl_data_frame_spark.sources.snapshots import (
        snapshot_changes, snapshot_delete, snapshot_merge,
        snapshot_optimize, snapshot_read, snapshot_restore,
        snapshot_update, snapshot_write, _versions)
    t = str(tmp_path_factory.mktemp("cdcmodel") / "tbl")

    def frame(lo, n, tag):
        return spark.range(lo, lo + n).selectExpr(
            "id AS k", f"concat('{tag}', id) AS v")

    snapshot_write(frame(seed, 40, "base")
                   .repartitionByRange(4, "k"), t, stats_cols=["k"])
    used = set(range(seed, seed + 40))
    for i, (op, a, b) in enumerate(ops):
        if op == "append":
            lo = max(used, default=0) + 1 + a   # never duplicate keys
            snapshot_write(frame(lo, b, f"a{i}_"), t, mode="append",
                           stats_cols=["k"])
            used |= set(range(lo, lo + b))
        elif op == "overwrite":
            snapshot_write(frame(a, b, f"o{i}_"), t,
                           mode="overwrite", stats_cols=["k"])
            used = set(range(a, a + b))
        elif op == "delete":
            snapshot_delete(spark, t,
                            [("k", ">=", a), ("k", "<=", a + b)])
        elif op == "merge":
            snapshot_merge(spark, t, frame(a, b, f"m{i}_"), on="k")
            used |= set(range(a, a + b))
        elif op == "update":
            snapshot_update(spark, t,
                            [("k", ">=", a), ("k", "<=", a + b)],
                            {"v": f"concat('u{i}_', k)"})
        elif op == "optimize":
            snapshot_optimize(spark, t, num_files=2)
        elif op == "restore":
            vs = _versions(t)
            snapshot_restore(t, vs[max(0, len(vs) // 2 - 1)])
    state = {(r.k, r.v) for r in
             snapshot_read(spark, t, version=1).spark_df.collect()}
    changes = sorted(
        snapshot_changes(spark, t, 1).spark_df.collect(),
        key=lambda r: (r._commit_version,
                       0 if r._change_type in ("delete",
                                               "update_preimage")
                       else 1))
    for r in changes:
        if r._change_type in ("delete", "update_preimage"):
            assert (r.k, r.v) in state, ("missing preimage", r)
            state.discard((r.k, r.v))
        else:
            assert (r.k, r.v) not in state, ("duplicate insert", r)
            state.add((r.k, r.v))
    final = {(r.k, r.v) for r in
             snapshot_read(spark, t).spark_df.collect()}
    assert state == final
