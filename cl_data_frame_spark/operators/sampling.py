"""Deterministic hash-based sampling, splits, and interleaving.

Training-data pipelines need reproducible sampling that is stable across
runs, engines, and cluster sizes: random() draws are none of those. Every
operator here derives its randomness from ``md5(id || salt)``, so

* the same row always lands in the same sample/split (re-runs, retries,
  and backfills are consistent),
* the decision is a narrow per-row projection — no shuffle, no state, and
  it composes with predicate pushdown (the filter sits right on the scan),
* any engine with md5 reproduces it bit-for-bit (the DuckDB oracle in
  ``__spark_entry__.oracle_sql`` runs the same expression).

There is no reference analogue (tpapp/cl-data-frame has no sampling
surface, cl-data-frame.lisp:1-583); this is Tier X scope per SURVEY §2.3.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..frame import SparkFrame

#: Resolution of the bucket space. 10^4 buckets keeps fraction resolution
#: at 0.01% while the 8-hex-digit (32-bit) hash space stays ~430k× larger,
#: so per-bucket occupancy is uniform even for billions of rows.
BUCKETS = 10_000


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, BUCKETS) from ``md5(id || salt)``.

    The first 8 hex digits of the md5 are a uniform 32-bit integer;
    mod BUCKETS is a uniform bucket. ``salt`` decorrelates independent
    sampling decisions over the same ids (e.g. a 1% eval sample drawn
    independently from the train/test split).
    """
    h = F.conv(F.substring(F.md5(F.concat(id_col.cast("string"),
                                          F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % BUCKETS).alias("bucket")


def hash_sample(frame, id_col: str, fraction: float,
                salt: str = "") -> SparkFrame:
    """Deterministic ``fraction`` sample: keep rows whose bucket falls
    below ``fraction * BUCKETS``. A pure narrow filter — at 100 TB this
    is a scan-side predicate with zero shuffle."""
    sdf = _plain(frame)
    out = sdf.filter(hash_bucket(F.col(id_col), salt) <
                     int(round(fraction * BUCKETS)))
    return SparkFrame.from_spark(out) if isinstance(frame, SparkFrame) else out


def stratified_hash_sample(frame, id_col: str, strata_col: str,
                           fractions: Mapping[str, float],
                           default: float = 0.0,
                           salt: str = "") -> SparkFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). ``fractions`` maps stratum value ->
    keep fraction; unlisted strata keep ``default``. Still a narrow
    filter: the per-stratum threshold is a CASE expression, no shuffle."""
    sdf = _plain(frame)
    thresh = F.lit(int(round(default * BUCKETS)))
    for value, frac in fractions.items():
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(round(frac * BUCKETS)))).otherwise(thresh)
    out = sdf.filter(hash_bucket(F.col(id_col), salt) < thresh)
    return SparkFrame.from_spark(out) if isinstance(frame, SparkFrame) else out


def hash_split(frame, id_col: str, weights: Mapping[str, float],
               split_col: str = "split", salt: str = "") -> SparkFrame:
    """Disjoint, exhaustive train/val/test assignment.

    ``weights`` maps split name -> weight (normalized internally). Buckets
    are assigned to splits by cumulative weight in the given key order, so
    every row gets exactly one split and the assignment is stable under
    re-runs and engine changes. Narrow projection; no shuffle.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    sdf = _plain(frame)
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1])).alias(split_col)
    out = sdf.withColumn(split_col, expr)
    return SparkFrame.from_spark(out) if isinstance(frame, SparkFrame) else out


def kfold_split(frame, id_col: str, k: int = 5,
                group_col: str | None = None,
                fold_col: str = "fold", salt: str = "cv") -> SparkFrame:
    """Deterministic k-fold cross-validation assignment: fold index in
    [0, k) from the md5 bucket of *id_col* — stable under re-runs,
    engines, and row order (the property random splits lack), so every
    worker/engine agrees which rows are fold 3 without coordination.

    ``group_col`` makes the split LEAKAGE-SAFE at the group level:
    the fold derives from the group key instead of the row id, so all
    rows of one group (a user's events, a document's chunks) land in
    the SAME fold and a model never trains on half of an entity it is
    validated on. Narrow projection, no shuffle either way.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    sdf = _plain(frame)
    key = F.col(group_col if group_col else id_col)
    fold = (hash_bucket(key, salt) % k).cast("int").alias(fold_col)
    out = sdf.withColumn(fold_col, fold)
    return SparkFrame.from_spark(out) if isinstance(frame, SparkFrame) \
        else out


def interleave(frames_weights, id_col: str, salt: str = "mix") -> DataFrame:
    """Weighted deterministic dataset mixing: union N sources, keeping a
    hash-fraction of each. ``frames_weights`` is a list of (frame, keep
    fraction). Sources must share a schema. The union is a no-shuffle
    concatenation; each side's filter pushes to its own scan."""
    out = None
    for fr, frac in frames_weights:
        part = _plain(hash_sample(fr, id_col, frac, salt=salt))
        out = part if out is None else out.unionByName(part)
    return out


def mixture_rates(frame, domain_col: str,
                  target_weights: Mapping[str, float], budget: float,
                  size_col: str | None = None) -> DataFrame:
    """Per-domain keep rates that steer a corpus toward a target mixture
    (the static analog of training-mixture reweighting à la The Pile's
    domain weights): ``rate_d = min(1, budget · w_d / size_d)`` with the
    weights normalized, where ``size_d`` is the domain's row count (or
    its ``size_col`` sum, e.g. chars or tokens). Domains absent from
    *target_weights* get rate 0; a domain too small to fill its slot
    saturates at rate 1 (can't oversample without replacement).

    Returns (domain, size, rate, thresh) where ``thresh = floor(rate ·
    BUCKETS)`` is the md5-bucket cutoff — floor, not round, so the
    integer threshold is identical on every engine.

    Plan: ONE partial+final aggregation to #domains rows; everything
    else is arithmetic on that tiny table.
    """
    sdf = _plain(frame)
    total = float(sum(target_weights.values()))
    if total <= 0:
        raise ValueError("target_weights must sum to a positive value")
    size = (F.count(F.lit(1)) if size_col is None
            else F.sum(F.col(size_col))).alias("__size__")
    sizes = sdf.groupBy(domain_col).agg(size)
    w = None
    for dom, wt in target_weights.items():
        cond = F.col(domain_col) == dom
        lit = F.lit(wt / total)
        w = F.when(cond, lit) if w is None else w.when(cond, lit)
    w = w.otherwise(F.lit(0.0))
    rate = F.least(F.lit(1.0),
                   F.lit(float(budget)) * w
                   / F.col("__size__").cast("double"))
    return sizes.select(domain_col,
                        F.col("__size__").cast("long").alias("size"),
                        rate.alias("rate"),
                        F.floor(rate * BUCKETS).cast("long")
                        .alias("thresh"))


def mixture_sample(frame, id_col: str, domain_col: str,
                   target_weights: Mapping[str, float], budget: float,
                   size_col: str | None = None,
                   salt: str = "mix") -> SparkFrame:
    """Deterministic domain-mixture sampling: compute ``mixture_rates``
    and keep each row iff its md5 bucket falls under its domain's
    threshold. Same (ids, weights, salt) → same sample, on any engine.

    Plan: sizes aggregation (#domains rows) → broadcast-join the
    thresholds back onto the scan → narrow hash filter. The data itself
    never shuffles; at 100 TB this is one scan plus a broadcast of a
    few-row table.
    """
    sdf = _plain(frame)
    rates = mixture_rates(sdf, domain_col, target_weights, budget,
                          size_col)
    joined = sdf.join(F.broadcast(rates.select(domain_col, "thresh")),
                      on=domain_col)
    out = (joined
           .filter(hash_bucket(F.col(id_col), salt) < F.col("thresh"))
           .drop("thresh"))
    return SparkFrame(out)


def per_group_sample(frame, id_col: str, group_col: str, k: int,
                     salt: str = "") -> SparkFrame:
    """Deterministic k-per-group sample (the reproducible replacement
    for per-group reservoir sampling): rank each group's rows by
    ``(md5-bucket(id || salt), id)`` — a uniform but FIXED order — and
    keep the first *k*. Same rows every run, on every engine; different
    *salt* draws an independent sample.

    Plan: one hash shuffle on the group key + in-partition rank; the
    filter keeps ≤ k rows per group, so downstream stages see a bounded
    result regardless of group skew. (A group with fewer than k rows
    keeps them all.)
    """
    from pyspark.sql import Window
    sdf = _plain(frame)
    w = (Window.partitionBy(group_col)
         .orderBy(hash_bucket(F.col(id_col), salt).asc(),
                  F.col(id_col).asc()))
    out = (sdf.withColumn("__rk__", F.row_number().over(w))
           .filter(F.col("__rk__") <= k)
           .drop("__rk__"))
    return SparkFrame(out)


def weighted_sample(frame, id_col: str, weight_col: str, k: int,
                    salt: str = "") -> SparkFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k of the
    Efraimidis-Spirakis A-Res keys): each row draws
    ``u = md5-uniform(id || salt) in (0,1)`` and ranks by
    ``ln(u) / weight`` descending — equivalent to ranking ``u^(1/w)``,
    but the log form keeps the cross-engine float path to one libm call.
    Higher-weight rows win proportionally more often; the same (ids,
    salt) always selects the same sample on any engine with md5.

    Plan: narrow key computation + one TakeOrdered top-k — no shuffle
    beyond the top-k reduction, so at 100 TB it is scan + k-row merge.
    """
    sdf = _plain(frame)
    u = (F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            1, 13), 16, 10).cast("double") / F.lit(float(16 ** 13)))
    key = F.log(u) / F.col(weight_col).cast("double")
    out = (sdf.withColumn("__wkey__", key)
           .orderBy(F.col("__wkey__").desc(), F.col(id_col).asc())
           .limit(k)
           .drop("__wkey__"))
    return SparkFrame(out)


def negative_sample(frame, id_col: str, k: int = 4,
                    salt: str = "neg") -> SparkFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each row, up to *k* pseudo-random OTHER rows, reproducible on
    any engine. The j-th candidate for id ``x`` is the row whose id
    equals ``md5(x || '|' || j || salt) mod (max_id + 1)`` — an
    equi-JOIN against the id table, never a cross join or per-row
    sampling loop; self-pairs drop, candidate ids that don't exist in
    a sparse id space drop (callers wanting exactly-k over sparse ids
    compose a dense index first).

    Output: (id_col, neg_id, j). Scale: the candidate table is k slim
    rows per input row (a bounded ×k projection), joined hash-
    partitioned on the candidate id; max_id is a broadcast one-row
    aggregate. Collision with the positive (x = candidate) is the only
    exclusion — by design negatives are uniform over the corpus, the
    standard in-batch/corpus-negative recipe.
    """
    sdf = _plain(frame)
    ids = sdf.select(F.col(id_col)).distinct()
    mx = ids.agg(F.max(id_col).alias("__mx__"))
    cand = (ids.crossJoin(F.broadcast(mx))
            .select(F.col(id_col),
                    F.explode(F.array(
                        *[F.lit(j) for j in range(k)])).alias("j"),
                    F.col("__mx__"))
            .withColumn(
                "__cand__",
                F.conv(F.substring(F.md5(F.concat_ws(
                    "|", F.col(id_col).cast("string"),
                    F.col("j").cast("string"), F.lit(salt))), 1, 8),
                    16, 10).cast("bigint")
                % (F.col("__mx__") + 1))
            .filter(F.col("__cand__") != F.col(id_col)))
    out = (cand.join(ids.select(F.col(id_col).alias("__cand__")),
                     on="__cand__", how="left_semi")
           .select(id_col, F.col("__cand__").alias("neg_id"), "j"))
    return SparkFrame(out)


def temperature_weights(frame, domain_col: str, alpha: float = 0.7,
                        size_col: str | None = None) -> SparkFrame:
    """Temperature-scaled domain weights ``w_d = p_d^α / Σ p^α`` — the
    multilingual-sampling rule (α < 1 upsamples rare domains; α = 1 is
    natural proportions, α = 0 uniform; the exponent convention of
    public multilingual-pretraining recipes, e.g. the XLM-R /
    mBERT-style sampling rate).

    ``size_col`` weighs domain mass by a size column (chars/tokens)
    instead of row counts. One #domains-row aggregation + a window
    normalization over that tiny table; nothing data-sized moves.

    Output: (domain_col, n, p, w), p the natural share, w the
    temperature-scaled target share, both rounded 6.
    """
    from pyspark.sql import Window
    sdf = _plain(frame)
    mass = (F.sum(F.col(size_col).cast("double")) if size_col
            else F.count(F.lit(1)).cast("double"))
    per = sdf.groupBy(domain_col).agg(mass.alias("__m__"),
                                      F.count(F.lit(1)).alias("n"))
    tot = F.sum("__m__").over(Window.partitionBy())
    p = F.col("__m__") / tot
    pa = F.pow(p, F.lit(alpha))
    za = F.sum(pa).over(Window.partitionBy())
    out = per.select(
        domain_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(p, 6).alias("p"),
        F.round(pa / za, 6).alias("w"))
    return SparkFrame(out)


def temperature_sample(frame, id_col: str, domain_col: str,
                       budget: float, alpha: float = 0.7,
                       salt: str = "temp") -> SparkFrame:
    """Deterministic temperature resampling: draw a *budget*-row sample
    whose domain mix follows ``temperature_weights`` (α < 1 upsamples
    rare domains). Per-domain keep rate = min(1, budget·w_d / n_d),
    applied by md5-bucket thresholding — same sample on every engine,
    no RNG. A domain whose quota exceeds its rows keeps all of them
    (this engine does not replicate rows; cap α or budget if exact
    quotas matter more than at-most-once semantics).

    Plan: one #domains aggregation, broadcast the thresholds back,
    narrow hash filter — one scan, zero data shuffles (the
    ``mixture_sample`` shape with temperature-derived weights).
    """
    sdf = _plain(frame)
    w = _plain(temperature_weights(sdf, domain_col, alpha))
    thresh = w.select(
        domain_col,
        F.least(F.lit(float(BUCKETS)),
                F.lit(float(budget)) * F.col("w")
                * F.lit(float(BUCKETS))
                / F.col("n").cast("double")).alias("__thresh__"))
    out = (sdf.join(F.broadcast(thresh), on=domain_col)
           .filter(hash_bucket(F.col(id_col), salt)
                   < F.col("__thresh__"))
           .drop("__thresh__"))
    return SparkFrame(out)
