"""Statistical column functions — DataFrameStatFunctions parity
(`df.stat.corr/cov/crosstab/freqItems`) re-expressed as deterministic
aggregations.

The reference's statistics surface is its column summaries
(cl-data-frame.lisp:23-52,60-124); these extend it with the standard
two-column statistics a Spark user expects, Tier S scope per SURVEY §2.2.

Cross-engine determinism: every moment (sum x, sum x², sum xy, …)
accumulates as DECIMAL, so the aggregation is exact and
order-independent; correlation/covariance derive from those exact sums
in a fixed double-arithmetic expression. Plain ``corr()``/``covar()``
over doubles would be partition-order-dependent and could never
hash-match an external oracle.

Scale: each statistic is one partial+final hash aggregation (map-side
combine, one shuffle on the group key); the crosstab pivot carries one
row per (group, pivot-value) pair through the shuffle, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


def _dec(col, scale: int = 4, precision: int = 38) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def moment_stats(frame, x_col: str, y_col: str,
                 by: list[str] | None = None) -> SparkFrame:
    """Pearson correlation, sample covariance, and sample stddevs of two
    numeric columns, optionally per group — from exact decimal moment
    sums (n, Σx, Σy, Σx², Σy², Σxy), so the result is identical under
    any row order or partitioning:

        corr = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) (nΣy² − (Σy)²))
        cov  = (Σxy − ΣxΣy/n) / (n − 1)

    Output: by-cols + (n, corr, cov_samp, std_x, std_y), rounded to 6.
    """
    sdf = _plain(frame)
    x, y = _dec(x_col, 2), _dec(y_col, 2)
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"), F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy")]
    grouped = sdf.groupBy(*(by or [])).agg(*aggs)
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr = (n * sxy - sx * sy) / F.sqrt(var_x * var_y)
    cov = (sxy - sx * sy / n) / (n - F.lit(1.0))
    std_x = F.sqrt(var_x / (n * (n - F.lit(1.0))))
    std_y = F.sqrt(var_y / (n * (n - F.lit(1.0))))
    out = grouped.select(
        *(by or []),
        F.col("n"),
        F.round(corr, 6).alias("corr"),
        F.round(cov, 6).alias("cov_samp"),
        F.round(std_x, 6).alias("std_x"),
        F.round(std_y, 6).alias("std_y"))
    return SparkFrame(out)


def crosstab(frame, row_col: str, col_col: str,
             col_values: list[str]) -> SparkFrame:
    """Contingency table (``df.stat.crosstab`` equivalent) with an
    explicit pivot-value list: one row per ``row_col`` value, one count
    column per entry of ``col_values`` (named ``n_<value>``).

    The explicit value list keeps the plan single-pass (Spark's own
    crosstab first runs a distinct job to discover columns) and the
    output schema stable for oracles. One partial+final aggregation; the
    shuffle carries (row-value, counts-vector) rows only.
    """
    sdf = _plain(frame)
    aggs = [F.sum(F.when(F.col(col_col) == v, 1).otherwise(0))
            .cast("long").alias(f"n_{v}") for v in col_values]
    out = sdf.groupBy(row_col).agg(*aggs)
    return SparkFrame(out)


def top_frequent(frame, col: str, k: int = 5) -> SparkFrame:
    """Exact top-k most frequent values of a column (the deterministic
    replacement for ``df.stat.freqItems``'s sketch): count per value,
    rank by (count desc, value asc) — total order, reproducible anywhere.

    Plan: hash aggregate (partial+final) then a k-row TakeOrdered-style
    window over the aggregated (distinct-value-sized) table — the window
    input is #distinct values, never raw rows.
    """
    sdf = _plain(frame)
    counts = sdf.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("n").desc(), F.col(col).asc())
    out = (counts.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select(col, "n", "rank"))
    return SparkFrame(out)


def quantile_bins(frame, col: str, n_bins: int = 4,
                  by: list[str] | None = None,
                  output_col: str = "bin",
                  cuts=None) -> SparkFrame:
    """Equal-frequency discretization (QuantileDiscretizer analog): cut
    *col* at its exact ``i/n_bins`` percentiles (optionally per group)
    and label each row with its 1-based bin.

    Plan: one partial+final percentile aggregation produces a cutpoint
    array per group (#groups rows), broadcast back onto the input, and
    the bin label is ``1 + #cutpoints < value`` — a pure array
    expression, no second shuffle of the data. At 100 TB swap the exact
    percentile for ``sketch.kll_quantiles`` cutpoints; the assignment
    expression is unchanged.

    *cuts*: optional precomputed cutpoint table (by-cols + a ``__cuts__``
    sorted array<double> column) — lets a caller that also needs
    ``iqr_outliers`` fences derive BOTH from one shared percentile
    aggregation instead of two full passes.
    """
    sdf = _plain(frame)
    if cuts is None:
        probs = [i / n_bins for i in range(1, n_bins)]
        agg = F.percentile(
            F.col(col),
            F.array(*[F.lit(p) for p in probs])).alias("__cuts__")
        cuts = sdf.groupBy(*by).agg(agg) if by else sdf.agg(agg)
    else:
        cuts = _plain(cuts)
    joined = (sdf.join(F.broadcast(cuts), on=by) if by
              else sdf.crossJoin(F.broadcast(cuts)))
    label = F.lit(1) + F.size(F.filter(
        "__cuts__", lambda c: F.col(col) > c))
    return SparkFrame(joined.withColumn(output_col, label)
                      .drop("__cuts__"))


def iqr_outliers(frame, col: str, by: list[str] | None = None,
                 k: float = 1.5, quartiles=None) -> SparkFrame:
    """Tukey-fence outlier flagging: rows outside
    ``[q1 - k*IQR, q3 + k*IQR]`` (optionally per group).

    Same plan as ``quantile_bins``: one exact-percentile aggregation for
    the fences (swap in ``sketch.kll_quantiles`` at scale), broadcast
    back, and a pure comparison expression — adds an ``is_outlier``
    boolean plus the fences to every row, no second shuffle.

    *quartiles*: optional precomputed table (by-cols + ``__q__`` =
    array<double>[q1, q3]) — share one percentile aggregation with
    ``quantile_bins`` instead of scanning twice.
    """
    sdf = _plain(frame)
    if quartiles is None:
        agg = F.percentile(F.col(col),
                           F.array(F.lit(0.25), F.lit(0.75))).alias("__q__")
        fences = sdf.groupBy(*by).agg(agg) if by else sdf.agg(agg)
    else:
        fences = _plain(quartiles)
    joined = (sdf.join(F.broadcast(fences), on=by) if by
              else sdf.crossJoin(F.broadcast(fences)))
    q1, q3 = F.col("__q__")[0], F.col("__q__")[1]
    lo = q1 - F.lit(k) * (q3 - q1)
    hi = q3 + F.lit(k) * (q3 - q1)
    out = (joined
           .withColumn("fence_lo", F.round(lo, 6))
           .withColumn("fence_hi", F.round(hi, 6))
           .withColumn("is_outlier",
                       (F.col(col) < lo) | (F.col(col) > hi))
           .drop("__q__"))
    return SparkFrame(out)


def quantile_bins_outliers(frame, col: str, n_bins: int = 4,
                           by: list[str] | None = None, k: float = 1.5,
                           output_col: str = "bin") -> SparkFrame:
    """Fused ``quantile_bins`` + ``iqr_outliers``: ONE exact-percentile
    aggregation computes both the bin cutpoints (``i/n_bins``) and the
    Tukey quartiles (0.25/0.75) per group, broadcast back once — so a
    caller needing both labels and outlier flags scans the table twice
    total (stats pass + labeling pass) instead of four times.

    Per-row output matches the composition exactly: *output_col* (1-based
    bin), ``fence_lo``/``fence_hi`` (rounded 6), ``is_outlier`` —
    ``percentile(col, array(...))`` interpolates each probability
    independently, so the shared array yields the identical cutpoint and
    quartile doubles the separate operators produce.
    """
    sdf = _plain(frame)
    bin_probs = [i / n_bins for i in range(1, n_bins)]
    probs = bin_probs + [0.25, 0.75]
    agg = F.percentile(F.col(col),
                       F.array(*[F.lit(p) for p in probs])).alias("__p__")
    stats = sdf.groupBy(*by).agg(agg) if by else sdf.agg(agg)
    joined = (sdf.join(F.broadcast(stats), on=by) if by
              else sdf.crossJoin(F.broadcast(stats)))
    nb = len(bin_probs)
    cuts = F.slice("__p__", 1, nb)
    label = F.lit(1) + F.size(F.filter(cuts, lambda c: F.col(col) > c))
    q1, q3 = F.col("__p__")[nb], F.col("__p__")[nb + 1]
    lo = q1 - F.lit(k) * (q3 - q1)
    hi = q3 + F.lit(k) * (q3 - q1)
    out = (joined
           .withColumn(output_col, label)
           .withColumn("fence_lo", F.round(lo, 6))
           .withColumn("fence_hi", F.round(hi, 6))
           .withColumn("is_outlier",
                       (F.col(col) < lo) | (F.col(col) > hi))
           .drop("__p__"))
    return SparkFrame(out)
