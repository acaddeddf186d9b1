"""Column summaries and frame printing (reference R26-R28).

The reference computes print-oriented per-column aggregates
(cl-data-frame.lisp:23-117):

- bit vectors -> count of ones + percentage (:31-38,65-66);
- generic vectors -> exact frequency table per distinct value; when more
  than ``*column-summary-quantiles-threshold*`` (=10, :60-61) distinct reals
  are present, a 5-point **exact weighted quantile** summary
  (min/q25/q50/q75/max computed from the frequency table, :72-83) plus the
  real count; non-real values listed by descending count (:84-87);
- frames print ``(ncol x nrow)`` and summarize columns iff
  nrow >= ``*column-summary-minimum-length*`` (=10, :463-476), else verbatim.

Spark realization: one ``groupBy(col).count()`` per summarized column (cost
O(#distinct) after a map-side partial aggregation — the same sparse-counter
trade-off the reference makes at cl-data-frame.lisp:69-83), and **exact**
``percentile`` (not ``approx_percentile``) because the reference's quantiles
are exact (SURVEY.md §7.4.3). At 100 TB use ``approximate=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F
from pyspark.sql import types as T

#: distinct-real threshold above which quantiles replace the frequency table
QUANTILES_THRESHOLD = 10
#: minimum frame length for print-time summarization
SUMMARY_MINIMUM_LENGTH = 10
#: cap on distinct values pulled to the driver for the frequency table —
#: the repr prints 10, so collecting every distinct value of a
#: high-cardinality column (an OOM at scale) buys nothing. The true
#: distinct count is reported separately via approx_count_distinct.
FREQUENCY_COLLECT_CAP = 100


@dataclass
class BitSummary:
    """Count of ones + percentage (cl-data-frame.lisp:31-38,65-66)."""
    length: int
    count: int

    @property
    def ratio(self) -> float:
        return self.count / self.length if self.length else 0.0

    def __repr__(self):
        return f"bits, ones: {self.count} ({round(self.ratio * 100)}%)"


@dataclass
class QuantilesSummary:
    """Exact 5-point summary over the real elements (cl-data-frame.lisp:72-83)."""
    count: int
    min: float
    q25: float
    q50: float
    q75: float
    max: float

    def __repr__(self):
        return (f"{self.count} reals, min={self.min} q25={self.q25} "
                f"q50={self.q50} q75={self.q75} max={self.max}")


@dataclass
class GenericSummary:
    """Frequency table by descending count (cl-data-frame.lisp:84-117);
    ``quantiles`` present when > threshold distinct reals. When quantiles
    are computed, real-valued entries are dropped from the frequency list,
    matching the reference (cl-data-frame.lisp:84-87). ``n_distinct`` is
    the (approximate) total distinct count — ``frequencies`` is capped at
    ``FREQUENCY_COLLECT_CAP`` entries so the driver never collects an
    unbounded distinct set."""
    length: int
    frequencies: list[tuple[object, int]]
    quantiles: QuantilesSummary | None = None
    n_distinct: int | None = None

    def __repr__(self):
        parts = []
        if self.quantiles is not None:
            parts.append(repr(self.quantiles))
        parts += [f"{v!r} ({c})" for v, c in self.frequencies[:10]]
        shown = len(self.frequencies[:10])
        if self.n_distinct is not None and self.n_distinct > shown:
            parts.append(f"... ~{self.n_distinct} distinct")
        return ", ".join(parts) if parts else "(empty)"


@dataclass
class FrameSummary:
    nrow: int
    ncol: int
    columns: list[tuple[str, object]] = field(default_factory=list)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                              T.FloatType, T.DoubleType, T.DecimalType))


def column_summary(frame, key: str, approximate: bool = False):
    """Summarize one column, dispatching on type like the reference's
    ``column-summary`` generic (cl-data-frame.lisp:63-90).

    ``approximate=True`` swaps the exact ``percentile`` (which buffers the
    column per partition before one merge) for ``approx_percentile``
    (a fixed-size QuantileSummaries sketch, mergeable map-side) — the
    100 TB path; quantiles then carry bounded rank error instead of being
    exact."""
    frame._keys.index(key)
    dtype = dict((f.name, f.dataType) for f in frame.spark_df.schema)[key]
    sdf = frame.spark_df_with_id
    if isinstance(dtype, T.BooleanType):
        row = sdf.agg(
            F.sum(F.col(key).cast("long")).alias("ones")).collect()[0]
        # length is the column length (= frame length), not the non-null
        # count — matches the reference's bit-vector summary.
        return BitSummary(length=frame.nrow, count=row["ones"] or 0)

    # One combined aggregate (row/non-null/approx-distinct counts +, for
    # numerics, the exact 5-point percentile — computed eagerly since
    # deciding after a frequency pass would cost another scan). The capped
    # top-N frequency job only runs when its output can survive: once
    # quantiles summarize a numeric column, the reference keeps only
    # non-real frequency entries (cl-data-frame.lisp:84-87) and the sole
    # non-real value a typed numeric column can hold is null — whose count
    # job 1 already knows — so the groupBy shuffle is skipped entirely.
    aggs = [F.approx_count_distinct(key).alias("nd"),
            F.count(key).alias("n"),
            F.count(F.lit(1)).alias("nrows")]
    if _is_numeric(dtype):
        pfn = "approx_percentile" if approximate else "percentile"
        aggs.append(
            F.expr(f"{pfn}({key}, array(0.0, 0.25, 0.5, 0.75, 1.0))")
            .alias("qs"))
    stats = sdf.agg(*aggs).collect()[0]
    n_nulls = stats["nrows"] - stats["n"]

    quantiles = None
    if (_is_numeric(dtype) and stats["qs"] is not None
            # nd is approximate (~2% rse) — only trust it well clear of the
            # threshold; in the uncertain band fall through to the exact
            # frequency pass below
            and stats["nd"] > QUANTILES_THRESHOLD * 2):
        quantiles = QuantilesSummary(stats["n"],
                                     *[float(x) for x in stats["qs"]])
        frequencies = [(None, n_nulls)] if n_nulls else []
        return GenericSummary(length=frame.nrow, frequencies=frequencies,
                              quantiles=quantiles, n_distinct=stats["nd"])

    freq_rows = (sdf.groupBy(key).count()
                 .orderBy(F.desc("count"), F.asc_nulls_last(key))
                 .limit(FREQUENCY_COLLECT_CAP)
                 .collect())
    frequencies = [(r[0], r[1]) for r in freq_rows]
    if _is_numeric(dtype):
        distinct_reals = sum(1 for v, _ in frequencies if v is not None)
        if distinct_reals > QUANTILES_THRESHOLD and stats["qs"] is not None:
            quantiles = QuantilesSummary(stats["n"],
                                         *[float(x) for x in stats["qs"]])
            # reference drops real-valued entries from the frequency list
            # once quantiles summarize them (cl-data-frame.lisp:84-87)
            frequencies = [(v, c) for v, c in frequencies if v is None]
    return GenericSummary(length=frame.nrow, frequencies=frequencies,
                          quantiles=quantiles, n_distinct=stats["nd"])


def equi_width_histogram(frame, key: str, n_bins: int = 10):
    """Equi-width histogram of a numeric column — the distribution view
    the reference's quantile summary (cl-data-frame.lisp:63-90) implies
    but never materializes. Output: one row per NON-EMPTY bin with
    (bin, lo, hi, n); bin width is ``(max − min) / n_bins`` and the top
    bin is closed (the max value clamps into bin ``n_bins − 1``).

    Plan: one tiny min/max aggregation broadcast back onto the scan,
    then a partial+final count aggregation to ≤ n_bins rows — two scans,
    no data shuffle. All bounds arithmetic is a fixed double-op chain
    over the exact min/max, so bins and edges are engine-reproducible.
    Degenerate column (min == max) lands everything in bin 0.
    """
    sdf = frame.spark_df if hasattr(frame, "spark_df") else frame
    b = sdf.agg(F.min(key).alias("__mn__"), F.max(key).alias("__mx__"))
    j = sdf.select(key).crossJoin(F.broadcast(b))
    nb = F.lit(float(n_bins))
    width = (F.col("__mx__") - F.col("__mn__")) / nb
    bin_ = (F.when(F.col("__mx__") > F.col("__mn__"),
                   F.least(F.floor((F.col(key) - F.col("__mn__"))
                           / width),
                           F.lit(n_bins - 1)))
            .otherwise(F.lit(0))).cast("long")
    agg = (j.withColumn("__bin__", bin_)
           .groupBy("__bin__")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("__mn__").alias("__mn__"),
                F.min("__mx__").alias("__mx__")))
    w2 = (F.col("__mx__") - F.col("__mn__")) / nb
    lo = F.col("__mn__") + F.col("__bin__").cast("double") * w2
    return agg.select(F.col("__bin__").alias("bin"),
                      F.round(lo, 6).alias("lo"),
                      F.round(lo + w2, 6).alias("hi"),
                      F.col("n"))


def equi_width_histogram2d(frame, x_key: str, y_key: str,
                           n_bins_x: int = 10, n_bins_y: int = 10):
    """2-D equi-width histogram (heatmap binning) over two numeric
    columns — the joint-distribution view behind density heatmaps and
    drift dashboards. Output: one row per NON-EMPTY cell with
    (bin_x, bin_y, lo_x, lo_y, n); both top bins are closed (each max
    clamps into its last bin).

    Same plan shape as the 1-D histogram: ONE tiny min/max aggregation
    over both columns broadcast back onto the scan, then a
    partial+final count aggregation to ≤ n_bins_x·n_bins_y rows — two
    scans, no data shuffle, all bounds arithmetic a fixed double-op
    chain (engine-reproducible). A degenerate axis (min == max)
    collapses to bin 0 on that axis.
    """
    sdf = frame.spark_df if hasattr(frame, "spark_df") else frame
    b = sdf.agg(F.min(x_key).alias("__mnx__"),
                F.max(x_key).alias("__mxx__"),
                F.min(y_key).alias("__mny__"),
                F.max(y_key).alias("__mxy__"))
    j = sdf.select(x_key, y_key).crossJoin(F.broadcast(b))

    def bin_of(key, mn, mx, nb):
        width = (F.col(mx) - F.col(mn)) / F.lit(float(nb))
        return (F.when(F.col(mx) > F.col(mn),
                       F.least(F.floor((F.col(key) - F.col(mn)) / width),
                               F.lit(nb - 1)))
                .otherwise(F.lit(0))).cast("long")

    agg = (j.withColumn("__bx__", bin_of(x_key, "__mnx__", "__mxx__",
                                         n_bins_x))
           .withColumn("__by__", bin_of(y_key, "__mny__", "__mxy__",
                                        n_bins_y))
           .groupBy("__bx__", "__by__")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("__mnx__").alias("__mnx__"),
                F.min("__mxx__").alias("__mxx__"),
                F.min("__mny__").alias("__mny__"),
                F.min("__mxy__").alias("__mxy__")))
    wx = (F.col("__mxx__") - F.col("__mnx__")) / F.lit(float(n_bins_x))
    wy = (F.col("__mxy__") - F.col("__mny__")) / F.lit(float(n_bins_y))
    lox = F.col("__mnx__") + F.col("__bx__").cast("double") * wx
    loy = F.col("__mny__") + F.col("__by__").cast("double") * wy
    return agg.select(F.col("__bx__").alias("bin_x"),
                      F.col("__by__").alias("bin_y"),
                      F.round(lox, 6).alias("lo_x"),
                      F.round(loy, 6).alias("lo_y"),
                      F.col("n"))


def frame_repr(frame) -> str:
    """Printable representation with the reference's summarization threshold
    (print-object, cl-data-frame.lisp:463-476)."""
    header = f"SparkFrame ({frame.ncol} x {frame.nrow})"
    lines = [header]
    if frame.nrow >= SUMMARY_MINIMUM_LENGTH:
        for k in frame.keys():
            lines.append(f"  {k}: {column_summary(frame, k)!r}")
    else:
        data = frame.as_dict()
        for k in frame.keys():
            lines.append(f"  {k}: {data[k]!r}")
    return "\n".join(lines)


def profile_table(frame, cols: list[str] | None = None,
                  approximate: bool = False) -> "object":
    """One-scan-per-family column profiler: for each selected column, the row
    count, NULL count, exact distinct count, min/max (as strings, so
    heterogeneous types share one output schema) and — for numeric
    columns — the mean. The long-format analogue of the reference's
    whole-frame summary print (cl-data-frame.lisp:463-476), shaped as
    a queryable table instead of console text.

    Plan: TWO aggregations over the input — the distinct-count family
    (Spark plans multi-``count_distinct`` via one Expand +
    partial/final HASH agg) and the order-statistics family (count /
    nulls / min / max / mean) — broadcast-crossJoined into one wide
    row that a driver-free array-explode pivots to one row per column.
    Mixing the two families into one aggregate forces the whole plan
    into a single global SortAggregate (the ``first()``-wrapped
    string buffers disqualify hash aggregation; measured ~2x slower
    at sf0.1); split, each side keeps its partial+final hash form.
    ``approximate=True`` is the 100 TB path: HyperLogLog++
    (``approx_count_distinct``) replaces the exact distinct counts,
    turning the Expand-multiplied distinct pass into one constant-size
    mergeable sketch per column; everything else is unchanged.

    Output: (column, n_rows, n_null, n_distinct, min_str, max_str,
    mean) — mean NULL for non-numerics, rounded 6.
    """
    from .frame import SparkFrame
    sdf = frame.spark_df if isinstance(frame, SparkFrame) else frame
    cols = list(cols) if cols is not None else list(sdf.columns)
    dtypes = {f.name: f.dataType for f in sdf.schema}
    plain = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        plain.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                     .cast("long").alias(f"__null__{c}"))
        plain.append(F.min(F.col(c)).cast("string")
                     .alias(f"__min__{c}"))
        plain.append(F.max(F.col(c)).cast("string")
                     .alias(f"__max__{c}"))
        if _is_numeric(dtypes[c]):
            plain.append(F.round(F.avg(F.col(c)), 6)
                         .alias(f"__mean__{c}"))
    nd = (F.approx_count_distinct if approximate else F.count_distinct)
    distincts = [nd(F.col(c)).alias(f"__nd__{c}") for c in cols]
    wide = sdf.agg(*plain).crossJoin(F.broadcast(sdf.agg(*distincts)))
    entries = []
    for c in cols:
        mean = (F.col(f"__mean__{c}") if _is_numeric(dtypes[c])
                else F.lit(None).cast("double"))
        entries.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n__").alias("n_rows"),
            F.col(f"__null__{c}").alias("n_null"),
            F.col(f"__nd__{c}").alias("n_distinct"),
            F.col(f"__min__{c}").alias("min_str"),
            F.col(f"__max__{c}").alias("max_str"),
            mean.alias("mean")))
    out = (wide.select(F.explode(F.array(*entries)).alias("p"))
           .select("p.*"))
    return SparkFrame(out)


def key_containment(child_frame, child_col: str, parent_frame,
                    parent_col: str) -> "SparkFrame":
    """Join-key containment profile: how much of *child_col*'s distinct
    value set exists in *parent_col* — the foreign-key discovery /
    referential-integrity audit every warehouse migration runs before
    trusting a join (a 0.98 containment is a data bug, not a key).

    One row: (n_child_distinct, n_matched, n_missing, containment
    rounded 6, parent_unique) — ``verdict``: 'fk' when containment is
    exactly 1 AND the parent side is duplicate-free (a true candidate
    key), 'partial' when > 0, 'none' otherwise. NULL child values are
    excluded (SQL FK semantics: NULLs don't participate).

    Plan: both sides collapse to DISTINCT key sets first (hash aggs,
    slim), then one left join + one count pass over #distinct rows —
    at 100 TB the data-sized tables never shuffle, only their key
    projections.
    """
    from cl_data_frame_spark.frame import SparkFrame

    def _plain(fr):
        return fr.spark_df if isinstance(fr, SparkFrame) else fr

    c = (_plain(child_frame).select(F.col(child_col).alias("__k__"))
         .filter(F.col("__k__").isNotNull()).distinct())
    pdf = _plain(parent_frame).select(F.col(parent_col).alias("__k__")) \
        .filter(F.col("__k__").isNotNull())
    pd_distinct = pdf.groupBy("__k__").agg(
        F.count(F.lit(1)).alias("__c__"))
    joined = c.join(pd_distinct, on="__k__", how="left")
    # parent uniqueness over the WHOLE parent key set (an unmatched
    # duplicate still disqualifies it as a candidate key)
    pmax = pd_distinct.agg(
        F.coalesce(F.max("__c__"), F.lit(0)).alias("__pmax__"))
    agg = (joined.agg(
        F.count(F.lit(1)).alias("n_child_distinct"),
        F.sum(F.when(F.col("__c__").isNotNull(), 1).otherwise(0))
        .alias("n_matched"))
        .crossJoin(F.broadcast(pmax)))
    pu = F.col("__pmax__") <= 1
    containment = (F.col("n_matched").cast("double")
                   / F.col("n_child_distinct").cast("double"))
    verdict = (F.when((containment == 1.0) & pu, "fk")
               .when(F.col("n_matched") > 0, "partial")
               .otherwise("none"))
    out = agg.select(
        F.lit(f"{child_col}->{parent_col}").alias("pair"),
        F.col("n_child_distinct").cast("bigint").alias("n_child_distinct"),
        F.col("n_matched").cast("bigint").alias("n_matched"),
        (F.col("n_child_distinct") - F.col("n_matched")).cast("bigint")
        .alias("n_missing"),
        F.round(containment, 6).alias("containment"),
        pu.alias("parent_unique"),
        verdict.alias("verdict"))
    return SparkFrame(out)
