"""Tier S relational operators (SURVEY.md §2.2) — absent in the reference
(which has no joins, group-by, sorts, or set ops; verified in SURVEY §2.1),
completed with Spark built-ins exposed through the engine API.

All functions accept and return ``SparkFrame``; execution stays declarative
so Catalyst handles pushdown, pruning, join strategy selection and AQE
re-planning. Scale notes per operator in docstrings.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..frame import ROW_ID, SparkFrame


def _plain(frame):
    if isinstance(frame, SparkFrame):
        return frame.spark_df
    return frame


def join(left: SparkFrame, right: SparkFrame, on, how: str = "inner",
         broadcast_right: bool = False) -> SparkFrame:
    """Relational join; all Spark join types (inner/left/right/full/
    left_semi/left_anti/cross).

    Scale: Catalyst + AQE pick broadcast vs sort-merge vs shuffled-hash at
    runtime; ``broadcast_right=True`` forces a broadcast hint for known-small
    dimension tables (e.g. region/nation), eliminating the shuffle of the
    big fact side entirely.
    """
    rdf = _plain(right)
    if broadcast_right:
        rdf = F.broadcast(rdf)
    out = _plain(left).join(rdf, on=on, how=how)
    return SparkFrame(out)


def group_agg(frame: SparkFrame, group_keys: Sequence[str],
              aggs: Mapping[str, Column], having: Column | None = None,
              kind: str = "groupby",
              sets: Sequence[Sequence[str]] | None = None) -> SparkFrame:
    """Hash aggregation with automatic map-side partial aggregation.

    ``kind``: 'groupby' | 'rollup' | 'cube' | 'grouping_sets' — the
    last takes an explicit *sets* list (each a subset of *group_keys*),
    the general form that rollup/cube are shorthands for; add
    ``F.grouping_id()`` to *aggs* to disambiguate NULL-as-group-key
    from NULL-as-superaggregate.

    Scale: partial aggregation runs before the shuffle, so shuffled
    bytes are proportional to #groups (summed over the grouping sets —
    Spark plans one Expand + one aggregation, not one pass per set);
    AQE coalesces post-shuffle partitions.
    """
    sdf = _plain(frame)
    if kind == "grouping_sets":
        if sets is None:
            raise ValueError("kind='grouping_sets' requires sets=")
        grouping = sdf.groupingSets([list(s) for s in sets],
                                    *group_keys)
    else:
        grouping = {"groupby": sdf.groupBy, "rollup": sdf.rollup,
                    "cube": sdf.cube}[kind](*group_keys)
    out = grouping.agg(*[expr.alias(name) for name, expr in aggs.items()])
    if having is not None:
        out = out.filter(having)
    return SparkFrame(out)


def distinct(frame: SparkFrame, subset: Sequence[str] | None = None) -> SparkFrame:
    """Exact distinct / dropDuplicates(subset) — also Tier X exact dedup.

    Scale: implemented by Spark as a hash aggregate on the subset keys with
    partial aggregation; skewed duplicate keys are handled by AQE.
    """
    sdf = _plain(frame)
    out = sdf.dropDuplicates(list(subset)) if subset else sdf.distinct()
    return SparkFrame(out)


def order_by(frame: SparkFrame, *cols, ascending=True) -> SparkFrame:
    """Total sort; the new ingest order of the result is the sort order.

    Scale: Spark samples ranges and range-partitions (no single-node sort).
    ``monotonically_increasing_id`` after a total sort is ordered across
    partitions (partition index occupies the high bits), so the engine's
    ordering column stays consistent with the sort without a global window.
    """
    sdf = _plain(frame).orderBy(*cols, ascending=ascending)
    sdf = sdf.withColumn(ROW_ID, F.monotonically_increasing_id())
    return SparkFrame(sdf, [c for c in sdf.columns if c != ROW_ID])


def limit(frame: SparkFrame, n: int, offset: int = 0) -> SparkFrame:
    sdf = frame.spark_df_with_id.orderBy(ROW_ID)
    if offset:
        sdf = sdf.offset(offset)
    return SparkFrame(sdf.limit(n).drop(ROW_ID))


def top_k(frame: SparkFrame, k: int, by, ascending: bool = False) -> SparkFrame:
    """Top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
    a per-partition heap + driver merge; no total sort, no full shuffle.

    ``by``: a column/name, a list of them (all sorted per ``ascending``),
    or ``(column, 'asc'|'desc')`` tuples for mixed directions.
    """
    cols = by if isinstance(by, (list, tuple)) else [by]
    orders = []
    for c in cols:
        if isinstance(c, tuple):
            col, direction = c
            col = F.col(col) if isinstance(col, str) else col
            orders.append(col.asc() if direction == "asc" else col.desc())
        else:
            col = F.col(c) if isinstance(c, str) else c
            orders.append(col.asc() if ascending else col.desc())
    out = _plain(frame).orderBy(*orders).limit(k)
    return SparkFrame(out)


def union(a: SparkFrame, b: SparkFrame, by_name: bool = True) -> SparkFrame:
    out = _plain(a).unionByName(_plain(b)) if by_name else _plain(a).union(_plain(b))
    return SparkFrame(out)


def intersect(a: SparkFrame, b: SparkFrame, all: bool = False) -> SparkFrame:
    out = _plain(a).intersectAll(_plain(b)) if all else _plain(a).intersect(_plain(b))
    return SparkFrame(out)


def except_(a: SparkFrame, b: SparkFrame, all: bool = False) -> SparkFrame:
    out = _plain(a).exceptAll(_plain(b)) if all else _plain(a).subtract(_plain(b))
    return SparkFrame(out)


def window_over(frame: SparkFrame, exprs: Mapping[str, Column]) -> SparkFrame:
    """Attach window-function columns (row_number/rank/lag/lead/running
    aggregates built by the caller with ``pyspark.sql.Window``).

    Scale: one shuffle per distinct partitioning; Spark chains window
    functions sharing a (partitionBy, orderBy) into a single WindowExec.
    """
    sdf = frame.spark_df_with_id
    for name, expr in exprs.items():
        sdf = sdf.withColumn(name, expr)
    return SparkFrame(sdf, [c for c in sdf.columns if c != ROW_ID])


def pivot(frame: SparkFrame, group_key: str, pivot_key: str, values,
          agg: Column) -> SparkFrame:
    """Pivot with explicit value list (avoids the extra distinct-values job)."""
    out = _plain(frame).groupBy(group_key).pivot(pivot_key, values).agg(agg)
    return SparkFrame(out)


def unpivot(frame: SparkFrame, ids: Sequence[str], values: Sequence[str],
            var_name: str = "variable", value_name: str = "value") -> SparkFrame:
    """Unpivot / melt: wide value columns -> (variable, value) long rows.

    Spark plans this as a generator expansion (Expand node) — a narrow,
    per-row operation with no shuffle; output rows = input rows x
    len(values).
    """
    out = _plain(frame).unpivot(list(ids), list(values), var_name, value_name)
    return SparkFrame(out)


def asof_join(left: SparkFrame, right: SparkFrame, on: str, by: str | None = None,
              direction: str = "backward", right_prefix: str = "r_",
              tolerance: float | None = None) -> SparkFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' flips it;
    'nearest' takes whichever of the two is closer, ties backward),
    optionally matching a ``by`` equality key.

    ``tolerance`` (pandas ``merge_asof`` semantics) NULLs a match
    whose distance ``|left.on − matched.on|`` exceeds the bound — a
    stale quote should not join to tomorrow's trade. Units: the
    column's own units for numeric ``on``; SECONDS for
    timestamp/date ``on``. Plan-neutral: the matched key rides along
    as one extra filled column and the bound is a post-fill
    projection — no extra shuffle.

    Absent in both the reference and core Spark (SURVEY §2.2 'Joins').
    Keyed path: union + last(..., ignorenulls) over a window partitioned on
    ``by`` — one hash shuffle, O(1) running state per key, no range
    explosion. Unkeyed path: range-partition the union on ``on``, fill
    within each partition, then fix up partition boundaries with a tiny
    per-partition carry table (npartitions rows, broadcast back) — the plan
    stays fully parallel instead of collapsing into one global window.
    Ties on ``on`` among right rows are resolved arbitrarily unless ``on``
    is unique per (by, on); pre-aggregate the right side when it is not.
    """
    ldf = _plain(left)
    rdf = _plain(right)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}")
    if direction == "nearest" and by is None:
        raise ValueError("direction='nearest' requires a by key (the "
                         "unkeyed range-partitioned path would need "
                         "carries in both directions)")
    rcols = [c for c in rdf.columns if c != on and (by is None or c != by)]
    rnames = [right_prefix + c for c in rcols]
    dtype_on = dict(ldf.dtypes)[on]
    is_time = dtype_on.startswith(("timestamp", "date"))

    def _onnum(c):
        return F.unix_micros(c.cast("timestamp")) if is_time else c

    tol_units = (None if tolerance is None
                 else tolerance * 1e6 if is_time else tolerance)
    rdf_t = rdf.select(
        *([F.col(by)] if by else []),
        F.col(on),
        F.lit(1).alias("__is_right__"),
        *[F.col(c).alias(right_prefix + c) for c in rcols])
    ldf_t = ldf.select(
        *ldf.columns,
        F.lit(0).alias("__is_right__"),
        *[F.lit(None).cast(rdf_t.schema[right_prefix + c].dataType)
          .alias(right_prefix + c) for c in rcols])
    unioned = ldf_t.unionByName(rdf_t, allowMissingColumns=True)
    # the matched right row travels as ONE struct (its `on` + every
    # payload column) and is filled with a single last(ignorenulls) —
    # the match is atomic, so a NULL in one right column cannot be
    # backfilled from an older (possibly out-of-tolerance) row, and the
    # tolerance bound applies to the row that supplied every value
    # (pandas merge_asof whole-row semantics)
    row_payload = F.when(
        F.col("__is_right__") == 1,
        F.struct(F.col(on).alias("__on__"),
                 *[F.col(rp) for rp in rnames]))

    if direction == "nearest":
        # Backward fill + forward fill in one plan (same hash partition on
        # `by`, two sort orders -> one Exchange, two in-partition sorts),
        # then pick the candidate with the smaller |on - candidate.on|;
        # ties prefer the backward match. The right payload travels as a
        # struct so the distance compare sees the matched `on` value.
        payload = F.when(
            F.col("__is_right__") == 1,
            F.struct(F.col(on).alias("__on__"),
                     *[F.col(rp) for rp in rnames]))
        w_back = (Window.partitionBy(by)
                  .orderBy(F.col(on).asc(), F.col("__is_right__").desc())
                  .rowsBetween(Window.unboundedPreceding, 0))
        w_fwd = (Window.partitionBy(by)
                 .orderBy(F.col(on).asc(), F.col("__is_right__").asc())
                 .rowsBetween(0, Window.unboundedFollowing))
        both = (unioned
                .withColumn("__back__",
                            F.last(payload, ignorenulls=True).over(w_back))
                .withColumn("__fwd__",
                            F.first(payload, ignorenulls=True).over(w_fwd)))
        dtype = dict(unioned.dtypes)[on]

        def _num(c):
            return (F.unix_micros(c.cast("timestamp"))
                    if dtype.startswith("timestamp") else c)

        dist_b = F.abs(_num(F.col(on)) - _num(F.col("__back__")["__on__"]))
        dist_f = F.abs(_num(F.col(on)) - _num(F.col("__fwd__")["__on__"]))
        chosen = (F.when(F.col("__fwd__").isNull(), F.col("__back__"))
                  .when(F.col("__back__").isNull(), F.col("__fwd__"))
                  .when(dist_f < dist_b, F.col("__fwd__"))
                  .otherwise(F.col("__back__")))
        if tolerance is not None:
            dist_c = F.abs(_onnum(F.col(on))
                           - _onnum(chosen["__on__"]))
            sel = [F.when(dist_c <= F.lit(tol_units),
                          chosen[rp]).alias(rp) for rp in rnames]
        else:
            sel = [chosen[rp].alias(rp) for rp in rnames]
        out = (both.filter(F.col("__is_right__") == 0)
               .select(*ldf.columns, *sel))
        return SparkFrame(out)

    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()

    if by is not None:
        w = (Window.partitionBy(by)
             .orderBy(on_order, F.col("__is_right__").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = (unioned
                  .withColumn("__m__",
                              F.last(row_payload, ignorenulls=True).over(w))
                  .filter(F.col("__is_right__") == 0))
        matched = F.col("__m__")
        if tolerance is not None:
            dist = F.abs(_onnum(F.col(on)) - _onnum(matched["__on__"]))
            matched = F.when(dist <= F.lit(tol_units), matched)
        out = filled.select(
            *ldf.columns,
            *[matched[rp].alias(rp) for rp in rnames])
        return SparkFrame(out)

    # Unkeyed: range-partition on `on` so the fill parallelizes, then carry
    # the last right row of every partition into the following partitions.
    spark = ldf.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parted = (unioned.repartitionByRange(npart, F.col(on))
              .sortWithinPartitions(on_order, F.col("__is_right__").desc())
              .withColumn("__pid__", F.spark_partition_id()))
    w_in = (Window.partitionBy("__pid__")
            .orderBy(on_order, F.col("__is_right__").desc())
            .rowsBetween(Window.unboundedPreceding, 0))
    filled = parted.withColumn(
        "__m__", F.last(row_payload, ignorenulls=True).over(w_in))
    # last right row per partition, as a struct ordered by the as-of key
    # (__on__ is the struct's first field, so max/min orders by it)
    extreme = F.max if direction == "backward" else F.min
    pid_last = parted.groupBy("__pid__").agg(
        extreme(row_payload).alias("__last__"))
    pid_order = (F.col("__pid__").asc() if direction == "backward"
                 else F.col("__pid__").desc())
    w_carry = (Window.orderBy(pid_order)
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = pid_last.select(
        "__pid__",
        F.last("__last__", ignorenulls=True).over(w_carry).alias("__carry__"))
    joined = (filled.join(F.broadcast(carry), on="__pid__", how="left")
              .filter(F.col("__is_right__") == 0))
    # the whole matched row coalesces atomically: in-partition match
    # wins, else the carried last-row struct from earlier partitions
    matched = F.coalesce(F.col("__m__"), F.col("__carry__"))
    if tolerance is not None:
        dist = F.abs(_onnum(F.col(on)) - _onnum(matched["__on__"]))
        matched = F.when(dist <= F.lit(tol_units), matched)
    out = joined.select(
        *[c for c in ldf.columns],
        *[matched[rp].alias(rp) for rp in rnames])
    return SparkFrame(out)


def range_join(left: SparkFrame, right: SparkFrame, left_col: str,
               lower: str, upper: str, how: str = "inner",
               broadcast_right: bool = False) -> SparkFrame:
    """Range (theta) join: left rows matched to right intervals
    ``right.lower <= left.col < right.upper``.

    ``broadcast_right=True`` forces a broadcast hint — correct only when
    the right side is known-small (dimension intervals, bucket grids),
    turning the join into a map-side interval probe with no shuffle of the
    left side. When False (default) the planner chooses the strategy; for
    two large sides, pre-bucket both on a coarse grid and equi-join on the
    bucket before applying the residual range predicate (see
    ``bucketed_range_join``).
    """
    rdf = _plain(right)
    if broadcast_right:
        rdf = F.broadcast(rdf)
    cond = ((F.col(left_col) >= rdf[lower]) & (F.col(left_col) < rdf[upper]))
    out = _plain(left).join(rdf, on=cond, how=how)
    return SparkFrame(out)


def udaf(fn, return_type):
    """Grouped-aggregate UDAF from a pandas function (SURVEY §2.2 UDF/UDAF:
    the reference's arbitrary Lisp closures have no aggregate form; Spark's
    is a ``pandas_udf`` used in ``agg``).

    *fn* receives one ``pd.Series`` per input column for the whole group
    (Arrow-transferred) and returns a scalar. Executed with map-side partial
    batching by Spark's AggregateInPandas — Python runs once per group, not
    per row.
    """
    return F.pandas_udf(fn, return_type)


def group_agg_udaf(frame: SparkFrame, group_keys: Sequence[str],
                   aggs: Mapping[str, tuple]) -> SparkFrame:
    """Hash aggregation with pandas UDAFs: ``aggs`` maps output name ->
    (fn, [input cols], return_type)."""
    sdf = _plain(frame)
    exprs = []
    for name, (fn, cols, rtype) in aggs.items():
        agg_fn = udaf(fn, rtype)
        exprs.append(agg_fn(*[F.col(c) for c in cols]).alias(name))
    return SparkFrame(sdf.groupBy(*group_keys).agg(*exprs))


def _bloom_positions(key: Column, m_bits: int, k: int,
                     salt: str) -> list[Column]:
    """k md5-derived bit positions in [0, m_bits) — the same
    engine-portable uniform-hash recipe as ``sampling.hash_bucket``,
    decorrelated per hash index by the salt suffix."""
    out = []
    for i in range(k):
        h = F.conv(F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f"{salt}{i}"))),
            1, 8), 16, 10)
        out.append(h.cast("long") % m_bits)
    return out


def bloom_build(build, key_col: str, m_bits: int = 8192, k: int = 3,
                salt: str = "bloom") -> DataFrame:
    """ONE-row Bloom bitset over *build*'s key set, as a map
    word-index -> 64-bit word: positions aggregate per word with
    ``bit_or`` (partial+final, #words rows through the shuffle), then
    fold into a single broadcastable map row. m_bits/8 bytes total —
    8 KiB at the default — regardless of build cardinality."""
    sdf = _plain(build)
    pos = (sdf.select(F.explode(F.array(
               *_bloom_positions(F.col(key_col), m_bits, k, salt)))
               .alias("pos"))
           .distinct())
    words = (pos.groupBy(F.expr("pos div 64").alias("w"))
             .agg(F.bit_or(F.expr(
                 "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
                 .alias("bits")))
    return words.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias("__bloom__"))


def bloom_semi_filter(probe, build, key_col: str,
                      build_key_col: str | None = None,
                      m_bits: int = 8192, k: int = 3,
                      salt: str = "bloom") -> SparkFrame:
    """Bloom-filter semi-join pre-filter: keep probe rows whose key
    MIGHT be in *build*'s key set — a superset of the exact semi-join
    with false-positive rate ≈ (1 − e^(−k·n/m))^k, and ZERO shuffle of
    the probe side: the build side reduces to a ≤ m/64-entry bitset
    map broadcast to every task, and the membership test is k
    constant-time word lookups per row, applied at the scan.

    This is the runtime-filter pattern Spark's InjectRuntimeFilter
    applies internally, exposed as an explicit operator with
    md5-derived positions so the exact pass set (false positives
    included) is deterministic and reproducible by an external SQL
    oracle. Compose with the exact join afterwards; at 100 TB the win
    is that most probe rows drop BEFORE the join shuffle.
    """
    bloom = bloom_build(build, build_key_col or key_col, m_bits, k,
                        salt)
    j = _plain(probe).crossJoin(F.broadcast(bloom))
    staged = j.select(
        "*", *[p.alias(f"__bp{i}__")
               for i, p in enumerate(_bloom_positions(
                   F.col(key_col), m_bits, k, salt))])
    cond = None
    for i in range(k):
        word = F.coalesce(
            F.element_at(F.col("__bloom__"),
                         F.expr(f"__bp{i}__ div 64")),
            F.lit(0).cast("long"))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST(__bp{i}__ % 64 AS INT))")
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    out = (staged.filter(cond)
           .drop("__bloom__", *[f"__bp{i}__" for i in range(k)]))
    return SparkFrame(out)


def salted_join(left: SparkFrame, right: SparkFrame, on: Sequence[str] | str,
                how: str = "inner", nsalts: int = 16,
                salt_from: Sequence[str] | None = None) -> SparkFrame:
    """Skew-mitigating equi-join: append a salt to the big (left) side's
    key and replicate the right side across all ``nsalts`` salt values, so
    one hot key spreads over ``nsalts`` shuffle partitions instead of one
    straggler task (SURVEY §2.3 '100 TB posture').

    The salt is derived deterministically from ``salt_from`` columns
    (default: all non-key left columns) via xxhash64 — no RNG, so plans
    are reproducible and safe under task retry. Right-side replication
    multiplies the small side by ``nsalts``; use for big×medium joins
    where AQE's skew splitting isn't enough, broadcast for truly small
    sides.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # the right side is replicated across nsalts, so right/full joins
        # would emit each unmatched right row nsalts times
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not "
            f"{how!r}: right-side replication would duplicate unmatched "
            f"right rows")
    on = [on] if isinstance(on, str) else list(on)
    ldf = _plain(left)
    rdf = _plain(right)
    salt_cols = list(salt_from) if salt_from else \
        [c for c in ldf.columns if c not in on]
    if not salt_cols:
        salt_cols = on
    lsalted = ldf.withColumn(
        "__salt__", F.pmod(F.xxhash64(*salt_cols), F.lit(nsalts)).cast("int"))
    spark = rdf.sparkSession
    salts = spark.range(nsalts).select(F.col("id").cast("int").alias("__salt__"))
    rsalted = rdf.crossJoin(salts)
    out = (lsalted.join(rsalted, on=on + ["__salt__"], how=how)
           .drop("__salt__"))
    return SparkFrame(out)


def bucketed_range_join(left: SparkFrame, right: SparkFrame, left_col: str,
                        lower: str, upper: str, bucket_width: float,
                        how: str = "inner") -> SparkFrame:
    """Range join for two LARGE sides: overlay a coarse grid of width
    ``bucket_width``, explode each right interval into the grid buckets it
    overlaps, equi-join left rows to buckets, then apply the residual range
    predicate.

    Scale: the shuffle is a plain hash partition on the bucket id — no
    broadcast, no cross product. Choose ``bucket_width`` near the typical
    interval length so each interval explodes into O(1) buckets.
    """
    ldf = _plain(left)
    rdf = _plain(right)
    lb = F.floor(F.col(left_col) / F.lit(bucket_width)).alias("__lbucket__")
    rb = F.explode(
        F.sequence(F.floor(F.col(lower) / F.lit(bucket_width)),
                   F.floor((F.col(upper) - F.lit(1e-9)) / F.lit(bucket_width)))
    ).alias("__rbucket__")
    lbk = ldf.select("*", lb)
    rbk = rdf.select("*", rb)
    # the residual range predicate is part of the JOIN CONDITION (not a
    # post-join filter) so non-inner joins keep their null-extended rows
    cond = ((lbk["__lbucket__"] == rbk["__rbucket__"])
            & (lbk[left_col] >= rbk[lower])
            & (lbk[left_col] < rbk[upper]))
    out = (lbk.join(rbk, on=cond, how=how)
           .drop("__lbucket__", "__rbucket__"))
    return SparkFrame(out)


def interval_overlap_join(left: SparkFrame, right: SparkFrame,
                          left_lower: str, left_upper: str,
                          right_lower: str, right_upper: str,
                          bucket_width: float,
                          on: Sequence[str] | str | None = None
                          ) -> SparkFrame:
    """Interval × interval OVERLAP join for two LARGE interval tables:
    half-open ``[lo, hi)`` intervals match iff
    ``left.lo < right.hi AND right.lo < left.hi`` — the sessions ×
    promotion-windows / outage-windows × job-runs shape a real user
    hits immediately after as-of (VERDICT r5 'What's missing' #2).

    Same bucket-grid strategy as ``bucketed_range_join``, extended with
    SPAN REPLICATION on BOTH sides: each interval explodes into every
    grid bucket of width ``bucket_width`` it touches, buckets equi-join
    (plain hash shuffle — no broadcast, no cross product), and the
    residual overlap predicate runs inside the join. A pair whose
    overlap spans several shared buckets would match in each of them,
    so the join condition also ANCHORS every pair to the single bucket
    containing its overlap start ``greatest(left.lo, right.lo)`` —
    exactly-once output without a post-join ``distinct`` shuffle.

    Scale: shuffle volume is rows × (span / bucket_width); choose
    ``bucket_width`` near the typical interval length so each side
    replicates into O(1) buckets. Timestamp intervals: cast to epoch
    seconds/micros first (the grid is numeric). ``on`` adds equality
    keys (same name both sides — per-user sessions × per-user windows)
    to the bucket join key, so co-partitioning happens on
    (key, bucket) and hot wall-clock ranges spread across keys; key
    columns appear once in the output. All other column names must be
    disjoint across the two sides (rename before joining, as with any
    same-name Spark join). Inner-only: null-extension under anchored
    replication would need a separate anti-join pass.
    """
    on = [on] if isinstance(on, str) else list(on or [])
    # half-open semantics: an empty interval [x, x) overlaps nothing —
    # drop before bucketing (also keeps the bucket sequence ascending;
    # sequence(start, stop) with stop < start would generate DESCENDING
    # spurious buckets)
    ldf = _plain(left).filter(F.col(left_lower) < F.col(left_upper))
    rdf = _plain(right).filter(F.col(right_lower) < F.col(right_upper))
    w = float(bucket_width)

    def buckets(lo, hi):
        # last bucket touched by half-open [lo, hi): ceil(hi/w) - 1 —
        # exact on grid boundaries with no epsilon (a subtracted 1e-9
        # underflows to a no-op on large domains like epoch micros,
        # replicating boundary-ending intervals one bucket too far)
        return F.explode(F.sequence(
            F.floor(F.col(lo) / F.lit(w)),
            F.ceil(F.col(hi) / F.lit(w)) - F.lit(1)))

    lbk = ldf.select("*", buckets(left_lower, left_upper)
                     .alias("__lbucket__"))
    rbk = rdf.select("*", buckets(right_lower, right_upper)
                     .alias("__rbucket__"))
    overlap = ((lbk[left_lower] < rbk[right_upper])
               & (rbk[right_lower] < lbk[left_upper]))
    anchor = (F.floor(F.greatest(lbk[left_lower], rbk[right_lower])
                      / F.lit(w)) == lbk["__lbucket__"])
    cond = (lbk["__lbucket__"] == rbk["__rbucket__"]) & overlap & anchor
    for k in on:
        cond = cond & (lbk[k] == rbk[k])
    out = lbk.join(rbk, on=cond, how="inner")
    # key columns appear on both sides of the condition join — emit
    # the left copy once
    keep = ([lbk[k] for k in on]
            + [lbk[c] for c in ldf.columns if c not in on]
            + [rbk[c] for c in rdf.columns if c not in on])
    out = out.select(*keep)
    return SparkFrame(out)


def apply_udtf(frame: SparkFrame, udtf_cls, input_cols: Sequence[str],
               return_schema: str, carry_cols: Sequence[str] = ()) -> SparkFrame:
    """User-defined TABLE function (SURVEY §2.2 UDF/UDAF/UDTF): expand
    each row into zero or more rows via a Python class with an
    ``eval(self, *cols)`` generator (Spark 4 UDTF protocol, Arrow-batched).

    ``udtf_cls`` is the plain class (not yet decorated); ``carry_cols``
    are passed through by LATERAL-joining the UDTF output to its input
    row. UDTFs run partition-parallel like any projection — use for
    row-expanding logic that ``explode``/``posexplode`` + expressions
    cannot state (else prefer those: they stay in codegen).
    """
    from pyspark.sql.functions import udtf as _udtf

    fn = _udtf(udtf_cls, returnType=return_schema)
    sdf = _plain(frame)
    cols = ", ".join(input_cols)
    name = f"udtf_{udtf_cls.__name__.lower()}"
    sdf.sparkSession.udtf.register(name, fn)
    sdf.createOrReplaceTempView(f"__{name}_in__")
    carry = "".join(f"t.{c}, " for c in carry_cols)
    out = sdf.sparkSession.sql(
        f"SELECT {carry}u.* FROM __{name}_in__ t, "
        f"LATERAL {name}({cols}) u")
    return SparkFrame(out)


def merge_into(target, source, on: Sequence[str] | str,
               update_cols: Sequence[str] | None = None,
               insert_unmatched: bool = True,
               delete_unmatched_target: bool = False) -> SparkFrame:
    """MERGE / upsert as a pure relational rewrite (no table format
    required): WHEN MATCHED update ``update_cols`` from the source, WHEN
    NOT MATCHED [insert the source row | keep/drop the target row].

    Plan: one full-outer (or left/right, depending on flags) hash join on
    the key — the same single-shuffle cost a Delta/Iceberg MERGE pays for
    its join phase, minus the transaction log. At 100 TB: bucket both
    sides on the key (``sources.write_bucketed``) and the join is
    shuffle-free.
    """
    keys = [on] if isinstance(on, str) else list(on)
    tdf = _plain(target)
    sdf = _plain(source)
    upd = list(update_cols) if update_cols is not None else \
        [c for c in sdf.columns if c in tdf.columns and c not in keys]
    how = {(True, False): "full", (False, False): "left",
           (True, True): "right", (False, True): "inner"}[
               (insert_unmatched, delete_unmatched_target)]
    t = tdf.alias("t")
    # a non-null source-side marker distinguishes "matched" from
    # "source value is NULL": WHEN MATCHED takes s.c outright (SQL MERGE
    # semantics — a source NULL overwrites the target value)
    s = sdf.withColumn("__src__", F.lit(True)).alias("s")
    joined = t.join(s, on=keys, how=how)
    matched = F.col("s.__src__").isNotNull()
    cols = [F.col(k).alias(k) for k in keys]
    for c in tdf.columns:
        if c in keys:
            continue
        if c in upd:
            cols.append(F.when(matched, F.col(f"s.{c}"))
                        .otherwise(F.col(f"t.{c}")).alias(c))
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    return SparkFrame(joined.select(*cols))


def scd2_build(changes, key_cols: Sequence[str] | str, ts_col: str,
               attr_cols: Sequence[str], tiebreak_col: str | None = None
               ) -> SparkFrame:
    """Build a type-2 slowly-changing-dimension history from a change log:
    one output row per (key, attribute version) with ``valid_from`` (the
    change timestamp), ``valid_to`` (the next change, NULL while current)
    and ``is_current``. Consecutive changes with identical attributes are
    collapsed, so re-stating the same value opens no new version.

    No reference analogue (the reference has no temporal semantics at all;
    its closest op is whole-column replace, cl-data-frame.lisp:570-583).

    Plan: two window passes over ONE hash shuffle on the key (lag for
    change detection, lead for interval close) — the same shape as
    ``sessionize``; fully parallel across keys, no global ordering.
    Determinism: ties on ``ts_col`` are totaled by ``tiebreak_col``
    (required when a key can change twice in one tick).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = list(attr_cols)
    sdf = _plain(changes)
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lag(ts_col).over(w).isNull()
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = (sdf.select(*keys, ts_col, *attrs,
                       *([tiebreak_col] if tiebreak_col
                         and tiebreak_col not in attrs else []))
            .withColumn("__chg__", changed)
            .filter(F.col("__chg__")))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    out = (kept
           .withColumn("valid_from", F.col(ts_col))
           .withColumn("valid_to", F.lead(ts_col).over(w2))
           .withColumn("is_current", F.col("valid_to").isNull())
           .withColumn("version",
                       F.row_number().over(w2).cast("bigint"))
           .drop("__chg__", ts_col))
    if tiebreak_col and tiebreak_col not in attrs:
        out = out.drop(tiebreak_col)
    return SparkFrame(out)


def scd2_lookup(history, probes, key_cols: Sequence[str] | str,
                probe_ts_col: str, vf_col: str = "valid_from",
                vt_col: str = "valid_to") -> SparkFrame:
    """Point-in-time dimension lookup against an SCD2 history (the
    output shape of ``scd2_build``): each probe row joins the ONE
    version whose validity interval contains its timestamp —
    ``valid_from <= t`` and (``valid_to`` IS NULL or ``t < valid_to``),
    i.e. intervals are closed-open, matching ``scd2_build``'s
    ``valid_to = next change``.

    This is the warehouse "as-of" join for fact enrichment: facts pick
    up the dimension attributes as they were at fact time, not as they
    are now.

    Plan: hash equi-join on the key with the validity predicate as a
    join residual — versions per key are few, so the interval resolves
    inside the join's matches; no bucket grid or window needed. Both
    sides co-partition on the key; at 100 TB the history side is
    usually small enough to broadcast.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = _plain(history)
    p = _plain(probes)
    t = F.col(probe_ts_col)
    cond = None
    for k in keys:
        c = p[k] == h[k]
        cond = c if cond is None else cond & c
    cond = cond & (t >= h[vf_col]) \
        & (h[vt_col].isNull() | (t < h[vt_col]))
    out = p.join(h, cond).drop(*[h[k] for k in keys])
    return SparkFrame(out)


def event_transitions(frame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> SparkFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type, to_type) pair of CONSECUTIVE events
    of the same user, the transition count and the row-normalized
    probability ``P(to | from)``.

    Output: (from_type, to_type, n, prob), prob rounded to 6.

    Plan: one lag-window pass (raw events shuffle once on the user
    key), a partial+final hash aggregation down to ≤ #types² rows, and
    the normalizing totals as a window sum over that tiny table.
    Ordering ties break on the event id, so the chain — and therefore
    the matrix — is a deterministic function of the data.
    """
    sdf = _plain(frame)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(id_col).asc())
    pairs = (sdf.select(F.lag(type_col).over(w).alias("from_type"),
                        F.col(type_col).alias("to_type"))
             .filter(F.col("from_type").isNotNull()))
    counts = (pairs.groupBy("from_type", "to_type")
              .agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    out = counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double") / tot.cast("double"), 6)
        .alias("prob"))
    return SparkFrame(out)


def scd2_apply(history, updates, key_cols: Sequence[str] | str, ts_col: str,
               attr_cols: Sequence[str]) -> SparkFrame:
    """Apply a batch of new change rows to an existing SCD2 ``history``
    (the output shape of ``scd2_build``): closed versions are preserved,
    current versions are closed when an update supersedes them, and new
    versions open for changed attributes.

    Implemented as rebuild-over-union: history rows are projected back to
    their opening change events, unioned with ``updates``, and
    ``scd2_build`` re-runs. Because build is a deterministic function of
    the change set, this is exactly incremental-merge semantics with one
    window pass — and at 100 TB the union prunes to only keys present in
    ``updates`` plus untouched history passed through unchanged (the
    anti-join fast path below), so the window shuffle carries only the
    touched keys.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = list(attr_cols)
    hdf = _plain(history)
    udf_ = _plain(updates)
    touched_keys = udf_.select(*keys).distinct()
    untouched = hdf.join(touched_keys, on=keys, how="left_anti")
    touched_hist = hdf.join(touched_keys, on=keys, how="left_semi")
    as_changes = touched_hist.select(
        *keys, F.col("valid_from").alias(ts_col), *attrs)
    merged = as_changes.unionByName(udf_.select(*keys, ts_col, *attrs))
    rebuilt = scd2_build(SparkFrame(merged), keys, ts_col, attrs)
    out = _plain(rebuilt).unionByName(untouched.select(_plain(rebuilt).columns))
    return SparkFrame(out)


def sessionize(frame, user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               gap_minutes: float = 30.0) -> SparkFrame:
    """Batch sessionization: split each user's event stream into sessions
    wherever the gap to the previous event exceeds ``gap_minutes``; emit
    one row per session with start/end/duration/event count.

    The classic lag -> boundary-flag -> running-sum recipe
    (``assign_sessions``): two window passes partitioned BY USER
    (hash-parallel across users — never a global window), then a hash
    aggregate on (user, session). Event-time ties are totaled by
    ``id_col`` so the assignment is deterministic. The streaming
    equivalent is ``streaming.session_window_agg``.
    """
    sdf = _plain(assign_sessions(frame, user_col, ts_col, id_col,
                                 gap_minutes))
    out = (sdf.groupBy(user_col, "session_id")
           .agg(F.min(ts_col).alias("session_start"),
                F.max(ts_col).alias("session_end"),
                F.count(F.lit(1)).alias("n_events")))
    return SparkFrame(out)


def funnel(frame, stages: Sequence[str], user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts") -> SparkFrame:
    """Ordered-funnel analysis: how many users reach each stage IN ORDER
    (stage k counts only users whose first stage-k event is at/after
    their first stage-(k-1) event).

    Plan: ONE conditional aggregation — per user, collect the sorted
    event-time array of each stage in a single groupBy, then resolve the
    ordered reach chain with array expressions (``filter(arr, t >=
    prev)[1]``): stage k's qualifying time is the first stage-k event
    at/after stage k-1's qualifying time. A final single-row aggregate
    counts survivors per stage. One user-keyed shuffle total, one Spark
    job, no driver-side per-stage actions (the previous per-stage
    ``.count()`` loop re-executed the join chain O(stages²) times).
    """
    sdf = _plain(frame)
    arrs = [F.sort_array(F.collect_list(
                F.when(F.col(type_col) == s, F.col(ts_col))))
            .alias(f"__a{i}__") for i, s in enumerate(stages)]
    per_user = (sdf.filter(F.col(type_col).isin(list(stages)))
                .groupBy(user_col).agg(*arrs))
    def _first_at_or_after(arr, prev_col):
        # single-parameter lambda: prev_col enters via closure (a default
        # arg would read as a second lambda variable to Spark's HOF API);
        # try_element_at: an empty array (stage never reached) is NULL
        return F.try_element_at(F.filter(arr, lambda t: t >= prev_col),
                                F.lit(1))

    prev = None
    for i in range(len(stages)):
        arr = F.col(f"__a{i}__")
        qual = (F.try_element_at(arr, F.lit(1)) if prev is None
                else _first_at_or_after(arr, prev))
        per_user = per_user.withColumn(f"__q{i}__", qual)
        prev = F.col(f"__q{i}__")
    totals = per_user.agg(
        *[F.count(F.col(f"__q{i}__")).alias(f"__n{i}__")
          for i in range(len(stages))])
    rows = F.array(*[
        F.struct(F.lit(i).cast("int").alias("stage_idx"),
                 F.lit(s).alias("stage"),
                 F.col(f"__n{i}__").alias("n_users"))
        for i, s in enumerate(stages)])
    out = totals.select(F.explode(rows).alias("r")).select("r.*")
    return SparkFrame(out)


def trailing_range_window(frame, user_col: str = "user_id",
                          ts_col: str = "ts", val_col: str = "value",
                          id_col: str = "event_id",
                          days: int = 7) -> SparkFrame:
    """Event-time RANGE-frame window: per user, the trailing ``days``-day
    sum/count of ``val_col`` at each event — the rows/range distinction
    matters precisely when event times are irregular.

    Partitioned by user (hash-parallel); the range frame is over epoch
    micros so ties are frame-symmetric (deterministic independent of
    intra-ts order). Sums pass through DECIMAL for cross-engine
    reproducibility.
    """
    from pyspark.sql import Window
    sdf = _plain(frame)
    span = days * 86_400_000_000
    us = F.unix_micros(F.col(ts_col))
    w = (Window.partitionBy(user_col).orderBy(us.alias("__us__"))
         .rangeBetween(-span, 0))
    out = sdf.select(
        user_col, id_col, us.alias("ts_us"),
        F.sum(F.col(val_col).cast("decimal(18,6)")).over(w).cast("double")
        .alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"))
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (materialized rollup + delta merge)
# ---------------------------------------------------------------------------

def incremental_agg_build(frame, keys: Sequence[str] | str,
                          sum_cols: Sequence[str] = (),
                          scale: int = 6) -> SparkFrame:
    """Build the mergeable partial-aggregate state of a rollup: per key,
    ``cnt`` plus an exact decimal ``sum_<col>``, ``min_<col>``,
    ``max_<col>`` for every *sum_cols* entry.

    This is the materialized-view pattern for 100 TB rollups: persist the
    partial table once, then absorb each new shard/day with
    ``incremental_agg_merge`` — the base data is never rescanned. All
    stored measures are decomposable aggregates (sum/count/min/max merge
    associatively; avg derives as sum/cnt at read time), and sums pass
    through DECIMAL so merge order never changes the result.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sdf = _plain(frame)
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for c in sum_cols:
        dec = F.col(c).cast(f"decimal(28,{scale})")
        aggs += [F.sum(dec).alias(f"sum_{c}"),
                 F.min(F.col(c)).alias(f"min_{c}"),
                 F.max(F.col(c)).alias(f"max_{c}")]
    return SparkFrame(sdf.groupBy(*keys).agg(*aggs))


def incremental_agg_merge(base_partials, delta_partials,
                          keys: Sequence[str] | str,
                          sum_cols: Sequence[str] = ()) -> SparkFrame:
    """Merge two partial-aggregate tables (the output shape of
    ``incremental_agg_build``) into one: counts and sums add, mins/maxes
    combine — one union + one partial-agg shuffle over the SLIM partial
    tables (#distinct-keys rows), regardless of how much raw data the
    base state summarizes.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    merged = _plain(base_partials).unionByName(_plain(delta_partials))
    aggs = [F.sum("cnt").alias("cnt")]
    for c in sum_cols:
        aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}"),
                 F.min(f"min_{c}").alias(f"min_{c}"),
                 F.max(f"max_{c}").alias(f"max_{c}")]
    return SparkFrame(merged.groupBy(*keys).agg(*aggs))


def resample_fill(frame, ts_col: str, step: str = "1 hour",
                  keys: Sequence[str] | str = (),
                  aggs: Mapping[str, Column] | None = None,
                  fill: str = "zero",
                  fill_cols: Sequence[str] | None = None) -> SparkFrame:
    """Resample an event stream to a fixed grid and fill the gaps: every
    (key, bucket) between each key's first and last event exists in the
    output, with missing buckets filled by ``zero`` or ``ffill``
    (last observation carried forward).

    Plan: one bucket-truncating aggregation, then a per-key dense grid
    via ``sequence(min_bucket, max_bucket, step)`` + ``explode`` (the
    grid lives key-local — never a driver loop or a global calendar
    join), a left join of the sparse aggregates onto the grid (both
    sides hash on (key, bucket)), and for ``ffill`` one window pass
    ``last(value, ignorenulls=True)`` partitioned BY KEY. All stages are
    key-parallel; nothing global.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sdf = _plain(frame)
    aggs = aggs or {"n": F.count(F.lit(1))}
    bucket = F.window(F.col(ts_col), step)["start"].alias("__bucket__")
    sparse = (sdf.groupBy(*keys, bucket)
              .agg(*[e.alias(name) for name, e in aggs.items()]))
    span = (sparse.groupBy(*keys)
            .agg(F.min("__bucket__").alias("__lo__"),
                 F.max("__bucket__").alias("__hi__")))
    grid = span.select(
        *keys,
        F.explode(F.sequence("__lo__", "__hi__",
                             F.expr(f"INTERVAL {step}"))).alias("__bucket__"))
    joined = grid.join(sparse, on=[*keys, "__bucket__"], how="left")
    val_cols = fill_cols or list(aggs.keys())
    if fill == "zero":
        filled = joined.select(
            *keys, "__bucket__",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in val_cols])
    elif fill == "ffill":
        w = (Window.partitionBy(*keys).orderBy("__bucket__")
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = joined.select(
            *keys, "__bucket__",
            *[F.last(F.col(c), ignorenulls=True).over(w).alias(c)
              for c in val_cols])
    elif fill == "bfill":
        w = (Window.partitionBy(*keys).orderBy("__bucket__")
             .rowsBetween(0, Window.unboundedFollowing))
        filled = joined.select(
            *keys, "__bucket__",
            *[F.first(F.col(c), ignorenulls=True).over(w).alias(c)
              for c in val_cols])
    elif fill == "linear":
        # linear interpolation between the surrounding observed grid
        # points: value and bucket-time of the previous/next non-null
        # observation travel as structs through two key-partitioned
        # window passes (ONE shuffle — both windows share the key
        # partitioning); endpoints degrade to ffill/bfill. The standard
        # sensor-series gap repair.
        wb = (Window.partitionBy(*keys).orderBy("__bucket__")
              .rowsBetween(Window.unboundedPreceding, 0))
        wf = (Window.partitionBy(*keys).orderBy("__bucket__")
              .rowsBetween(0, Window.unboundedFollowing))
        t = F.unix_micros(F.col("__bucket__")).cast("double")
        sel = [*keys, "__bucket__"]
        for c in val_cols:
            obs = F.when(F.col(c).isNotNull(),
                         F.struct(t.alias("t"),
                                  F.col(c).cast("double").alias("v")))
            prev = F.last(obs, ignorenulls=True).over(wb)
            nxt = F.first(obs, ignorenulls=True).over(wf)
            interp = (prev["v"]
                      + (nxt["v"] - prev["v"])
                      * (t - prev["t"]) / (nxt["t"] - prev["t"]))
            sel.append(
                F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
                .when(prev.isNull(), nxt["v"])
                .when(nxt.isNull(), prev["v"])
                .otherwise(F.round(interp, 6)).alias(c))
        filled = joined.select(*sel)
    else:
        raise ValueError(
            f"fill must be 'zero'/'ffill'/'bfill'/'linear', got {fill!r}")
    return SparkFrame(filled.withColumnRenamed("__bucket__", "bucket"))


def group_transform(frame, group_keys: Sequence[str] | str, fn,
                    output_schema) -> SparkFrame:
    """Grouped-map transform (split-apply-combine): *fn* receives each
    group as one pandas DataFrame (Arrow-transferred) and returns a
    pandas DataFrame matching *output_schema* — Spark's ``applyInPandas``
    surfaced as an operator, completing the UDF family alongside scalar
    pandas UDFs (map_rows), grouped-agg UDAFs (group_agg_udaf), UDTFs
    (apply_udtf), and stateful streaming (running_user_totals).

    Scale contract: one shuffle on the group keys; Python runs once per
    group (vectorized), so cost is #groups Python calls + Arrow transfer
    of the grouped columns. A group must fit in one executor's memory —
    for skewed group sizes prefer expression rewrites or pre-aggregation.
    """
    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    sdf = _plain(frame)
    return SparkFrame(sdf.groupBy(*keys).applyInPandas(fn, output_schema))


def cohort_retention(frame, user_col: str = "user_id", ts_col: str = "ts",
                     granularity: str = "day") -> SparkFrame:
    """Cohort retention matrix: users are cohorted by the bucket of their
    first activity; cell (cohort, offset) counts distinct cohort members
    active *offset* buckets later. The classic product-analytics rollup.

    Plan: dedup to (user, bucket) (partial-agg), per-user min bucket (one
    more slim agg), an equi-join of the two user-keyed tables (AQE
    broadcasts the cohort table when small), and a final count-distinct
    — every shuffle carries (user, bucket)-sized rows, never raw events.
    """
    unit_us = {"hour": 3_600_000_000, "day": 86_400_000_000,
               "week": 7 * 86_400_000_000}[granularity]
    sdf = _plain(frame)
    b = F.date_trunc("week" if granularity == "week" else granularity,
                     F.col(ts_col))
    user_buckets = sdf.select(F.col(user_col), b.alias("__b__")).distinct()
    firsts = (user_buckets.groupBy(user_col)
              .agg(F.min("__b__").alias("__cohort__")))
    joined = user_buckets.join(firsts, on=user_col)
    offset = ((F.unix_micros("__b__") - F.unix_micros("__cohort__"))
              / F.lit(unit_us)).cast("long")
    out = (joined
           .groupBy(F.col("__cohort__").alias("cohort"),
                    offset.alias("offset"))
           .agg(F.count_distinct(F.col(user_col)).alias("n_users")))
    return SparkFrame(out)


def cdc_apply(snapshot, changes, key_cols: Sequence[str] | str,
              op_col: str = "op") -> SparkFrame:
    """Apply a compacted CDC change feed to a snapshot — the inverse of
    ``table_diff``: rows with ``op='delete'`` drop their key,
    ``'insert'``/``'update'`` upsert the row's after-image values, so
    ``cdc_apply(old, feed(old→new)) == new`` (property-tested).

    The feed must be COMPACTED: one change per key (reduce a raw
    multi-event feed first — groupBy key, keep the latest by sequence
    number). *changes* carries the full after-image columns for
    insert/update; delete rows may leave them NULL.

    Plan: one left-anti join of the snapshot against the feed's key set
    (AQE broadcasts it when small — the common case: feeds are deltas)
    plus a shuffle-free union of the surviving after-images. The
    snapshot never rewrites untouched rows' values, so at 100 TB the
    cost is the key-set join, not the data width.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    s = _plain(snapshot)
    c = _plain(changes)
    touched = c.select(*keys).distinct()
    untouched = s.join(touched, on=keys, how="left_anti")
    after = (c.filter(F.col(op_col) != "delete")
             .drop(op_col).select(s.columns))
    return SparkFrame(untouched.unionByName(after))


def table_checksum(frame, cols: Sequence[str] | None = None) -> SparkFrame:
    """Order-independent whole-table integrity checksum: ONE aggregation
    row (``n_rows``, ``sum_h``, ``xor_h``) where ``h`` is a 48-bit
    integer from the per-row md5 over per-column digests (the same
    injective encoding as ``table_diff``). SUM and BIT_XOR are
    commutative and associative, so the checksum is identical under any
    row order, partitioning, file layout, or engine — verify a 100 TB
    copy with one scan per side and a three-number compare, no sort, no
    shuffle of data (the aggregation reduces map-side).

    ``sum_h`` accumulates ``h % 10^6`` so the bigint sum cannot
    overflow below ~9·10^12 rows; ``xor_h`` keeps the full 48-bit
    digest strength. Cross-engine caveat: floating-point columns
    stringify differently per engine — cast them to DECIMAL strings
    first (as ``table_diff``'s oracle does).
    """
    sdf = _plain(frame)
    cs = list(cols) if cols else list(sdf.columns)
    parts = [F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
             for c in cs]
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 12),
               16, 10).cast("long")
    out = (sdf.select(h.alias("__h__"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__h__") % F.lit(1_000_000)).alias("sum_h"),
                F.expr("bit_xor(__h__)").alias("xor_h")))
    return SparkFrame(out)


def conversion_attribution(frame, user_col: str = "user_id",
                           ts_col: str = "ts",
                           type_col: str = "event_type",
                           id_col: str = "event_id",
                           conversion: str = "purchase",
                           touch_types: tuple[str, ...] = ("view",
                                                           "click")
                           ) -> SparkFrame:
    """First-touch / last-touch conversion attribution: for every
    *conversion* event, the first and the last preceding touch event
    (of *touch_types*) in the same user's history.

    Output: one row per conversion — (id_col, user_col,
    first_touch_id, first_touch_type, last_touch_id, last_touch_type);
    NULL touches mark unattributed conversions (no touch before them).

    Plan: ONE window pass per user ordered by (ts, id) with a
    rows-preceding frame and ``first/last(..., ignorenulls=True)`` —
    raw events shuffle once on the user key; no self-join, no
    per-conversion scan. Ordering ties break on the event id, so the
    attribution is a total order and reproducible everywhere.
    """
    sdf = _plain(frame)
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col(type_col).isin(*touch_types)
    t_id = F.when(is_touch, F.col(id_col))
    t_type = F.when(is_touch, F.col(type_col))
    out = (sdf
           .withColumn("first_touch_id",
                       F.first(t_id, ignorenulls=True).over(w))
           .withColumn("first_touch_type",
                       F.first(t_type, ignorenulls=True).over(w))
           .withColumn("last_touch_id",
                       F.last(t_id, ignorenulls=True).over(w))
           .withColumn("last_touch_type",
                       F.last(t_type, ignorenulls=True).over(w))
           .filter(F.col(type_col) == conversion)
           .select(id_col, user_col, "first_touch_id",
                   "first_touch_type", "last_touch_id",
                   "last_touch_type"))
    return SparkFrame(out)


def rolling_zscore(frame, user_col: str = "user_id", ts_col: str = "ts",
                   val_col: str = "value", id_col: str = "event_id",
                   days: int = 7, z_threshold: float = 3.0) -> SparkFrame:
    """Rolling anomaly detection: each event's z-score against the
    trailing ``days``-day window of ITS OWN key — mean/std derive from
    exact decimal moment sums (sum x, sum x²) over the same event-time
    RANGE frame as ``trailing_range_window``, so the result is
    order-independent and engine-reproducible. Events with
    ``|z| > z_threshold`` are flagged.

    One window pass, partitioned by key (hash-parallel); the frame
    includes the current row, so n >= 1 and std is NULL (never a
    divide-by-zero) until the window holds two events. zscore/is_anomaly
    additionally gate on ``std > 0`` — a window of n>1 IDENTICAL values
    has no z-score (Spark's non-ANSI divide would yield NULL, an IEEE
    engine Inf/NaN; the explicit gate makes the semantics
    engine-independent and the flag False, not NULL).
    """
    from pyspark.sql import Window
    sdf = _plain(frame)
    span = days * 86_400_000_000
    us = F.unix_micros(F.col(ts_col))
    w = (Window.partitionBy(user_col).orderBy(us)
         .rangeBetween(-span, 0))
    x = F.col(val_col).cast("decimal(28,6)")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(x).over(w).cast("double")
    sxx = F.sum(x * x).over(w).cast("double")
    nd = n.cast("double")
    mean = sx / nd
    var = (nd * sxx - sx * sx) / (nd * (nd - F.lit(1.0)))
    std = F.sqrt(var)
    z = (F.col(val_col).cast("double") - mean) / std
    out = sdf.select(
        user_col, id_col, us.alias("ts_us"),
        F.round(mean, 6).alias("roll_mean"),
        F.when(n > 1, F.round(std, 6)).alias("roll_std"),
        F.when((n > 1) & (var > 0), F.round(z, 6)).alias("zscore"),
        F.when(n > 1,
               (var > 0) & (F.abs(z) > z_threshold)).alias("is_anomaly"))
    return SparkFrame(out)


def table_diff(old, new, key_cols: Sequence[str] | str,
               compare_cols: Sequence[str] | None = None) -> SparkFrame:
    """Snapshot diff (CDC extraction): full-outer join two table versions
    on the key and classify every key as ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, any compared column
    differs) or drop it (unchanged). Output: key cols + ``change_type``
    + per-side md5 fingerprints of the compared values.

    One co-partitioned full-outer shuffle join; the change test is a
    null-safe fingerprint comparison (md5 over PER-COLUMN md5 digests),
    so arbitrarily wide rows compare as one string — at 100 TB the
    shuffle carries keys + two fingerprints, not whole rows, when
    callers pre-project.

    The per-column inner md5 makes the encoding injective: every column
    contributes a fixed-width 32-hex digest (NULL -> the non-hex marker
    "N"), so no value containing a separator byte — or equal to a
    sentinel — can shift column boundaries and collide two genuinely
    different rows (a raw ``concat_ws`` encoding has both failure modes).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    o, n = _plain(old), _plain(new)
    cmp_cols = compare_cols or [c for c in o.columns if c not in keys]

    def fp(sdf):
        parts = [F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
                 for c in cmp_cols]
        return F.md5(F.concat_ws("|", *parts))

    lo = o.select(*keys, fp(o).alias("__old_fp__"))
    ln = n.select(*keys, fp(n).alias("__new_fp__"))
    joined = lo.join(ln, on=keys, how="full_outer")
    change = (F.when(F.col("__old_fp__").isNull(), F.lit("insert"))
              .when(F.col("__new_fp__").isNull(), F.lit("delete"))
              .when(F.col("__old_fp__") != F.col("__new_fp__"),
                    F.lit("update")))
    out = (joined.withColumn("change_type", change)
           .filter(F.col("change_type").isNotNull())
           .select(*keys, "change_type",
                   F.col("__old_fp__").alias("old_fp"),
                   F.col("__new_fp__").alias("new_fp")))
    return SparkFrame(out)


def merge_intervals(frame, key_col: str, start_col: str, end_col: str) -> SparkFrame:
    """Gaps-and-islands: merge overlapping or touching intervals per key
    into maximal disjoint islands; emit one row per island with
    (key, island_id, island_start, island_end, n_intervals).

    The classic rolling-max recipe: per key, order intervals by
    (start, end) and flag a NEW island whenever the interval's start
    exceeds the running ``max(end)`` of everything before it; the
    island id is the running sum of flags. Two window passes
    partitioned BY KEY (hash-parallel across keys — never a global
    window) and one hash aggregate. The flag depends only on the
    rolling max, so equal-start ties produce identical islands under
    any tie order and the output is a deterministic function of the
    data — engine-reproducible for the DuckDB oracle.

    100 TB: one shuffle on the key; per-key interval counts bound the
    window state. (The reference has no interval ops —
    cl-data-frame.lisp has no relational layer at all; Tier S surface.)
    """
    sdf = _plain(frame)
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc())
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end),
        F.lit(1)).otherwise(F.lit(0))
    out = (sdf
           .withColumn("__new__", new_island)
           .withColumn("island_id",
                       F.sum("__new__").over(
                           w.rowsBetween(Window.unboundedPreceding, 0)))
           .groupBy(key_col, "island_id")
           .agg(F.min(start_col).alias("island_start"),
                F.max(end_col).alias("island_end"),
                F.count(F.lit(1)).alias("n_intervals")))
    return SparkFrame(out)


def ewma(frame, key_col: str = "user_id", ts_col: str = "ts",
         val_col: str = "value", id_col: str = "event_id",
         alpha: float = 0.3, k: int = 8) -> SparkFrame:
    """Exponentially weighted moving average per key, bounded-memory
    variant: the adjusted EWMA over the trailing ``k`` observations,

        ewma_t = sum_{j<k} (1-a)^j x_{t-j} / sum_{j<k, exists} (1-a)^j

    (pandas ``ewm(alpha, adjust=True, ignore_na=True)`` semantics
    truncated at k lags — a NULL observation mid-series drops its term
    from BOTH numerator and denominator, i.e. surviving observations
    keep their relative weights rather than pandas' default
    position-based ``ignore_na=False`` weighting; the (1-a)^k tail
    each term drops is < 6% of the weight mass at the defaults and
    the truncation is part of the operator contract, so results are
    exactly reproducible in any engine).

    The k lag terms are UNROLLED into k ``lag()`` calls over ONE window
    definition — a single user-keyed shuffle, one pass, all whole-stage
    codegen; no recurrence, no UDF, no per-key state. Bounded k keeps
    the plan O(k) expressions — the scale-safe alternative to an
    unbounded running recurrence (which would need either a
    non-codegen-able running product or driver iteration).
    """
    sdf = _plain(frame)
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    beta = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        term = F.lag(F.col(val_col).cast("double"), j).over(w)
        wgt = F.lit(beta ** j)
        num = num + F.coalesce(term * wgt, F.lit(0.0))
        den = den + F.when(term.isNotNull(), wgt).otherwise(F.lit(0.0))
    out = sdf.select(
        key_col, id_col,
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(val_col).cast("double").alias("value"),
        F.round(num / den, 6).alias("ewma"))
    return SparkFrame(out)


def acf(frame, key_col: str = "user_id", ts_col: str = "ts",
        val_col: str = "value", id_col: str = "event_id",
        max_lag: int = 3) -> SparkFrame:
    """Per-key sample autocorrelation function at lags 1..*max_lag*
    (the standard definition with the full-series mean and variance
    normalizer):

        r_j = Σ_{t>j} (x_t − x̄)(x_{t−j} − x̄) / Σ_t (x_t − x̄)²

    The seasonality/memory screen for event streams — is a user's
    metric bursty (r₁ ≫ 0), mean-reverting (r₁ < 0), or noise?

    Plan: ONE key-partitioned window pass computes all j lag columns
    AND the per-key decimal mean (unbounded partition frame — never a
    global window), then one hash aggregation per key emits every lag
    row via an inline explode — two shuffles total, both keyed, O(k)
    expressions. Per-term products quantize to 6 decimals before the
    per-key sum (order-independent exact aggregation); the mean is an
    exact decimal-sum ratio, so both engines compute identical doubles.

    Output: (key, lag, n_pairs, acf rounded 6); keys with zero
    variance (constant series) yield NULL acf.
    """
    sdf = _plain(frame)
    wp = Window.partitionBy(key_col)
    w = wp.orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    x = F.col(val_col).cast("double")
    mean = (F.sum(x.cast("decimal(28,6)")).over(wp).cast("double")
            / F.count(F.lit(1)).over(wp).cast("double"))
    base = sdf.select(key_col, x.alias("__x__"), mean.alias("__m__"),
                      *[F.lag(x, j).over(w).alias(f"__l{j}__")
                        for j in range(1, max_lag + 1)])
    dev = F.col("__x__") - F.col("__m__")
    den_term = F.round(dev * dev, 6).cast("decimal(38,6)")
    aggs = [F.sum(den_term).alias("__den__"),
            F.count(F.lit(1)).alias("__n__")]
    for j in range(1, max_lag + 1):
        lagdev = F.col(f"__l{j}__") - F.col("__m__")
        num = F.when(F.col(f"__l{j}__").isNotNull(),
                     F.round(dev * lagdev, 6).cast("decimal(38,6)"))
        aggs += [F.sum(num).alias(f"__num{j}__"),
                 F.count(F.col(f"__l{j}__")).alias(f"__np{j}__")]
    per_key = base.groupBy(key_col).agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(j).alias("lag"),
                 F.col(f"__np{j}__").alias("n_pairs"),
                 F.when(F.col("__den__") > 0,
                        F.round(F.col(f"__num{j}__").cast("double")
                                / F.col("__den__").cast("double"), 6))
                 .alias("acf"))
        for j in range(1, max_lag + 1)]))
    out = (per_key.select(key_col, rows.alias("__r__"))
           .select(key_col, F.col("__r__.lag").alias("lag"),
                   F.col("__r__.n_pairs").cast("bigint").alias("n_pairs"),
                   F.col("__r__.acf").alias("acf")))
    return SparkFrame(out)


def trailing_active_users(frame, ts_col: str = "ts",
                          user_col: str = "user_id",
                          days: int = 7) -> SparkFrame:
    """Trailing-window distinct counts (e.g. 7-day active users): for
    every calendar day WITH activity, the number of distinct users
    active in the trailing ``days``-day window ending that day.

    ``count(DISTINCT)`` is not a Spark window function, and the naive
    day×events range join is quadratic. Instead each event row is
    EXPLODED to the ≤``days`` observation days it can influence
    (``sequence(day, day+days-1)``) and a plain distinct-count
    aggregation runs per observation day — a bounded ×days expansion of
    a slim (obs_day, user) projection, one exchange, partial-agg
    combined map-side. A semi-join against the distinct active days
    restricts output to days that actually occur. 100 TB: expansion
    factor is the window length, not data size; the shuffle carries
    (date, bigint) pairs only.
    """
    sdf = _plain(frame)
    day = F.date_trunc("DAY", F.col(ts_col))
    obs = (sdf.select(day.alias("__day__"), F.col(user_col))
           .select(F.explode(F.sequence(
               F.col("__day__"),
               F.col("__day__") + F.expr(f"INTERVAL {days - 1} DAYS"),
               F.expr("INTERVAL 1 DAY"))).alias("obs_day"),
               F.col(user_col)))
    active_days = sdf.select(day.alias("obs_day")).distinct()
    out = (obs.join(active_days, on="obs_day", how="left_semi")
           .groupBy("obs_day")
           .agg(F.count_distinct(F.col(user_col)).alias("active_users")))
    return SparkFrame(out)


def rolling_median(frame, key_col: str = "user_id", ts_col: str = "ts",
                   val_col: str = "value", id_col: str = "event_id",
                   k: int = 7) -> SparkFrame:
    """Rolling exact median over the trailing ``k`` observations per
    key — the robust smoother (outlier-immune, unlike a rolling mean;
    pairs with ``rolling_zscore`` the way ``mad_outliers`` pairs with
    ``iqr_outliers``).

    ``percentile`` runs directly as a WINDOW aggregate over a ROWS
    frame — one user-keyed shuffle, one pass; the imperative aggregate
    buffers at most ``k`` values per frame, so state is bounded by the
    window length, not the partition. Output: (key, id, ts_us, value,
    roll_median rounded 6).
    """
    sdf = _plain(frame)
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
         .rowsBetween(-(k - 1), 0))
    med = F.percentile(F.col(val_col).cast("double"), F.lit(0.5)).over(w)
    out = sdf.select(
        key_col, id_col,
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(val_col).cast("double").alias("value"),
        F.round(med, 6).alias("roll_median"))
    return SparkFrame(out)


def assign_sessions(frame, user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    gap_minutes: float = 30.0) -> SparkFrame:
    """Per-EVENT session assignment: every input row plus its
    ``session_id`` (1-based per user, gap-based boundaries) — the
    event-level form of ``sessionize``, for downstream operators that
    need the raw events tagged (path mining, within-session funnels).
    Same two window passes partitioned by user; same deterministic
    event-time + id ordering.
    """
    sdf = _plain(frame)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(id_col).asc())
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev = F.lag(ts_col).over(w)
    new_sess = (F.when(prev.isNull(), F.lit(1))
                .when((F.unix_micros(F.col(ts_col))
                       - F.unix_micros(prev)) > gap_us, F.lit(1))
                .otherwise(F.lit(0)))
    out = (sdf.withColumn("__new__", new_sess)
           .withColumn("session_id",
                       F.sum("__new__").over(
                           w.rowsBetween(Window.unboundedPreceding, 0)))
           .drop("__new__"))
    return SparkFrame(out)


def top_paths(frame, user_col: str = "user_id", ts_col: str = "ts",
              type_col: str = "event_type", id_col: str = "event_id",
              gap_minutes: float = 30.0, depth: int = 3,
              k: int = 20) -> SparkFrame:
    """User-journey mining: the *k* most common session-opening event
    paths — each session's first *depth* event types joined with
    ``>`` — with the number of sessions following each path. The
    sequence-level complement of ``funnel`` (which checks ONE
    prescribed order; this DISCOVERS the orders that actually occur)
    and ``event_transitions`` (first-order only; paths capture
    higher-order structure).

    Plan: ``assign_sessions``'s user-keyed window passes, then one
    hash aggregation per (user, session) that sorts each session's
    (ts, id, type) structs in-row (``sort_array`` — no extra ordering
    shuffle) and slices the first *depth* types, one path-count
    aggregation, and a TakeOrdered top-k with a total (count desc,
    path) tiebreak. State per group = session length; nothing global.
    """
    sdf = _plain(assign_sessions(frame, user_col, ts_col, id_col,
                                 gap_minutes))
    seq = (sdf.groupBy(user_col, "session_id")
           .agg(F.sort_array(F.collect_list(F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(type_col).alias("e")))).alias("__seq__"))
           .select(F.array_join(
               F.slice(F.transform("__seq__", lambda s: s["e"]),
                       1, depth), ">").alias("path")))
    out = (seq.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
           .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
           .limit(k))
    return SparkFrame(out)


def seasonal_decompose(frame, ts_col: str, val_col: str, period: int,
                       by: Sequence[str] | None = None) -> SparkFrame:
    """Classical additive seasonal decomposition (the moving-average
    procedure of the public X-11/STL lineage, additive form):

        value = trend + seasonal + residual

    - **trend**: centered moving average of length *period* (odd
      period: plain window mean; even period: the standard 2×p
      weighted MA — half weight on both end lags via lag/lead).
      NULL at the series edges where the window is incomplete (classic
      behavior — no fabricated trend).
    - **seasonal**: per-phase mean of the detrended series
      (phase = position in the period cycle), re-centered so the
      seasonal components sum to ~0 over one cycle.
    - **residual**: value − trend − seasonal.

    Expects a REGULAR series per group (run ``resample_fill`` first —
    gaps would shift every later phase). Plan: one window pass for the
    trend + phase, one #groups×period aggregation for the phase means
    (tiny, broadcast back), one #groups aggregation for the centering
    term — nothing data-sized beyond the single ordered window.

    Output: input columns + (phase, trend, seasonal, residual),
    doubles rounded 6.
    """
    by = list(by or [])
    sdf = _plain(frame)
    w_order = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    half = period // 2
    w_ma = w_order.rowsBetween(-half, half)
    x = F.col(val_col).cast("double")
    cnt = F.count(x).over(w_ma)
    if period % 2 == 1:
        trend = F.when(cnt == period, F.avg(x).over(w_ma))
    else:
        full = F.sum(x).over(w_ma)
        lo = F.lag(x, half).over(w_order)
        hi = F.lead(x, half).over(w_order)
        trend = F.when(
            (cnt == period + 1) & lo.isNotNull() & hi.isNotNull(),
            (full - F.lit(0.5) * lo - F.lit(0.5) * hi)
            / F.lit(float(period)))
    phase = (F.row_number().over(w_order) - 1) % period
    base = sdf.withColumn("phase", phase.cast("int")) \
              .withColumn("__trend__", trend)
    det = F.col(val_col).cast("double") - F.col("__trend__")
    pm = (base.groupBy(*by, "phase")
          .agg(F.avg(det).alias("__pm__")))
    ctr = (pm.groupBy(*by)
           .agg(F.avg("__pm__").alias("__ctr__")))
    joined = base.join(F.broadcast(pm), on=by + ["phase"], how="left")
    if by:
        joined = joined.join(F.broadcast(ctr), on=by, how="left")
    else:
        joined = joined.crossJoin(F.broadcast(ctr))
    seasonal = F.col("__pm__") - F.col("__ctr__")
    resid = (F.col(val_col).cast("double") - F.col("__trend__")
             - seasonal)
    out = joined.select(
        *by, ts_col, val_col, "phase",
        F.round(F.col("__trend__"), 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(resid, 6).alias("residual"))
    return SparkFrame(out)


def _bounded_series_guard(sdf, by: list[str], op: str,
                          max_points_per_key: int,
                          alternative: str) -> None:
    """Fail-fast pre-scan for the bounded-series-per-key folds
    (``holt_linear`` / ``cusum_drift``): ONE cheap count aggregation
    (map-side combined — bytes per key, never values) finds the
    largest key; if it exceeds *max_points_per_key*, raise
    ``BoundedSeriesExceeded`` BEFORE the collect_list aggregation
    would buffer that key's whole series in one executor. The
    docstring contract alone couldn't stop a hot key with 10⁸ points
    from OOMing an executor at 100 TB — this makes the contract
    enforced, with ``assume_bounded=True`` as the audited escape
    hatch (mirrors ``stats._cardinality_guard``'s ``exact=True``)."""
    from ..errors import BoundedSeriesExceeded
    counts = (sdf.groupBy(*by).agg(F.count(F.lit(1)).alias("__n__"))
              if by else
              sdf.agg(F.count(F.lit(1)).alias("__n__")))
    worst = counts.agg(F.max("__n__")).collect()[0][0]
    if worst is not None and worst > max_points_per_key:
        raise BoundedSeriesExceeded(op, worst, max_points_per_key,
                                    alternative)


def holt_linear(frame, ts_col: str, val_col: str,
                by: Sequence[str] | None = None,
                alpha: float = 0.5, beta: float = 0.3,
                horizon: int = 3,
                order_cols: Sequence[str] | None = None,
                max_points_per_key: int = 5_000_000,
                assume_bounded: bool = False) -> SparkFrame:
    """Holt's linear-trend double exponential smoothing per key (the
    public Holt 1957 / Winters lineage, additive trend, no season):

        l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = βα·(y_t − l_{t−1}) + (1 − βα)·b_{t−1}

    (the trend line algebraically substituted so each state field is
    read exactly once per step — the same operation order on every
    engine, so results are bit-identical). Init: l₁ = y₁,
    b₁ = y₂ − y₁; series with fewer than 2 points are dropped.

    Plan: ONE hash aggregation collects each key's ordered value
    array (``order_cols`` pins tie order; default (ts_col,)), and the
    recurrence folds over it as a single array expression — a bounded-
    series-per-key contract (the per-key forecasting shape: millions
    of keys × thousands of points each, state is 2 doubles). For
    unbounded per-key series, window-based EWMA (``ewma``) is the
    streaming-friendly alternative. The contract is ENFORCED: a cheap
    count pre-scan raises ``BoundedSeriesExceeded`` when any key holds
    more than *max_points_per_key* points (``assume_bounded=True``
    skips the scan when key cardinality is known safe).

    Output: by-cols + (n, level, trend, forecast) — ``forecast`` =
    level + horizon·trend, doubles rounded 6.
    """
    by = list(by or [])
    order_cols = list(order_cols or [ts_col])
    sdf = _plain(frame)
    if not assume_bounded:
        _bounded_series_guard(sdf, by, "holt_linear",
                              max_points_per_key, "relational.ewma")
    sort_struct = F.struct(
        *[F.col(c).alias(f"__o{i}__") for i, c in enumerate(order_cols)],
        F.col(val_col).cast("double").alias("__v__"))
    per = (sdf.groupBy(*by)
           .agg(F.transform(F.array_sort(F.collect_list(sort_struct)),
                            lambda s: s["__v__"]).alias("__ys__")))
    arr = F.col("__ys__")
    n = F.size(arr)
    a1, a2 = float(alpha), float(1 - alpha)
    c1, c2 = float(beta * alpha), float(1 - beta * alpha)
    # try_element_at: the n >= 2 filter is in the same plan, but ANSI
    # element_at must not blow up if Spark evaluates the projection
    # before the predicate on a 1-point series
    init = F.array(
        F.try_element_at(arr, F.lit(1)),
        F.try_element_at(arr, F.lit(2)) - F.try_element_at(arr, F.lit(1)))
    state = F.aggregate(
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
        init,
        lambda acc, y: F.array(
            F.lit(a1) * y
            + F.lit(a2) * (F.element_at(acc, 1) + F.element_at(acc, 2)),
            F.lit(c1) * (y - F.element_at(acc, 1))
            + F.lit(c2) * F.element_at(acc, 2)))
    out = (per.filter(n >= 2)
           .withColumn("__st__", state)
           .select(*by,
                   n.alias("n"),
                   F.round(F.element_at("__st__", 1), 6).alias("level"),
                   F.round(F.element_at("__st__", 2), 6).alias("trend"),
                   F.round(F.element_at("__st__", 1)
                           + F.lit(float(horizon))
                           * F.element_at("__st__", 2), 6)
                   .alias("forecast")))
    return SparkFrame(out)


def cusum_drift(frame, ts_col: str, val_col: str,
                by: Sequence[str] | None = None,
                kappa: float = 0.5, h: float = 4.0,
                order_cols: Sequence[str] | None = None,
                max_points_per_key: int = 5_000_000,
                assume_bounded: bool = False) -> SparkFrame:
    """Two-sided CUSUM drift detection per key (Page 1954, public
    methodology): fold the ordered series with

        S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − κσ))
        S⁻_t = max(0, S⁻_{t−1} + (μ − x_t − κσ))

    and alarm when either cumulative sum's MAXIMUM exceeds h·σ — the
    standard sequential mean-shift detector (κ = half the shift to
    detect, h the decision interval, both in per-key σ units). μ/σ
    come from the key's own exact decimal moment sums in the SAME
    aggregation that collects the ordered array, so the whole detector
    is one hash aggregation + one array fold (the ``holt_linear``
    bounded-series-per-key shape; 4-double fold state, and the same
    ENFORCED *max_points_per_key* pre-scan guard /
    ``assume_bounded=True`` escape). Keys with
    n < 2 are dropped (σ undefined).

    Output: by-cols + (n, mu, sd, max_s_plus, max_s_minus, alarm),
    doubles rounded 6; the S values are reported in σ-unscaled raw
    units (compare against h·σ — ``alarm`` already does).
    """
    by = list(by or [])
    order_cols = list(order_cols or [ts_col])
    sdf = _plain(frame)
    if not assume_bounded:
        _bounded_series_guard(sdf, by, "cusum_drift",
                              max_points_per_key, "relational.ewma")
    x = F.col(val_col).cast("decimal(38,2)")
    sort_struct = F.struct(
        *[F.col(c).alias(f"__o{i}__") for i, c in enumerate(order_cols)],
        F.col(val_col).cast("double").alias("__v__"))
    per = (sdf.groupBy(*by)
           .agg(F.transform(F.array_sort(F.collect_list(sort_struct)),
                            lambda s: s["__v__"]).alias("__ys__"),
                F.count(F.lit(1)).alias("n"),
                F.sum(x).alias("__sx__"),
                F.sum(x * x).alias("__sxx__"))
           .filter(F.col("n") >= 2))
    n = F.col("n").cast("double")
    sx = F.col("__sx__").cast("double")
    sxx = F.col("__sxx__").cast("double")
    mu = sx / n
    sd = F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0))))
    per = per.withColumn("__mu__", mu).withColumn("__sd__", sd)
    slack = F.lit(float(kappa)) * F.col("__sd__")

    def sp(acc, y):
        return F.greatest(F.lit(0.0),
                          F.element_at(acc, 1)
                          + (y - F.col("__mu__") - slack))

    def sm(acc, y):
        return F.greatest(F.lit(0.0),
                          F.element_at(acc, 2)
                          + (F.col("__mu__") - y - slack))

    state = F.aggregate(
        F.col("__ys__"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, y: F.array(
            sp(acc, y), sm(acc, y),
            F.greatest(F.element_at(acc, 3), sp(acc, y)),
            F.greatest(F.element_at(acc, 4), sm(acc, y))))
    limit = F.lit(float(h)) * F.col("__sd__")
    out = (per.withColumn("__st__", state)
           .select(*by,
                   F.col("n").cast("bigint").alias("n"),
                   F.round("__mu__", 6).alias("mu"),
                   F.round("__sd__", 6).alias("sd"),
                   F.round(F.element_at("__st__", 3), 6)
                   .alias("max_s_plus"),
                   F.round(F.element_at("__st__", 4), 6)
                   .alias("max_s_minus"),
                   ((F.element_at("__st__", 3) > limit)
                    | (F.element_at("__st__", 4) > limit))
                   .alias("alarm")))
    return SparkFrame(out)
