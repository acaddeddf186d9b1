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
              kind: str = "groupby") -> SparkFrame:
    """Hash aggregation with automatic map-side partial aggregation.

    ``kind``: 'groupby' | 'rollup' | 'cube' (grouping-set variants).
    Scale: partial aggregation runs before the shuffle, so shuffled bytes
    are proportional to #groups, not #rows; AQE coalesces post-shuffle
    partitions.
    """
    sdf = _plain(frame)
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
    a per-partition heap + driver merge; no total sort, no full shuffle."""
    cols = by if isinstance(by, (list, tuple)) else [by]
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    cols = [c.asc() if ascending else c.desc() for c in cols]
    out = _plain(frame).orderBy(*cols).limit(k)
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


def asof_join(left: SparkFrame, right: SparkFrame, on: str, by: str | None = None,
              direction: str = "backward", right_prefix: str = "r_") -> SparkFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (direction='backward'; 'forward' flips it),
    optionally matching a ``by`` equality key.

    Absent in both the reference and core Spark (SURVEY §2.2 'Joins').
    Implemented as the union + last(..., ignorenulls) over a window recipe:
    tag both sides, union by name, then for every left row take the most
    recent right values seen so far within the (by) partition ordered by
    (on). One shuffle on (by); no range explosion, no skewed theta-join.
    At 100 TB this beats a range join because state per key is O(1) in the
    running window, and the shuffle is a plain hash partition on ``by``.
    """
    ldf = _plain(left)
    rdf = _plain(right)
    rcols = [c for c in rdf.columns if c != on and (by is None or c != by)]
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
    if direction == "backward":
        w = (Window.partitionBy(*( [by] if by else []))
             .orderBy(F.col(on).asc(), F.col("__is_right__").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = unioned.select(
            *[c for c in unioned.columns if not c.startswith(right_prefix)],
            *[F.last(right_prefix + c, ignorenulls=True).over(w)
              .alias(right_prefix + c) for c in rcols])
    elif direction == "forward":
        w = (Window.partitionBy(*([by] if by else []))
             .orderBy(F.col(on).desc(), F.col("__is_right__").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = unioned.select(
            *[c for c in unioned.columns if not c.startswith(right_prefix)],
            *[F.last(right_prefix + c, ignorenulls=True).over(w)
              .alias(right_prefix + c) for c in rcols])
    else:
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    out = filled.filter(F.col("__is_right__") == 0).drop("__is_right__")
    return SparkFrame(out)


def range_join(left: SparkFrame, right: SparkFrame, left_col: str,
               lower: str, upper: str, how: str = "inner") -> SparkFrame:
    """Range (theta) join: left rows matched to right intervals
    ``right.lower <= left.col < right.upper``.

    Scale: when the right side is small (dimension intervals, bucketing
    tables) it is broadcast, making this a map-side interval probe; for two
    large sides, pre-bucket both on a coarse grid and equi-join on the
    bucket before applying the residual range predicate.
    """
    cond = ((F.col(left_col) >= _plain(right)[lower])
            & (F.col(left_col) < _plain(right)[upper]))
    out = _plain(left).join(F.broadcast(_plain(right)), on=cond, how=how)
    return SparkFrame(out)
