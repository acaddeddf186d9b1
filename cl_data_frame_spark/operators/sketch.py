"""Mergeable approximate sketches (Tier S 'aggregations' completion).

At 100 TB exact distinct counts and exact quantiles are often the wrong
trade: these operators expose Spark's mergeable sketch aggregates —
HyperLogLog (Apache DataSketches binary sketches that UNION across
shards/days) and GK/KLL-style approximate percentiles. All are
order-independent (register-max / mergeable summaries), so results are
deterministic for a given dataset even though they are approximate.

No reference analogue (the reference's only aggregate surface is the
whole-column summary, cl-data-frame.lisp:63-90).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frame import SparkFrame


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


def approx_distinct(frame, col: str, group_cols: Sequence[str] = (),
                    rsd: float = 0.02) -> SparkFrame:
    """HyperLogLog++ distinct-count estimate per group (``rsd`` = target
    relative standard deviation). One partial-aggregating shuffle of
    fixed-size sketch states — #groups x sketch bytes, independent of
    row count."""
    sdf = _plain(frame)
    agg = F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    out = (sdf.groupBy(*group_cols).agg(agg) if group_cols
           else sdf.agg(agg))
    return SparkFrame(out)


def hll_sketch(frame, col: str, group_cols: Sequence[str] = (),
               lg_k: int = 12) -> SparkFrame:
    """DataSketches HLL: returns BOTH the estimate and the binary sketch
    per group. The sketch column is the point: persist it per shard/day
    and ``hll_union_agg`` rolls it up later without rescanning — the
    canonical pre-aggregation pattern for 100 TB distinct-count cubes."""
    sdf = _plain(frame)
    sk = F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    out = (sdf.groupBy(*group_cols).agg(sk) if group_cols
           else sdf.agg(sk))
    out = out.select(*group_cols,
                     F.hll_sketch_estimate("sketch").alias("estimate"),
                     "sketch")
    return SparkFrame(out)


def hll_rollup(sketch_frame, group_cols: Sequence[str] = ()) -> SparkFrame:
    """Merge previously materialized HLL sketches (e.g. per-day partials)
    into coarser groups — a sketch-state union, no raw-data rescan."""
    sdf = _plain(sketch_frame)
    agg = F.hll_union_agg("sketch").alias("sketch")
    out = (sdf.groupBy(*group_cols).agg(agg) if group_cols
           else sdf.agg(agg))
    return SparkFrame(out.select(
        *group_cols, F.hll_sketch_estimate("sketch").alias("estimate"),
        "sketch"))


def approx_quantiles(frame, col: str, probabilities: Sequence[float],
                     group_cols: Sequence[str] = (),
                     accuracy: int = 10_000) -> SparkFrame:
    """Greenwald-Khanna approximate percentiles per group: mergeable
    summaries, one fixed-size-state shuffle. The exact-percentile path
    (``summary.column_summary``) stays the reference-parity default;
    this is the at-scale variant."""
    sdf = _plain(frame)
    agg = F.percentile_approx(
        col, F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy)).alias("quantiles")
    out = (sdf.groupBy(*group_cols).agg(agg) if group_cols
           else sdf.agg(agg))
    return SparkFrame(out)
