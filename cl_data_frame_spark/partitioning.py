"""Partitioning helpers shared by the operator modules.

These guard the *compute-bound* operators (shingling, fingerprinting,
pairwise similarity) against the small-input pathology where a tiny
parquet file arrives as a single partition and a CPU-heavy expression
then runs on one core. They are deliberate no-ops at scale: a 100 TB
scan already has thousands of splits, so the `< n` test fails and no
extra shuffle is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def default_parallelism(sdf: DataFrame) -> int:
    """The session's target shuffle width (what AQE coalesces down from)."""
    return int(sdf.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def ensure_min_partitions(sdf: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan currently has fewer than *n*
    partitions. One narrow shuffle of the (small) input buys full-width
    parallelism for downstream per-row compute; on a big input this is a
    no-op and costs nothing."""
    if n is None:
        n = default_parallelism(sdf)
    if sdf.rdd.getNumPartitions() < n:
        return sdf.repartition(n)
    return sdf


def zorder_value(cols, bits: int = 16):
    """Morton (Z-order) interleave of already-quantized non-negative int
    columns: bit *i* of column *j* lands at position ``i * k + j``. Pure
    integer expression (shift/and/or), whole-stage codegen'd.

    Sorting or range-partitioning by this value clusters rows that are
    close in EVERY dimension into the same files, so parquet min/max
    stats prune multi-column range predicates — the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER, reproduced here as a plain expression
    (public technique: Morton 1966).
    """
    from pyspark.sql import functions as F

    k = len(cols)
    cs = [F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint")
          for c in cols]
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z
