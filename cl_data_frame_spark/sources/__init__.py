"""Sources & sinks (SURVEY.md §2.2 'Scans/sources/sinks' — absent in the
reference, whose only sources are in-memory constructors).

Batch: parquet/csv/json/orc via ``spark.read``/``df.write`` — Catalyst pushes
filters and prunes columns into these scans. Streaming: see
``cl_data_frame_spark.streaming``.

Scale notes: readers keep Spark's splittable-file parallelism (one task per
``spark.sql.files.maxPartitionBytes`` chunk); writers accept
``partition_by`` so downstream reads get partition pruning, and sort within
partitions for better parquet row-group statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..frame import ROW_ID, SparkFrame


def read_parquet(spark: SparkSession, path: str, columns=None,
                 merge_schema: bool = False) -> SparkFrame:
    """Parquet scan -> SparkFrame; column list prunes at the reader.

    ``merge_schema=True`` reconciles evolving schemas across files
    (columns added over time surface as NULL in older files) — the
    standard additive-evolution read path; it costs a footer scan per
    file, so leave it off for fixed-schema datasets."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    sdf = reader.parquet(path)
    if columns:
        sdf = sdf.select(*columns)
    return SparkFrame(sdf)


def read_csv(spark: SparkSession, path: str, header: bool = True,
             schema=None, infer_schema: bool = True) -> SparkFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return SparkFrame(reader.csv(path))


def read_json(spark: SparkSession, path: str, schema=None) -> SparkFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return SparkFrame(reader.json(path))


def read_orc(spark: SparkSession, path: str) -> SparkFrame:
    return SparkFrame(spark.read.orc(path))


def _plain(frame_or_df) -> DataFrame:
    if isinstance(frame_or_df, SparkFrame):
        return frame_or_df.spark_df
    return frame_or_df.drop(ROW_ID) if ROW_ID in frame_or_df.columns else frame_or_df


def write_parquet(frame, path: str, mode: str = "overwrite",
                  partition_by=None) -> None:
    """Parquet sink; ``partition_by`` enables partition pruning downstream."""
    writer = _plain(frame).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(frame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    _plain(frame).write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(frame, path: str, mode: str = "overwrite") -> None:
    _plain(frame).write.mode(mode).json(path)


def write_orc(frame, path: str, mode: str = "overwrite") -> None:
    _plain(frame).write.mode(mode).orc(path)


def write_bucketed(frame, table: str, bucket_by, n_buckets: int = 32,
                   sort_by=None, mode: str = "overwrite",
                   fmt: str = "parquet") -> None:
    """Bucketed managed table: pre-shuffles once at write time so every
    later equi-join / aggregation on ``bucket_by`` runs SHUFFLE-FREE.

    This is the canonical 100 TB co-location strategy: pay the shuffle
    once when landing the table, then every fact-fact join on the bucket
    key is a local zip of matching buckets (SortMergeJoin with no
    Exchange on either side — see tests/test_sources.py plan assertion).
    ``sort_by`` additionally pre-sorts within buckets, dropping the sort
    from the join too.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = (_plain(frame).write.mode(mode).format(fmt)
              .bucketBy(n_buckets, *cols))
    if sort_by:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> SparkFrame:
    """Managed/bucketed table scan (bucket metadata feeds the planner)."""
    return SparkFrame(spark.table(table))


def read_text(spark: SparkSession, path: str,
              whole_file: bool = False) -> SparkFrame:
    """Line-per-row text scan (``value`` column); ``whole_file=True``
    yields one row per file (document-per-file corpora)."""
    return SparkFrame(spark.read.text(path, wholetext=whole_file))


def read_binary(spark: SparkSession, path: str,
                glob: str | None = None) -> SparkFrame:
    """Binary-file scan for multimodal payloads: one row per file with
    (path, modificationTime, length, content BINARY) — the ingestion
    side of ``operators.multimodal`` (content-hash dedup, mapInPandas
    feature extraction over ``content``).

    Scale: the source parallelizes by file; pair with
    ``spark.sql.files.maxPartitionBytes``-sized media shards or many
    files per directory — one giant file is one task.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return SparkFrame(reader.load(path))


def curve_column(frame, zorder_by, bits: int = 16,
                 curve: str = "zorder"):
    """The space-filling-curve index over *zorder_by* as a Column:
    each column min-max quantized to *bits* bits (one tiny agg
    collects the bounds), then Morton-interleaved (or Hilbert for
    exactly 2 columns). The building block ``write_parquet_zordered``
    sorts on — exposed so other writers (e.g. the partition-
    preserving OPTIMIZE) can cluster WITHIN their own layout."""
    from pyspark.sql import functions as F

    from ..partitioning import hilbert_value, zorder_value

    sdf = _plain(frame)
    cols = [zorder_by] if isinstance(zorder_by, str) \
        else list(zorder_by)
    bounds = sdf.agg(*[f(c).alias(f"{n}_{c}") for c in cols
                       for n, f in (("mn", F.min),
                                    ("mx", F.max))]).collect()[0]

    def _num(v):
        return v.timestamp() if hasattr(v, "timestamp") else float(v)

    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None:
            scaled.append(F.lit(0).cast("bigint"))
            continue
        mn_d, mx_d = _num(mn), _num(mx)
        span = (mx_d - mn_d) or 1.0
        q = F.floor((F.col(c).cast("double") - F.lit(mn_d))
                    * F.lit(top / span)).cast("bigint")
        scaled.append(F.least(F.lit(top).cast("bigint"),
                              F.greatest(F.lit(0).cast("bigint"),
                                         q)))
    if curve == "hilbert":
        if len(scaled) != 2:
            raise ValueError(
                "curve='hilbert' requires exactly 2 columns")
        return hilbert_value(scaled[0], scaled[1], bits=bits)
    if curve == "zorder":
        return zorder_value(scaled, bits=bits)
    raise ValueError(f"curve must be 'zorder' or 'hilbert', "
                     f"got {curve!r}")


def write_parquet_zordered(frame, path: str, zorder_by, bits: int = 16,
                           num_files: int | None = None,
                           mode: str = "overwrite",
                           curve: str = "zorder") -> None:
    """Write parquet with a space-filling-curve layout over *zorder_by*
    columns.

    Each column is min-max quantized to *bits* bits (one tiny agg
    collects the bounds), the curve index is computed as a plain
    integer expression, and ``repartitionByRange`` over it assigns
    curve-contiguous blocks to files — so parquet footer min/max stats
    prune files for range predicates on ANY of the layout columns, not
    just the leading sort key. ``num_files`` defaults to the session's
    shuffle width.

    ``curve='zorder'`` (default, any #columns) is the Morton
    interleave; ``curve='hilbert'`` (exactly 2 columns) trades ~4× the
    expression nodes for measurably tighter per-file boxes (no Morton
    diagonal jumps) — prefer it for hot 2-D layouts.
    """
    from ..partitioning import default_parallelism

    sdf = _plain(frame)
    # the scale-in-DOUBLE-before-flooring quantization (and its
    # overflow/NULL notes) lives in curve_column
    idx = curve_column(sdf, zorder_by, bits=bits, curve=curve)
    n = num_files or default_parallelism(sdf)
    (sdf.withColumn("__z__", idx)
     .repartitionByRange(n, "__z__")
     .sortWithinPartitions("__z__")
     .drop("__z__")
     .write.mode(mode).parquet(path))


def write_parquet_partitioned(frame, path: str, partition_by,
                              mode: str = "overwrite",
                              dynamic: bool = False,
                              files_per_partition: int = 1) -> None:
    """Hive-style partitioned parquet write (``path/col=value/...``)
    with optional DYNAMIC partition overwrite — the incremental-
    pipeline pattern: re-running a day's job replaces ONLY the
    partitions present in the incoming frame, never truncating the
    rest of the table (static overwrite would).

    ``files_per_partition`` repartitions by the partition columns
    first so each partition directory gets a bounded file count
    instead of one file per incoming task — the small-file guard at
    write time (``compact_parquet`` is the after-the-fact repair).

    Scale: partition columns become directory pruning at read time
    (``PartitionFilters`` in the scan — zero I/O for excluded
    partitions, stronger than footer min/max skipping); choose
    low-cardinality columns (date, region, source) — a high-
    cardinality partition column IS the small-file problem.
    """
    from pyspark.sql import functions as F

    sdf = _plain(frame)
    cols = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    spark = sdf.sparkSession
    writer = sdf
    if files_per_partition:
        k = int(files_per_partition)
        if k == 1:
            # hash by the partition columns: each value co-locates in
            # ONE task (one file per directory), values run in parallel
            writer = sdf.repartition(*[F.col(c) for c in cols])
        else:
            # deterministic sub-salt spreads a hot partition value over
            # exactly k tasks/files
            others = [c for c in sdf.columns if c not in cols] or cols
            salt = F.pmod(F.xxhash64(*[F.col(c) for c in others]),
                          F.lit(k))
            writer = (sdf.withColumn("__fsalt__", salt)
                      .repartition(*([F.col(c) for c in cols]
                                     + [F.col("__fsalt__")]))
                      .drop("__fsalt__"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "STATIC")
    try:
        if dynamic:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           "dynamic")
        (writer.write.mode(mode).partitionBy(*cols).parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(spark: SparkSession, src_path: str, dst_path: str,
                    target_file_mb: int = 128,
                    sort_within_by=None) -> int:
    """Compact a small-file parquet directory into ~*target_file_mb*
    files; returns the output file count.

    The small-file problem is the classic large-pipeline failure mode
    (every file costs a task + footer read + catalog entry); streaming
    sinks and fine-grained upserts produce thousands of them. Sizing
    comes from the actual on-disk bytes (Hadoop FS API, no data read);
    the rewrite is one narrow ``coalesce`` when shrinking — no shuffle —
    and ``sort_within_by`` optionally restores per-file clustering so
    min/max pruning survives compaction.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    size = fs.getContentSummary(path).getLength()
    n = max(1, int(size / (target_file_mb * 1024 * 1024)) + (
        1 if size % (target_file_mb * 1024 * 1024) else 0))
    df = spark.read.parquet(src_path)
    out = df.coalesce(n)
    if sort_within_by:
        cols = ([sort_within_by] if isinstance(sort_within_by, str)
                else list(sort_within_by))
        out = out.sortWithinPartitions(*cols)
    out.write.mode("overwrite").parquet(dst_path)
    return n
