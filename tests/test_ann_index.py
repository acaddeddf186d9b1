"""Persisted IVF/ANN index (round 10): centroids + routed vectors as
snapshot tables, incremental ingest, metadata-exact cell pruning."""

import os

import pytest
from pyspark.sql import functions as F


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from cl_data_frame_spark.operators import ann_index as A
    idx = str(tmp_path_factory.mktemp("ann") / "idx")
    emb = _emb(spark)
    A.ann_index_build(spark, idx, emb.filter(F.col("vec_id") < 400),
                      k=8)
    A.ann_index_update(
        spark, idx,
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)))
    A.ann_index_update(spark, idx,
                       emb.filter(F.col("vec_id") >= 450),
                       txn=("ann_app", 1))
    return idx


def test_query_matches_batch_ivf_bit_for_bit(spark, index):
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.operators.similarity import ivf_search_topk
    from cl_data_frame_spark.sources.snapshots import snapshot_read
    emb = _emb(spark)
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
    got = A.ann_index_query(spark, index, q, k=5, nprobe=2) \
        .spark_df.collect()
    cents = A.load_centroids(spark, index)
    allvecs = snapshot_read(spark, A.vectors_table_dir(index)) \
        .spark_df.select("vec_id", "embedding")
    assert allvecs.count() == 500       # all three batches landed
    ref = ivf_search_topk(allvecs, q, cents, k=5, nprobe=2) \
        .spark_df.collect()
    assert [(r.vec_id, r.cosine) for r in got] \
        == [(r.vec_id, r.cosine) for r in ref]
    assert got[0].vec_id == 7 and got[0].cosine == 1.0


def test_query_scans_only_probed_cells(spark, index):
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.sources.snapshots import snapshot_scan_files
    vd = A.vectors_table_dir(index)
    cents = A.load_centroids(spark, index)
    n_all = len(snapshot_scan_files(vd))
    per_cell = [len(snapshot_scan_files(
        vd, where=[("centroid_id", "==", cid)])) for cid, _ in cents]
    # the partition tuple makes each cell's file listing exact: all
    # cells' listings sum to the table, and each is a strict subset
    assert sum(per_cell) == n_all
    assert all(0 < n < n_all for n in per_cell)


def test_replayed_txn_batch_swallowed(spark, index):
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.sources.snapshots import snapshot_read
    emb = _emb(spark)
    pre = snapshot_read(spark, A.vectors_table_dir(index)).nrow
    v = A.ann_index_update(spark, index,
                           emb.filter(F.col("vec_id") >= 450),
                           txn=("ann_app", 1))     # replay
    assert v == -1
    assert snapshot_read(spark, A.vectors_table_dir(index)).nrow == pre


def test_incremental_batches_never_rescan_history(spark, index,
                                                  tmp_path):
    # the routing pass reads ONLY the batch: updating a 10-row batch
    # against the 500-vector index scans no vectors-table file (proxy:
    # snapshot of the vectors table taken before/after shows only an
    # append of the new rows; file set strictly grows, nothing
    # rewritten)
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.sources.snapshots import (
        _latest_version, _read_manifest)
    emb = _emb(spark)
    vd = A.vectors_table_dir(index)
    pre = _read_manifest(vd, _latest_version(vd))["files"]
    A.ann_index_update(
        spark, index,
        emb.filter(F.col("vec_id") < 10)
        .select((F.col("vec_id") + 10_000).alias("vec_id"),
                "embedding"))
    post = _read_manifest(vd, _latest_version(vd))["files"]
    assert set(pre) <= set(post) and len(post) > len(pre)


def test_ann_index_delete_is_dv_backed(spark, tmp_path):
    """GDPR path: forgetting a vector leaves every data file untouched
    (deletion vector) and removes it from query results."""
    import os
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.sources.snapshots import (
        _latest_version, _read_manifest, snapshot_read)
    idx = str(tmp_path / "idx")
    emb = _emb(spark)
    A.ann_index_build(spark, idx, emb, k=8)
    vd = A.vectors_table_dir(idx)
    m1 = _read_manifest(vd, _latest_version(vd))
    inodes = {f: os.stat(os.path.join(vd, f)).st_ino
              for f in m1["files"]}
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    top = A.ann_index_query(spark, idx, q, k=1, nprobe=8) \
        .spark_df.collect()
    assert top[0].vec_id == 3
    A.ann_index_delete(spark, idx, [3])
    m2 = _read_manifest(vd, _latest_version(vd))
    assert set(m2["files"]) == set(m1["files"])   # zero rewrite
    for f in m1["files"]:
        assert os.stat(os.path.join(vd, f)).st_ino == inodes[f]
    assert m2.get("dv")
    assert snapshot_read(spark, vd).nrow == 499
    top = A.ann_index_query(spark, idx, q, k=1, nprobe=8) \
        .spark_df.collect()
    assert top[0].vec_id != 3
