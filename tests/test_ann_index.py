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


def test_k_id_delete_is_one_commit(spark, tmp_path):
    """Round 11: forgetting k vectors is ONE DV commit (the in-list
    predicate), not k sequential manifest publishes."""
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.sources.snapshots import (
        _latest_version, _read_manifest, snapshot_read)
    idx = str(tmp_path / "idx")
    emb = _emb(spark)
    A.ann_index_build(spark, idx, emb, k=8)
    vd = A.vectors_table_dir(idx)
    v1 = _latest_version(vd)
    ids = [3, 77, 210, 444]
    v2 = A.ann_index_delete(spark, idx, ids)
    assert v2 == v1 + 1                      # exactly one version bump
    m = _read_manifest(vd, v2)
    assert set(m["files"]) == set(
        _read_manifest(vd, v1)["files"])     # zero rewrite, all DV
    assert sum(e["n"] for e in m["dv"].values()) == len(ids)
    left = snapshot_read(spark, vd).spark_df
    assert left.count() == 500 - len(ids)
    assert left.filter(left.vec_id.isin(ids)).count() == 0
    import pytest
    with pytest.raises(ValueError):
        A.ann_index_delete(spark, idx, [])


def test_rebuild_replaces_stale_vectors(spark, tmp_path):
    """Round 11 (advice fix): ann_index_build over an existing index
    must REPLACE the vectors table — appended vectors routed under the
    old model would silently land in wrong cells."""
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.operators.similarity import ivf_search_topk
    from cl_data_frame_spark.sources.snapshots import snapshot_read
    idx = str(tmp_path / "idx")
    emb = _emb(spark)
    A.ann_index_build(spark, idx, emb.filter(F.col("vec_id") < 250),
                      k=4)
    # rebuild on the full corpus with a different k: old routed rows
    # must not survive under stale centroid_ids
    A.ann_index_build(spark, idx, emb, k=8)
    vd = A.vectors_table_dir(idx)
    vecs = snapshot_read(spark, vd).spark_df
    assert vecs.count() == 500               # no duplicated 250
    cents = A.load_centroids(spark, idx)
    assert len(cents) == 8
    # every stored routing agrees with the NEW model bit-for-bit
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 11).collect()[0]["embedding"]]
    got = A.ann_index_query(spark, idx, q, k=5, nprobe=2) \
        .spark_df.collect()
    ref = ivf_search_topk(vecs.select("vec_id", "embedding"), q,
                          cents, k=5, nprobe=2).spark_df.collect()
    assert [(r.vec_id, r.cosine) for r in got] \
        == [(r.vec_id, r.cosine) for r in ref]


def test_recluster_recovers_recall_after_drift(spark, tmp_path):
    """Round 11: centroids are trained once and DRIFT as the corpus
    grows — ann_index_recluster retrains on the current corpus and
    re-routes every vector in one overwrite; recall@k against exact
    brute force recovers, and update/query parity is preserved."""
    import math

    from cl_data_frame_spark.operators import ann_index as A
    from cl_data_frame_spark.operators.similarity import (
        ann_recall_at_k, ivf_search_topk)
    from cl_data_frame_spark.sources.snapshots import snapshot_read

    DIM = 8

    def vec(i, cluster, base):
        # one-hot cluster direction + deterministic hash scatter, so
        # stale-model routing spreads drifted vectors across cells
        v = [0.0] * DIM
        v[base + cluster] = 1.0
        for d in range(DIM):
            v[d] += ((i * 2654435761 + d * 40503) % 97) / 970.0
        return v

    a_rows = [(i, vec(i, i % 4, 0)) for i in range(200)]
    d_rows = [(200 + i, vec(i, i % 4, 4)) for i in range(200)]
    sch = "vec_id bigint, embedding array<double>"
    idx = str(tmp_path / "idx")
    A.ann_index_build(spark, idx, spark.createDataFrame(a_rows, sch),
                      k=4, max_iter=3)
    A.ann_index_update(spark, idx, spark.createDataFrame(d_rows, sch))

    allrows = a_rows + d_rows

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    queries = []
    for c in range(4):       # query each DRIFTED cluster's direction
        q = [0.0] * DIM
        q[4 + c] = 1.0
        queries.append((c, q))

    def mean_recall():
        truth, approx = [], []
        for qid, q in queries:
            exact = sorted(((i, round(cos(q, v), 6))
                            for i, v in allrows),
                           key=lambda t: (-t[1], t[0]))[:10]
            truth += [(qid, i, r + 1)
                      for r, (i, _) in enumerate(exact)]
            got = A.ann_index_query(spark, idx, q, k=10, nprobe=1) \
                .spark_df.collect()
            approx += [(qid, r.vec_id, j + 1)
                       for j, r in enumerate(got)]
        rsch = "q bigint, v bigint, rank bigint"
        out = ann_recall_at_k(
            spark.createDataFrame(truth, rsch),
            spark.createDataFrame(approx, rsch),
            k=10, query_col="q", id_col="v").spark_df.collect()
        return sum(r.recall for r in out) / len(out)

    before = mean_recall()
    assert before < 0.6          # the drifted clusters are scattered
    v = A.ann_index_recluster(spark, idx, k=8, max_iter=4)
    after = mean_recall()
    assert after > before and after >= 0.8
    assert len(A.load_centroids(spark, idx)) == 8
    # parity preserved: persisted query == batch IVF on the new model
    cents = A.load_centroids(spark, idx)
    vecs = snapshot_read(spark, A.vectors_table_dir(idx)).spark_df \
        .select("vec_id", "embedding")
    q = queries[0][1]
    got = A.ann_index_query(spark, idx, q, k=5, nprobe=2) \
        .spark_df.collect()
    ref = ivf_search_topk(vecs, q, cents, k=5, nprobe=2) \
        .spark_df.collect()
    assert [(r.vec_id, r.cosine) for r in got] \
        == [(r.vec_id, r.cosine) for r in ref]
    # and ingest keeps working against the new model
    extra = [(900 + i, vec(1000 + i, i % 4, 4)) for i in range(4)]
    assert A.ann_index_update(
        spark, idx, spark.createDataFrame(extra, sch)) == v + 1
    assert snapshot_read(spark, A.vectors_table_dir(idx)).nrow == 404


def test_drift_statistic_triggers_before_recall_drop(spark,
                                                     tmp_path):
    """Round 14: ann_index_update records a routing-quality drift
    statistic (mean routed cosine vs the model's build-time
    baseline) in the index metadata, and ann_index_health turns it
    into a recluster recommendation — crossing the threshold on the
    SAME drifted corpus whose measured recall drop the recluster
    regression pins, without running any recall evaluation."""
    from cl_data_frame_spark.operators import ann_index as A

    DIM = 8

    def vec(i, cluster, base):
        v = [0.0] * DIM
        v[base + cluster] = 1.0
        for d in range(DIM):
            v[d] += ((i * 2654435761 + d * 40503) % 97) / 970.0
        return v

    sch = "vec_id bigint, embedding array<double>"
    idx = str(tmp_path / "idx")
    a_rows = [(i, vec(i, i % 4, 0)) for i in range(200)]
    A.ann_index_build(spark, idx, spark.createDataFrame(a_rows, sch),
                      k=4, max_iter=3)
    h0 = A.ann_index_health(spark, idx)
    assert h0["baseline_mean_sim"] is not None
    assert h0["ingested_n"] == 0
    assert h0["drift_ratio"] is None
    assert h0["recluster_recommended"] is False
    # ON-distribution ingest: ratio stays ~1, no recommendation
    on_rows = [(500 + i, vec(777 + i, i % 4, 0)) for i in range(50)]
    A.ann_index_update(spark, idx,
                       spark.createDataFrame(on_rows, sch))
    h1 = A.ann_index_health(spark, idx)
    assert h1["ingested_n"] == 50
    assert h1["drift_ratio"] is not None
    assert h1["drift_ratio"] > 0.97
    assert h1["recluster_recommended"] is False
    # DRIFTED ingest (the recall-regression corpus): new clusters on
    # dims 4-7 land far from every stale centroid — the statistic
    # crosses the threshold, recommending recluster BEFORE anyone
    # measures the recall drop
    d_rows = [(200 + i, vec(i, i % 4, 4)) for i in range(200)]
    A.ann_index_update(spark, idx,
                       spark.createDataFrame(d_rows, sch))
    h2 = A.ann_index_health(spark, idx)
    assert h2["ingested_n"] == 250
    assert h2["drift_ratio"] < h1["drift_ratio"]
    assert h2["recluster_recommended"] is True
    # recluster resets the baseline against the retrained model
    A.ann_index_recluster(spark, idx, k=8, max_iter=4)
    h3 = A.ann_index_health(spark, idx)
    assert h3["ingested_n"] == 0
    assert h3["drift_ratio"] is None
    assert h3["recluster_recommended"] is False
    # replayed txn batches are swallowed WITHOUT polluting the stats
    A.ann_index_update(spark, idx,
                       spark.createDataFrame(on_rows, sch),
                       txn=("ing", 1))
    n_after = A.ann_index_health(spark, idx)["ingested_n"]
    A.ann_index_update(spark, idx,
                       spark.createDataFrame(on_rows, sch),
                       txn=("ing", 1))      # replay: swallowed
    assert A.ann_index_health(spark, idx)["ingested_n"] == n_after
