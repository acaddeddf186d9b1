"""Mergeable sketch operators: KLL quantiles, theta distinct, exact
grouped frequent items (heavy hitters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def vals(spark):
    rows = [(g, v) for g in ("a", "b") for v in range(1, 101)]
    return spark.createDataFrame(rows, ["g", "v"]).withColumn(
        "v", F.col("v").cast("double"))


def test_kll_exact_range_matches_discrete_quantiles(vals):
    out = {r["g"]: r for r in
           SK.kll_quantiles(vals, "v", [0.25, 0.5, 0.75],
                            ["g"], k=8000).spark_df.collect()}
    assert out["a"]["q25"] == 25.0
    assert out["a"]["q50"] == 50.0
    assert out["a"]["q75"] == 75.0


def test_kll_rollup_equals_direct_sketch(vals, spark):
    sharded = vals.withColumn("shard", (F.col("v") % 4).cast("int"))
    per_shard = SK.kll_quantiles(sharded, "v", [0.5], ["g", "shard"],
                                 k=8000)
    rolled = SK.kll_rollup(per_shard.spark_df, [0.5], ["g"])
    direct = SK.kll_quantiles(vals, "v", [0.5], ["g"], k=8000)
    got = {r["g"]: r["q50"] for r in rolled.spark_df.collect()}
    want = {r["g"]: r["q50"] for r in direct.spark_df.collect()}
    assert got == want


def test_theta_exact_at_low_cardinality(vals):
    out = {r["g"]: r["estimate"] for r in
           SK.theta_distinct(vals, "v", ["g"]).spark_df.collect()}
    assert out == {"a": 100, "b": 100}


def test_frequent_items_exact_with_tiebreak(spark):
    rows = ([("x",)] * 5 + [("y",)] * 5 + [("z",)] * 3 + [("w",)] * 1)
    df = spark.createDataFrame(rows, ["k"])
    out = [(r["k"], r["cnt"], r["rank"]) for r in
           SK.frequent_items(df, "k", k=3).spark_df
           .orderBy("rank").collect()]
    # tie between x and y broken by value asc
    assert out == [("x", 5, 1), ("y", 5, 2), ("z", 3, 3)]


def test_frequent_items_candidate_prefilter_keeps_heavy_hitters(spark):
    # 4 partitions, one dominant key: the prefiltered variant must agree
    # with the exact one on the true heavy hitters
    rows = [("hot",)] * 400 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    exact = SK.frequent_items(df, "k", k=1).spark_df.collect()
    approx = SK.frequent_items(df, "k", k=1,
                               candidate_limit=8).spark_df.collect()
    assert [(r["k"], r["cnt"]) for r in exact] == \
        [(r["k"], r["cnt"]) for r in approx] == [("hot", 400)]


def test_theta_set_ops_exact_in_range(spark):
    from cl_data_frame_spark.operators import sketch as SK
    rows = ([("a", v) for v in range(40)]            # A = 0..39
            + [("b", v) for v in range(20, 70)])     # B = 20..69
    df = spark.createDataFrame(rows, ["part", "v"])
    r = SK.theta_set_ops(df, "v", "part", "a", "b").spark_df.collect()[0]
    assert (r["n_a"], r["n_b"]) == (40, 50)
    assert r["n_union"] == 70
    assert r["n_intersect"] == 20
    assert r["n_diff"] == 20      # A minus B = 0..19


def test_theta_set_ops_disjoint_and_empty_slice(spark):
    from cl_data_frame_spark.operators import sketch as SK
    rows = [("a", 1), ("a", 2), ("b", 9)]
    df = spark.createDataFrame(rows, ["part", "v"])
    r = SK.theta_set_ops(df, "v", "part", "a", "b").spark_df.collect()[0]
    assert r["n_intersect"] == 0 and r["n_union"] == 3
    r2 = SK.theta_set_ops(df, "v", "part", "a", "zzz") \
        .spark_df.collect()[0]
    assert r2["n_b"] == 0 and r2["n_union"] == 2 and r2["n_diff"] == 2


def test_ann_join_topk_lsh_and_recall(spark):
    """Multi-probe LSH join: exact-equality equi-join on exploded probe
    buckets, recall measured against the brute-force truth; full probe
    space (hamming <= n_planes) degenerates to exact recall = 1."""
    import random
    from cl_data_frame_spark.operators.similarity import (
        ann_join_topk_lsh, ann_recall_at_k, similarity_join_topk)
    rng = random.Random(13)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") < 10)
    truth = similarity_join_topk(q, df, k=3)
    # full probe space: every bucket probed -> identical to exact
    full = ann_join_topk_lsh(q, df, k=3, n_planes=4, max_hamming=4)
    rec_full = ann_recall_at_k(truth, full, k=3).spark_df.collect()
    assert all(r["recall"] == 1.0 for r in rec_full)
    assert all(r["n_truth"] == 3 for r in rec_full)
    # restricted probes: recall in [0, 1], deterministic across runs
    part = ann_join_topk_lsh(q, df, k=3, n_planes=6, max_hamming=1)
    r1 = sorted((r["id_l"], r["recall"]) for r in
                ann_recall_at_k(truth, part, k=3).spark_df.collect())
    r2 = sorted((r["id_l"], r["recall"]) for r in
                ann_recall_at_k(truth, part, k=3).spark_df.collect())
    assert r1 == r2
    assert all(0.0 <= rec <= 1.0 for _, rec in r1)


class TestSketchStateTable:
    """Snapshot-backed incremental HLL state: batch merges never
    rescan history; the final state equals the one-shot aggregate."""

    def test_incremental_equals_oneshot(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F
        from cl_data_frame_spark.operators import sketch as SK
        from cl_data_frame_spark.sources.snapshots import (
            snapshot_history, snapshot_read)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t = str(tmp_path / "state")
        for i in range(3):                       # three ingest batches
            SK.sketch_state_update(
                spark, t, docs.filter(F.col("doc_id") % 3 == i),
                "doc_id", ["lang"])
        got = {r["lang"]: r["estimate"] for r in
               snapshot_read(spark, t).spark_df.collect()}
        oneshot = {r["lang"]: r["estimate"] for r in
                   SK.hll_sketch(docs, "doc_id", ["lang"])
                   .spark_df.collect()}
        assert got == oneshot                    # merged == one-shot
        exact = {r["lang"]: r["n"] for r in
                 docs.groupBy("lang")
                 .agg(F.countDistinct("doc_id").alias("n")).collect()}
        for lang, est in got.items():
            assert abs(est - exact[lang]) <= max(2, 0.05 * exact[lang])
        # one version per update, each a k-sized overwrite
        assert [h["version"] for h in snapshot_history(t)] == [1, 2, 3]

    def test_stream_sink_swallows_replay(self, spark, sf_dir,
                                         tmp_path):
        from pyspark.sql import functions as F
        from cl_data_frame_spark.operators import sketch as SK
        from cl_data_frame_spark.sources.snapshots import (
            snapshot_history, snapshot_read)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "lang")
        t = str(tmp_path / "state")
        sink = SK.sketch_state_stream_sink(t, "doc_id", ["lang"],
                                           app_id="t_sketch")
        sink(docs.filter(F.col("doc_id") % 2 == 0), 0)
        sink(docs.filter(F.col("doc_id") % 2 == 1), 1)
        before = sorted((r["lang"], r["estimate"]) for r in
                        snapshot_read(spark, t).spark_df.collect())
        sink(docs.filter(F.col("doc_id") % 2 == 1), 1)   # crash replay
        after = sorted((r["lang"], r["estimate"]) for r in
                       snapshot_read(spark, t).spark_df.collect())
        assert after == before
        assert len(snapshot_history(t)) == 2     # no third commit


class TestKllStateTable:
    """Snapshot-backed incremental KLL quantile state."""

    def test_incremental_quantiles_track_exact(self, spark, sf_dir,
                                               tmp_path):
        from pyspark.sql import functions as F
        from cl_data_frame_spark.operators import sketch as SK
        from cl_data_frame_spark.sources.snapshots import (
            snapshot_history, snapshot_read)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
            .select("l_returnflag", "l_quantity")
        t = str(tmp_path / "state")
        for i in range(3):
            SK.kll_state_update(
                spark, t,
                li.filter(F.col("l_quantity") % 3 == i),
                "l_quantity", ["l_returnflag"], k=200)
        got = {r["l_returnflag"]: r for r in
               snapshot_read(spark, t).spark_df.collect()}
        exact = {r["l_returnflag"]: r for r in
                 li.groupBy("l_returnflag")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.expr("percentile(l_quantity, 0.5)").alias("p50"),
                      F.expr("percentile(l_quantity, 0.9)").alias("p90"))
                 .collect()}
        for flag, e in exact.items():
            g = got[flag]
            assert g["n"] == e["n"]          # counts merge exactly
            # KLL rank error ~1.65/sqrt(200) ~ 12 ranks of 1..50
            assert abs(g["q_50"] - e["p50"]) <= 6
            assert abs(g["q_90"] - e["p90"]) <= 6
        assert len(snapshot_history(t)) == 3

    def test_unkeyed_and_new_group_entry(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from cl_data_frame_spark.operators import sketch as SK
        from cl_data_frame_spark.sources.snapshots import snapshot_read
        t = str(tmp_path / "state")
        d1 = spark.range(100).select(F.lit("a").alias("g"),
                                     F.col("id").cast("double")
                                     .alias("x"))
        SK.kll_state_update(spark, t, d1, "x", ["g"], k=400)
        # a second batch introduces a NEW group; 'a' persists untouched
        d2 = spark.range(50).select(F.lit("b").alias("g"),
                                    (F.col("id") + 1000).cast("double")
                                    .alias("x"))
        SK.kll_state_update(spark, t, d2, "x", ["g"], k=400)
        got = {r["g"]: r for r in
               snapshot_read(spark, t).spark_df.collect()}
        assert got["a"]["n"] == 100 and got["b"]["n"] == 50
        # k=400 > n: the sketch is in its exact range
        assert got["a"]["q_50"] in (49.0, 50.0)
        assert got["b"]["q_50"] in (1024.0, 1025.0)
        # unkeyed twin
        t2 = str(tmp_path / "state2")
        SK.kll_state_update(spark, t2, d1, "x", k=400)
        row = snapshot_read(spark, t2).spark_df.collect()[0]
        assert row["n"] == 100 and row["q_50"] in (49.0, 50.0)


def test_kll_state_unkeyed_second_update(spark, tmp_path):
    # regression: the stored unkeyed state drops the synthetic group
    # key, so the SECOND update must reconstruct it before merging
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators import sketch as SK
    from cl_data_frame_spark.sources.snapshots import snapshot_read
    t = str(tmp_path / "state")
    d1 = spark.range(100).select(F.col("id").cast("double").alias("x"))
    d2 = spark.range(100, 200).select(F.col("id").cast("double")
                                      .alias("x"))
    SK.kll_state_update(spark, t, d1, "x", k=400)
    SK.kll_state_update(spark, t, d2, "x", k=400)
    row = snapshot_read(spark, t).spark_df.collect()[0]
    assert row["n"] == 200
    assert row["q_50"] in (99.0, 100.0)   # exact range at k=400
