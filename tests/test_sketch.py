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
