"""Round 14: VIEW EVOLUTION — ``matview_evolve`` adds measure /
distinct / approx-distinct / quantile columns to a LIVE materialized
view by backfilling their per-group state from the base pinned at the
view's applied watermark (one overwrite carrying the watermarks), so
"add p95 latency to the dashboard" never rebuilds the counts the view
already maintains. Old and new columns then refresh together."""

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.matview import (
    matview_create, matview_create_join, matview_evolve,
    matview_read, matview_refresh)
from cl_data_frame_spark.sources.snapshots import (
    snapshot_delete, snapshot_read, snapshot_write)


def _seed(spark, src):
    rows = [(i, f"g{i % 3}", float(i), float(i * i % 7))
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "id int, grp string, a double, b double")
    snapshot_write(SparkFrame(df), src, mode="overwrite",
                   stats_cols=["id", "grp"])


def _expected(spark, src):
    base = snapshot_read(spark, src).spark_df
    return {r["grp"]: (r["cnt"], r["sa"], r["mb"], r["cb"]) for r in
            base.groupBy("grp").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("a").cast("decimal(28,6)"))
                .cast("decimal(38,6)").alias("sa"),
                F.min("b").alias("mb"),
                F.countDistinct("b").alias("cb")).collect()}


def _got(spark, view):
    return {r["grp"]: (r["cnt"], r["sum_a"], r["min_b"],
                       r["cntd_b"]) for r in
            matview_read(spark, view).spark_df.collect()}


class TestEvolveSingleSource:
    def test_add_measure_and_distinct_then_refresh(self, spark,
                                                   tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "mv")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a"])
        # DML BEFORE the evolve: the backfill pins the APPLIED version
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(100, "g0", 50.0, 9.0)],
            "id int, grp string, a double, b double")),
            src, mode="append")
        matview_refresh(spark, view)
        out = matview_evolve(spark, view,
                             add_measure_cols=["b"],
                             add_distinct_cols=["b"])
        assert out["added"] == ["b", "b"]
        assert _got(spark, view) == _expected(spark, src)
        # refresh maintains old AND new columns together: append +
        # a delete removing a stored b-minimum and a last occurrence
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(200, "g1", -5.0, -1.0)],
            "id int, grp string, a double, b double")),
            src, mode="append")
        snapshot_delete(spark, src, [("id", "==", 0)])
        matview_refresh(spark, view)
        assert _got(spark, view) == _expected(spark, src)

    def test_add_quantile_col(self, spark, tmp_path):
        src, view = str(tmp_path / "srcq"), str(tmp_path / "mvq")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a"])
        matview_evolve(spark, view, add_quantile_cols=["a"])
        got = {r["grp"]: r["q50_a"] for r in
               matview_read(spark, view).spark_df.collect()}
        base = snapshot_read(spark, src).spark_df
        vals = {}
        for r in base.collect():
            vals.setdefault(r["grp"], []).append(r["a"])
        for g, vs in vals.items():
            assert got[g] in vs      # exact regime: a retained value
        # and it keeps maintaining
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(300, "g2", 99.0, 1.0)],
            "id int, grp string, a double, b double")),
            src, mode="append")
        matview_refresh(spark, view)
        got2 = {r["grp"]: r["q50_a"] for r in
                matview_read(spark, view).spark_df.collect()}
        assert set(got2) == set(got)

    def test_rejects_duplicates_and_keys(self, spark, tmp_path):
        src, view = str(tmp_path / "srcd"), str(tmp_path / "mvd")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a"])
        with pytest.raises(ValueError, match="already"):
            matview_evolve(spark, view, add_measure_cols=["a"])
        with pytest.raises(ValueError, match="already"):
            matview_evolve(spark, view, add_distinct_cols=["grp"])
        with pytest.raises(ValueError, match="nothing"):
            matview_evolve(spark, view)

    def test_tombstones_keep_tombstone_shape(self, spark, tmp_path):
        src, view = str(tmp_path / "srct"), str(tmp_path / "mvt")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a"])
        # erase one whole group -> cnt=0 tombstone in storage
        snapshot_delete(spark, src, [("grp", "==", "g2")])
        matview_refresh(spark, view)
        matview_evolve(spark, view, add_measure_cols=["b"])
        stored = snapshot_read(spark, view).spark_df
        tomb = stored.where(F.col("cnt") == 0).collect()
        assert tomb and all(r["sum_b"] is not None
                            and float(r["sum_b"]) == 0.0
                            and r["nn_b"] == 0
                            and r["min_b"] is None for r in tomb)
        # a resurrecting insert reuses the evolved tombstone
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(400, "g2", 1.0, 2.0)],
            "id int, grp string, a double, b double")),
            src, mode="append")
        matview_refresh(spark, view)
        row = {r["grp"]: r for r in
               matview_read(spark, view).spark_df.collect()}["g2"]
        assert row["cnt"] == 1 and row["min_b"] == 2.0


class TestDropMeasures:
    def test_drop_then_refresh_maintains_rest(self, spark, tmp_path):
        import os
        from cl_data_frame_spark.operators.matview import (
            _dstate_dir, matview_drop_measures)
        src, view = str(tmp_path / "srcdr"), str(tmp_path / "mvdr")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a", "b"],
                       distinct_cols=["b"])
        out = matview_drop_measures(spark, view, measure_cols=["b"],
                                    distinct_cols=["b"])
        assert set(out["dropped_columns"]) == {
            "sum_b", "nn_b", "min_b", "max_b", "cntd_b", "sumd_b"}
        assert not os.path.exists(_dstate_dir(view, "b"))
        cols = set(matview_read(spark, view).spark_df.columns)
        assert "sum_b" not in cols and "cntd_b" not in cols
        assert "sum_a" in cols
        # refresh keeps maintaining what remains
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(500, "g0", 8.0, 1.0)],
            "id int, grp string, a double, b double")),
            src, mode="append")
        snapshot_delete(spark, src, [("id", "==", 1)])
        matview_refresh(spark, view)
        base = snapshot_read(spark, src).spark_df
        exp = {r["grp"]: (r["cnt"], r["mn"]) for r in
               base.groupBy("grp").agg(
                   F.count(F.lit(1)).alias("cnt"),
                   F.min("a").alias("mn")).collect()}
        got = {r["grp"]: (r["cnt"], r["min_a"]) for r in
               matview_read(spark, view).spark_df.collect()}
        assert got == exp

    def test_unknown_and_empty_rejected(self, spark, tmp_path):
        from cl_data_frame_spark.operators.matview import (
            matview_drop_measures)
        src, view = str(tmp_path / "srcdx"), str(tmp_path / "mvdx")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["a"])
        with pytest.raises(ValueError, match="nothing"):
            matview_drop_measures(spark, view)
        with pytest.raises(KeyError):
            matview_drop_measures(spark, view, measure_cols=["zz"])
        with pytest.raises(KeyError):
            # right column, wrong family
            matview_drop_measures(spark, view, distinct_cols=["a"])


class TestEvolveJoinView:
    def test_add_dim_side_measure(self, spark, tmp_path):
        fact = str(tmp_path / "fact")
        dim = str(tmp_path / "dim")
        view = str(tmp_path / "mvj")
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(24)],
            "id int, fk int, val double")), fact,
            mode="overwrite", stats_cols=["id", "fk"])
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(k, f"c{k % 2}", float(k * 10)) for k in range(3)],
            "fk int, cat string, w double")), dim,
            mode="overwrite", stats_cols=["fk"])
        matview_create_join(spark, fact, dim, view, on="fk",
                            keys="cat", measure_cols=["val"])
        # evolve with a DIM-side measure: ownership attributed and
        # recorded so the telescoped change terms carry it
        matview_evolve(spark, view, add_measure_cols=["w"])

        def expected():
            f = snapshot_read(spark, fact).spark_df
            d = snapshot_read(spark, dim).spark_df
            j = f.join(d, on="fk", how="inner")
            return {r["cat"]: (r["cnt"], r["sv"], r["sw"]) for r in
                    j.groupBy("cat").agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.sum(F.col("val").cast("decimal(28,6)"))
                        .cast("decimal(38,6)").alias("sv"),
                        F.sum(F.col("w").cast("decimal(28,6)"))
                        .cast("decimal(38,6)").alias("sw")).collect()}

        def got():
            return {r["cat"]: (r["cnt"], r["sum_val"], r["sum_w"])
                    for r in matview_read(spark, view).spark_df
                    .collect()}

        assert got() == expected()
        # DML on BOTH sides, one refresh maintains old + new measures
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(50, 1, 7.0)], "id int, fk int, val double")),
            fact, mode="append")
        from cl_data_frame_spark.sources.snapshots import \
            snapshot_update
        snapshot_update(spark, dim, [("fk", "==", 0)],
                        {"w": "123.0"})
        matview_refresh(spark, view)
        assert got() == expected()
