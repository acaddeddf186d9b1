"""Round 14: matview-refresh key-set broadcast GATE and the quiet
distinct-column watermark advance.

The refresh's touched-group / repair-group / per-value-state key sets
are normally tiny and broadcast; a catch-up chunk over a
high-cardinality group key can legally touch tens of millions of
groups, and an unconditional hint would force-broadcast a multi-GB
key set — the exact cliff the round-13 deletion-vector gate closed on
the read side (snapshots._DV_BROADCAST_MAX). ``_maybe_broadcast``
withholds the hint above ``_KEY_BROADCAST_MAX`` and lets AQE pick the
strategy; results must be identical either way.

A distinct column with NO changes in a refresh interval used to leave
its state watermark pinned (every later refresh re-walked a growing
empty interval); it now advances via a metadata-only
``snapshot_set_txn`` commit.
"""

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators import matview as M
from cl_data_frame_spark.operators.matview import (
    _APP_ID, _dstate_dir, matview_create, matview_read,
    matview_refresh)
from cl_data_frame_spark.sources.snapshots import (
    snapshot_delete, snapshot_read, snapshot_txn_version,
    snapshot_write)


def _seed(spark, src):
    rows = [(i, f"g{i % 5}", float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, grp string, val double")
    snapshot_write(SparkFrame(df), src, mode="overwrite",
                   stats_cols=["id", "grp"])


def _dml(spark, src):
    # an insert batch AND a delete that removes g0's stored minimum
    # (id=0, val=0.0) so the REPAIR path (repair_keys join) runs too
    extra = spark.createDataFrame(
        [(100, "g1", 50.0), (101, "g4", None)],
        "id int, grp string, val double")
    snapshot_write(SparkFrame(extra), src, mode="append")
    snapshot_delete(spark, src, [("id", "<", 3)])


def _expected(spark, src):
    base = snapshot_read(spark, src).spark_df
    return {r["grp"]: (r["cnt"], r["mn"], r["mx"]) for r in
            base.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min("val").alias("mn"),
                 F.max("val").alias("mx")).collect()}


def _got(spark, view):
    return {r["grp"]: (r["cnt"], r["min_val"], r["max_val"]) for r in
            matview_read(spark, view).spark_df
            .select("grp", "cnt", "min_val", "max_val").collect()}


def _spy(monkeypatch):
    """Record each _maybe_broadcast decision (True = hint applied)."""
    decisions = []
    orig = M._maybe_broadcast

    def spy(df, n):
        decisions.append(n <= M._KEY_BROADCAST_MAX)
        return orig(df, n)

    monkeypatch.setattr(M, "_maybe_broadcast", spy)
    return decisions


class TestKeyBroadcastGate:
    def test_small_key_sets_keep_the_hint(self, spark, tmp_path,
                                          monkeypatch):
        src, view = str(tmp_path / "src"), str(tmp_path / "mv")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        _dml(spark, src)
        decisions = _spy(monkeypatch)
        out = matview_refresh(spark, view)
        assert out["mode"] == "incremental"
        assert out["broadcast_gated"] is False
        assert out["groups_repaired"] >= 1     # repair path exercised
        assert decisions and all(decisions), \
            "small key sets must keep the broadcast hint"
        assert _got(spark, view) == _expected(spark, src)

    def test_above_gate_withholds_hint_same_result(self, spark,
                                                   tmp_path,
                                                   monkeypatch):
        src, view = str(tmp_path / "src"), str(tmp_path / "mv")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        _dml(spark, src)
        monkeypatch.setattr(M, "_KEY_BROADCAST_MAX", 0)
        decisions = _spy(monkeypatch)
        out = matview_refresh(spark, view)
        assert out["mode"] == "incremental"
        assert out["broadcast_gated"] is True
        assert decisions and not any(decisions), \
            "above the gate every key-set hint must be withheld"
        # AQE-chosen strategy, identical result
        assert _got(spark, view) == _expected(spark, src)


class TestDStateQuietWatermark:
    def test_quiet_distinct_column_advances_watermark(self, spark,
                                                      tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "mv")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        sd = _dstate_dir(view, "val")
        w0 = snapshot_txn_version(sd, _APP_ID)
        # DML whose changed rows are all NULL for the distinct column:
        # the view advances; the state delta for `val` is EMPTY
        extra = spark.createDataFrame(
            [(200, "g2", None), (201, "g3", None)],
            "id int, grp string, val double")
        snapshot_write(SparkFrame(extra), src, mode="append")
        out = matview_refresh(spark, view)
        assert out["mode"] == "incremental"
        w1 = snapshot_txn_version(sd, _APP_ID)
        wv = snapshot_txn_version(view, _APP_ID)
        assert w1 == wv > w0, \
            "a quiet distinct column must advance its state " \
            "watermark with the view (metadata-only set_txn commit)"
        # and the state table gained only a metadata commit — the
        # quiet interval wrote no data files
        assert _got(spark, view) == _expected(spark, src)
        # distinct values still correct after a LATER real change
        more = spark.createDataFrame([(300, "g2", 7.0)],
                                     "id int, grp string, val double")
        snapshot_write(SparkFrame(more), src, mode="append")
        matview_refresh(spark, view)
        got = {r["grp"]: r["cntd_val"] for r in
               matview_read(spark, view).spark_df.collect()}
        base = snapshot_read(spark, src).spark_df
        exp = {r["grp"]: r["c"] for r in
               base.where(F.col("val").isNotNull())
               .select("grp", "val").distinct().groupBy("grp")
               .agg(F.count(F.lit(1)).alias("c")).collect()}
        exp = {g: exp.get(g, 0) for g in got}
        assert got == exp
