"""EXACT COUNT(DISTINCT) measures on materialized views (round 13):
per-value multiplicity state tables under the view, maintained from
the same signed change feed under their own commit-riding watermarks;
the view's ``cntd_c`` is the touched groups' absolute live-value
count. Parity against full ``countDistinct`` recomputes across DML
histories that include the hard case — a delete removing a group's
LAST occurrence of a value."""

import os

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.matview import (
    _dstate_dir, matview_compact, matview_create,
    matview_create_join, matview_read, matview_refresh)
from cl_data_frame_spark.sources.snapshots import (
    snapshot_delete, snapshot_read, snapshot_txn_version,
    snapshot_update, snapshot_write)


def _seed(spark, src, rows):
    df = spark.createDataFrame(rows,
                               "id int, grp string, val double")
    snapshot_write(SparkFrame(df), src, mode="overwrite",
                   stats_cols=["id", "grp"])


def _expected(spark, src, where=None):
    base = snapshot_read(spark, src).spark_df
    if where:
        base = base.where(where)
    cnts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt"))
    # the distinct family recomputed from first principles: distinct
    # (grp, val) pairs, exact-decimal sum, avg = double(sum)/count
    d = (base.where(F.col("val").isNotNull())
         .select("grp", "val").distinct().groupBy("grp")
         .agg(F.count(F.lit(1)).alias("cntd"),
              F.sum(F.col("val").cast("decimal(28,6)"))
              .cast("decimal(38,6)").alias("sumd")))
    j = cnts.join(d, on="grp", how="left")
    out = {}
    for r in j.collect():
        cntd = r["cntd"] or 0
        sumd = r["sumd"]
        avgd = (float(sumd) / cntd) if cntd else None
        out[r["grp"]] = (r["cnt"], cntd, sumd, avgd)
    return out


def _got(spark, view):
    return {r["grp"]: (r["cnt"], r["cntd_val"], r["sumd_val"],
                       r["avgd_val"]) for r in
            matview_read(spark, view).spark_df
            .select("grp", "cnt", "cntd_val", "sumd_val",
                    "avgd_val").collect()}


def _parity(spark, src, view, tag="", where=None):
    got, exp = _got(spark, view), _expected(spark, src, where)
    assert got == exp, (tag, got, exp)


class TestDistinctSingleSource:
    def test_create_and_last_occurrence_delete(self, spark,
                                               tmp_path):
        src = str(tmp_path / "src")
        view = str(tmp_path / "mv")
        # g0: val 1,1,2 (cntd 2); g1: val 3,4 (cntd 2);
        # g2: all-NULL vals (cntd 0); g3: one row (cntd 1)
        _seed(spark, src, [
            (0, "g0", 1.0), (1, "g0", 1.0), (2, "g0", 2.0),
            (3, "g1", 3.0), (4, "g1", 4.0),
            (5, "g2", None), (6, "g2", None),
            (7, "g3", 9.0),
        ])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        _parity(spark, src, view, "create")
        assert _got(spark, view)["g0"][:2] == (3, 2)
        assert _got(spark, view)["g2"][:2] == (2, 0)
        # delete id=2: removes g0's LAST occurrence of 2.0 -> cntd 1
        snapshot_delete(spark, src, [("id", "==", 2)])
        # delete id=0: one of two 1.0 rows stays -> cntd still 1
        snapshot_delete(spark, src, [("id", "==", 0)])
        s = matview_refresh(spark, view)
        assert s["mode"] == "incremental"
        _parity(spark, src, view, "deletes")
        assert _got(spark, view)["g0"][:2] == (1, 1)

    def test_update_moves_value_and_group_erased(self, spark,
                                                 tmp_path):
        src = str(tmp_path / "src2")
        view = str(tmp_path / "mv2")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 3))
                           for i in range(12)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        # UPDATE collapses every g0 value onto 7.0 -> cntd becomes 1
        snapshot_update(spark, src, [("grp", "==", "g0")],
                        {"val": "7.0"})
        matview_refresh(spark, view)
        _parity(spark, src, view, "update")
        assert _got(spark, view)["g0"][:2] == (6, 1)
        # erase g1 entirely -> tombstone; its state rows go to 0
        snapshot_delete(spark, src, [("grp", "==", "g1")])
        matview_refresh(spark, view)
        _parity(spark, src, view, "erase")
        assert "g1" not in _got(spark, view)
        # resurrect g1 with fresh values
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(100, "g1", 5.0), (101, "g1", 5.0)],
            "id int, grp string, val double")), src, mode="append")
        matview_refresh(spark, view)
        _parity(spark, src, view, "resurrect")
        assert _got(spark, view)["g1"][:2] == (2, 1)

    def test_mixed_history_parity_and_idempotence(self, spark,
                                                  tmp_path):
        import random
        rng = random.Random(13)
        src = str(tmp_path / "src3")
        view = str(tmp_path / "mv3")
        rows = [(i, f"g{i % 4}", float(rng.randint(0, 5)))
                for i in range(40)]
        _seed(spark, src, rows)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        nxt = 1000
        for step in range(4):
            op = step % 3
            if op == 0:
                add = [(nxt + j, f"g{rng.randint(0, 4)}",
                        float(rng.randint(0, 5))) for j in range(7)]
                nxt += 7
                snapshot_write(SparkFrame(spark.createDataFrame(
                    add, "id int, grp string, val double")), src,
                    mode="append")
            elif op == 1:
                snapshot_delete(
                    spark, src,
                    [("val", "==", float(rng.randint(0, 5)))])
            else:
                snapshot_update(
                    spark, src,
                    [("val", "==", float(rng.randint(0, 5)))],
                    {"val": str(float(rng.randint(0, 5)))})
            matview_refresh(spark, view)
            _parity(spark, src, view, f"step{step}")
        # a second refresh at the same version is a clean no-op
        s = matview_refresh(spark, view)
        assert s["mode"] == "noop"
        _parity(spark, src, view, "noop")

    def test_state_merged_view_not_replays_cleanly(self, spark,
                                                   tmp_path):
        """The crash window: distinct state committed, view commit
        lost. The rerun must skip the state merge (watermark) and
        still land the exact absolute counts."""
        from cl_data_frame_spark.operators import matview as M
        src = str(tmp_path / "src4")
        view = str(tmp_path / "mv4")
        _seed(spark, src, [(i, "g0", float(i % 3))
                           for i in range(9)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        snapshot_delete(spark, src, [("val", "==", 2.0)])
        # advance ONLY the state, as a crashed refresh would have
        meta = M._read_meta(view)
        from cl_data_frame_spark.sources.snapshots import (
            snapshot_changes)

        def feed_fn(ap):
            return snapshot_changes(spark, src,
                                    from_version=ap["matview"],
                                    to_version=2).spark_df
        M._advance_dstate(
            spark, view, "val", ["grp"],
            {"feed_fn": feed_fn, "targets": [("matview", 2)],
             "view_applied": {"matview": 1}},
            feed_fn({"matview": 1}))
        assert snapshot_txn_version(
            _dstate_dir(view, "val"), "matview") == 2
        # view watermark still 1; the full refresh must replay
        assert snapshot_txn_version(view, "matview") == 1
        matview_refresh(spark, view)
        _parity(spark, src, view, "replay")
        assert _got(spark, view)["g0"][:2] == (6, 2)

    def test_compact_preserves_parity(self, spark, tmp_path):
        src = str(tmp_path / "src5")
        view = str(tmp_path / "mv5")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 4))
                           for i in range(16)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        snapshot_delete(spark, src, [("val", "==", 1.0)])
        matview_refresh(spark, view)
        matview_compact(spark, view)
        _parity(spark, src, view, "compact")
        # tombstoned state rows purged
        st = snapshot_read(
            spark, _dstate_dir(view, "val")).spark_df
        assert st.where(F.col("dcnt") <= 0).count() == 0
        # and maintenance continues after compaction
        snapshot_delete(spark, src, [("val", "==", 2.0)])
        matview_refresh(spark, view)
        _parity(spark, src, view, "post-compact")

    def test_distinct_key_rejected(self, spark, tmp_path):
        src = str(tmp_path / "src6")
        _seed(spark, src, [(1, "g0", 1.0)])
        with pytest.raises(ValueError, match="group keys"):
            matview_create(spark, src, str(tmp_path / "mv6"),
                           keys="grp", distinct_cols=["grp"])

    def test_filtered_view_distinct(self, spark, tmp_path):
        src = str(tmp_path / "src7")
        view = str(tmp_path / "mv7")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 5))
                           for i in range(20)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"], where="val >= 1.0")
        _parity(spark, src, view, "create", where="val >= 1.0")
        # an update moves rows ACROSS the predicate boundary
        snapshot_update(spark, src, [("val", "==", 1.0)],
                        {"val": "0.0"})
        snapshot_update(spark, src, [("val", "==", 0.0)],
                        {"val": "4.0"})
        matview_refresh(spark, view)
        _parity(spark, src, view, "boundary", where="val >= 1.0")


class TestDistinctJoinView:
    def test_join_view_distinct_parity(self, spark, tmp_path):
        fact = str(tmp_path / "fact")
        dim = str(tmp_path / "dim")
        view = str(tmp_path / "jmv")
        fdf = spark.createDataFrame(
            [(i, i % 5, float(i % 3)) for i in range(30)],
            "fid int, k int, val double")
        ddf = spark.createDataFrame(
            [(j, f"c{j % 2}") for j in range(5)],
            "k int, cat string")
        snapshot_write(SparkFrame(fdf), fact, mode="overwrite",
                       stats_cols=["k"])
        snapshot_write(SparkFrame(ddf), dim, mode="overwrite",
                       stats_cols=["k"])
        matview_create_join(spark, fact, dim, view, on="k",
                            keys="cat", measure_cols=["val"],
                            distinct_cols=["val"])

        def exp():
            f = snapshot_read(spark, fact).spark_df
            d = snapshot_read(spark, dim).spark_df
            return {r["cat"]: (r["cnt"], r["cntd"]) for r in
                    f.join(d, on="k").groupBy("cat").agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.countDistinct("val").alias("cntd"))
                    .collect()}

        def got():
            return {r["cat"]: (r["cnt"], r["cntd_val"]) for r in
                    matview_read(spark, view).spark_df
                    .select("cat", "cnt", "cntd_val").collect()}
        assert got() == exp()
        # fact DML: delete every val==2.0 row (last-occurrence case
        # inside each cat), then dim DML: recategorize k=3
        snapshot_delete(spark, fact, [("val", "==", 2.0)])
        matview_refresh(spark, view)
        assert got() == exp()
        snapshot_update(spark, dim, [("k", "==", 3)],
                        {"cat": "'c0'"})
        matview_refresh(spark, view)
        assert got() == exp()
        # both sides in ONE interval
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(100, 3, 9.0), (101, 4, 9.0)],
            "fid int, k int, val double")), fact, mode="append")
        snapshot_update(spark, dim, [("k", "==", 0)],
                        {"cat": "'c1'"})
        matview_refresh(spark, view)
        assert got() == exp()

    def test_state_dir_layout(self, spark, tmp_path):
        src = str(tmp_path / "src8")
        view = str(tmp_path / "mv8")
        _seed(spark, src, [(1, "g0", 1.0)])
        matview_create(spark, src, view, keys="grp",
                       distinct_cols=["val"])
        sd = _dstate_dir(view, "val")
        assert os.path.isdir(sd)
        st = snapshot_read(spark, sd).spark_df
        assert set(st.columns) == {"grp", "val", "dcnt"}


class TestChunkedCatchUp:
    """Round 13: matview_refresh_chunked — bounded catch-up, one
    exactly-once commit per version-aligned feed chunk."""

    def test_single_source_chunked_equals_direct(self, spark,
                                                 tmp_path):
        from cl_data_frame_spark.operators.matview import (
            matview_refresh_chunked)
        src = str(tmp_path / "csrc")
        view = str(tmp_path / "cmv")
        _seed(spark, src, [(i, f"g{i % 3}", float(i % 4))
                           for i in range(24)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        # a 5-commit history to catch up over
        for step in range(3):
            snapshot_write(SparkFrame(spark.createDataFrame(
                [(100 + 10 * step + j, f"g{j % 3}",
                  float(j % 5)) for j in range(5)],
                "id int, grp string, val double")), src,
                mode="append")
        snapshot_delete(spark, src, [("val", "==", 1.0)])
        snapshot_update(spark, src, [("val", "==", 3.0)],
                        {"val": "2.0"})
        summaries = matview_refresh_chunked(spark, view,
                                            max_feed_files=1)
        assert len(summaries) >= 3          # several bounded commits
        assert all(s["mode"] in ("incremental", "empty", "noop")
                   for s in summaries)
        _parity(spark, src, view, "chunked")
        # a second catch-up is all no-ops (watermarks already there)
        again = matview_refresh_chunked(spark, view,
                                        max_feed_files=1)
        assert all(s["mode"] == "noop" for s in again)
        _parity(spark, src, view, "chunked-noop")

    def test_star_chunked_fact_then_dims(self, spark, tmp_path):
        from cl_data_frame_spark.operators.matview import (
            matview_create_join, matview_refresh_chunked)
        fact = str(tmp_path / "cf")
        dim = str(tmp_path / "cd")
        view = str(tmp_path / "cjv")
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(i, i % 4, float(i % 3)) for i in range(20)],
            "fid int, k int, val double")), fact, mode="overwrite",
            stats_cols=["k"])
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(j, f"c{j % 2}") for j in range(4)],
            "k int, cat string")), dim, mode="overwrite",
            stats_cols=["k"])
        matview_create_join(spark, fact, dim, view, on="k",
                            keys="cat", measure_cols=["val"])
        for step in range(3):
            snapshot_write(SparkFrame(spark.createDataFrame(
                [(100 + 10 * step + j, j % 4, 9.0)
                 for j in range(4)],
                "fid int, k int, val double")), fact,
                mode="append")
        snapshot_update(spark, dim, [("k", "==", 1)],
                        {"cat": "'cZ'"})
        summaries = matview_refresh_chunked(spark, view,
                                            max_feed_files=1)
        assert len(summaries) >= 3
        f = snapshot_read(spark, fact).spark_df
        d = snapshot_read(spark, dim).spark_df
        exp = {r["cat"]: r["cnt"] for r in
               f.join(d, on="k").groupBy("cat")
               .agg(F.count(F.lit(1)).alias("cnt")).collect()}
        got = {r["cat"]: r["cnt"] for r in
               matview_read(spark, view).spark_df
               .select("cat", "cnt").collect()}
        assert got == exp


class TestDistinctApprox:
    """Round 13: the APPROXIMATE distinct alternative — a per-group
    HLL sketch in the view row (O(1) state, no companion table);
    insert-only refreshes union sketches losslessly, any non-NULL
    delete repairs the group exactly. At test cardinalities the
    DataSketches HLL is still in exact (list/set) mode, so estimates
    equal true counts."""

    @staticmethod
    def _approx(spark, view):
        return {r["grp"]: (r["cnt"], r["cntd_approx_val"]) for r in
                matview_read(spark, view).spark_df
                .select("grp", "cnt", "cntd_approx_val").collect()}

    @staticmethod
    def _truth(spark, src):
        base = snapshot_read(spark, src).spark_df
        return {r["grp"]: (r["cnt"], r["cntd"]) for r in
                base.groupBy("grp").agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.countDistinct("val").alias("cntd")).collect()}

    def test_insert_only_is_sketch_union(self, spark, tmp_path):
        src = str(tmp_path / "asrc")
        view = str(tmp_path / "amv")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 5))
                           for i in range(10)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_approx_cols=["val"])
        assert self._approx(spark, view) == self._truth(spark, src)
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(100 + j, f"g{j % 2}", float(5 + j)) for j in range(6)],
            "id int, grp string, val double")), src, mode="append")
        s = matview_refresh(spark, view)
        assert s["mode"] == "incremental"
        assert s["groups_repaired"] == 0, \
            "insert-only must stay on the sketch-union path"
        assert self._approx(spark, view) == self._truth(spark, src)

    def test_delete_repairs_group_exactly(self, spark, tmp_path):
        src = str(tmp_path / "asrc2")
        view = str(tmp_path / "amv2")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 4))
                           for i in range(16)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_approx_cols=["val"])
        # last-occurrence delete: every val==3.0 row goes
        snapshot_delete(spark, src, [("val", "==", 3.0)])
        s = matview_refresh(spark, view)
        assert s["groups_repaired"] >= 1, \
            "a non-NULL delete must repair (sketches can't subtract)"
        assert self._approx(spark, view) == self._truth(spark, src)
        # erase + resurrect
        snapshot_delete(spark, src, [("grp", "==", "g1")])
        matview_refresh(spark, view)
        assert "g1" not in self._approx(spark, view)
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(200, "g1", 9.0)], "id int, grp string, val double")),
            src, mode="append")
        matview_refresh(spark, view)
        assert self._approx(spark, view) == self._truth(spark, src)

    def test_exact_and_approx_side_by_side(self, spark, tmp_path):
        src = str(tmp_path / "asrc3")
        view = str(tmp_path / "amv3")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 6))
                           for i in range(18)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"],
                       distinct_approx_cols=["id"])
        snapshot_delete(spark, src, [("val", "==", 2.0)])
        matview_refresh(spark, view)
        df = matview_read(spark, view).spark_df
        base = snapshot_read(spark, src).spark_df
        exp = {r["grp"]: (r["cv"], r["ci"]) for r in
               base.groupBy("grp").agg(
                   F.countDistinct("val").alias("cv"),
                   F.countDistinct("id").alias("ci")).collect()}
        got = {r["grp"]: (r["cntd_val"], r["cntd_approx_id"])
               for r in df.collect()}
        assert got == exp

    def test_same_column_in_both_rejected(self, spark, tmp_path):
        src = str(tmp_path / "asrc4")
        _seed(spark, src, [(1, "g0", 1.0)])
        with pytest.raises(ValueError, match="BOTH"):
            matview_create(spark, src, str(tmp_path / "amv4"),
                           keys="grp", distinct_cols=["val"],
                           distinct_approx_cols=["val"])


class TestCompactVacuum:
    def test_compact_with_vacuum_reclaims_history(self, spark,
                                                  tmp_path):
        import glob
        src = str(tmp_path / "vsrc")
        view = str(tmp_path / "vmv")
        _seed(spark, src, [(i, f"g{i % 2}", float(i % 3))
                           for i in range(12)])
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"])
        for step in range(3):
            snapshot_delete(spark, src,
                            [("id", "==", step)])
            matview_refresh(spark, view)
        sd = _dstate_dir(view, "val")
        n_view = len(glob.glob(os.path.join(
            view, "_manifests", "v*.json")))
        n_state = len(glob.glob(os.path.join(
            sd, "_manifests", "v*.json")))
        assert n_view >= 4 and n_state >= 4   # history accumulated
        matview_compact(spark, view, vacuum_retain_hours=0)
        import cl_data_frame_spark.sources.snapshots as S
        assert len(S._versions(view)) == 1
        assert len(S._versions(sd)) == 1
        _parity(spark, src, view, "post-vacuum")
        # maintenance continues after the reclaim
        snapshot_delete(spark, src, [("id", "==", 5)])
        matview_refresh(spark, view)
        _parity(spark, src, view, "post-vacuum-refresh")
