"""Round 14: GENERATED / IDENTITY columns (Delta's ``GENERATED ALWAYS
AS (expr)`` / ``AS IDENTITY``): table-level declarations in the
manifest; ``snapshot_write`` computes absent declared columns (expr
row-locally, identity as DENSE values continuing a commit-carried
high-water mark — per-partition offsets, no window), enforces provided
expression columns, and rejects provided GENERATED ALWAYS identity
values. Declarations carry across every commit kind; rename/drop of a
participating column is blocked."""

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.sources import snapshots as S


class TestExpressionGenerated:
    def test_computed_on_create_and_append(self, spark, tmp_path):
        t = str(tmp_path / "gexpr")
        base = spark.sql(
            "select * from values (1, timestamp'2024-03-05 10:30'),"
            " (2, timestamp'2024-03-06 01:00') as t(k, ts)")
        S.snapshot_write(base, t, generated={
            "day": "date_trunc('day', ts)"})
        out = S.snapshot_read(spark, t).spark_df
        assert "day" in out.columns
        got = {r["k"]: str(r["day"]) for r in out.collect()}
        assert got[1].startswith("2024-03-05 00:00")
        # append WITHOUT the column: computed, schema aligned
        S.snapshot_write(
            spark.sql("select 3 as k, timestamp'2024-04-01 09:00'"
                      " as ts"), t, mode="append")
        out = S.snapshot_read(spark, t).spark_df
        assert out.count() == 3
        got = {r["k"]: str(r["day"]) for r in out.collect()}
        assert got[3].startswith("2024-04-01 00:00")

    def test_provided_values_enforced(self, spark, tmp_path):
        t = str(tmp_path / "gbad")
        S.snapshot_write(
            spark.sql("select 1 as k, 2 as v"), t,
            generated={"v2": "v * 2"})
        # matching values pass
        S.snapshot_write(
            spark.sql("select 5 as k, 3 as v, 6 as v2"), t,
            mode="append")
        # a mismatch aborts with no commit
        v_before = S._latest_version(t)
        with pytest.raises(ValueError, match="generated-column"):
            S.snapshot_write(
                spark.sql("select 6 as k, 3 as v, 99 as v2"), t,
                mode="append")
        assert S._latest_version(t) == v_before

    def test_add_and_drop_declaration_on_existing_table(
            self, spark, tmp_path):
        t = str(tmp_path / "gadd")
        S.snapshot_write(spark.sql("select 1 as v, 2 as v2"), t)
        with pytest.raises(KeyError):
            S.snapshot_add_generated_column(t, "nope", "v * 2")
        S.snapshot_add_generated_column(t, "v2", "v * 2")
        # future batch omitting v2 gets it computed
        S.snapshot_write(spark.sql("select 10 as v"), t,
                         mode="append")
        got = {r["v"]: r["v2"] for r in
               S.snapshot_read(spark, t).spark_df.collect()}
        assert got[10] == 20
        assert S.snapshot_detail(t)["generated_columns"] == ["v2"]
        S.snapshot_drop_generated_column(t, "v2")
        # rule gone: a batch must now carry the column itself
        with pytest.raises(ValueError, match="schema"):
            S.snapshot_write(spark.sql("select 11 as v"), t,
                             mode="append")

    def test_rename_drop_blocked_while_declared(self, spark,
                                                tmp_path):
        t = str(tmp_path / "gguard")
        S.snapshot_write(spark.sql("select 1 as v, 2 as d"), t,
                         generated={"d": "v + 1"})
        for fn, col in ((S.snapshot_rename_column, "v"),
                        (S.snapshot_drop_column, "v"),
                        (S.snapshot_rename_column, "d")):
            with pytest.raises(ValueError, match="generated"):
                fn(t, col, "x") if fn is S.snapshot_rename_column \
                    else fn(t, col)

    def test_declarations_survive_dml_and_optimize(self, spark,
                                                   tmp_path):
        t = str(tmp_path / "gdml")
        S.snapshot_write(
            spark.range(20).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v")),
            t, generated={"v2": "v * 10"}, stats_cols=["k"])
        S.snapshot_delete(spark, t, [("k", "<", 5)])
        S.snapshot_optimize(spark, t)
        m = S._read_manifest(t, S._latest_version(t))
        assert "v2" in (m.get("generated") or {})
        # and the writer path still computes after the DML history
        S.snapshot_write(
            spark.sql("select 100::bigint as k, 7::bigint as v"), t,
            mode="append")
        got = {r["k"]: r["v2"] for r in
               S.snapshot_read(spark, t).spark_df.collect()}
        assert got[100] == 70


class TestIdentityColumns:
    def test_dense_assignment_across_appends(self, spark, tmp_path):
        t = str(tmp_path / "ident")
        S.snapshot_write(
            spark.range(100).select(F.col("id").alias("v"))
            .repartition(4), t,
            generated={"id": {"identity": {"start": 1, "step": 1}}})
        ids1 = sorted(r["id"] for r in
                      S.snapshot_read(spark, t).spark_df.collect())
        assert ids1 == list(range(1, 101))       # DENSE, from start
        S.snapshot_write(
            spark.range(50).select((F.col("id") + 500).alias("v"))
            .repartition(3), t, mode="append")
        ids2 = sorted(r["id"] for r in
                      S.snapshot_read(spark, t).spark_df.collect())
        assert ids2 == list(range(1, 151))       # continues the mark
        # the mark rides the manifest
        m = S._read_manifest(t, S._latest_version(t))
        assert m["generated"]["id"]["identity"]["high"] == 150

    def test_generated_always_rejects_explicit(self, spark,
                                               tmp_path):
        t = str(tmp_path / "identalw")
        S.snapshot_write(
            spark.sql("select 1 as v"), t,
            generated={"id": {"identity": {}}})
        with pytest.raises(ValueError, match="ALWAYS"):
            S.snapshot_write(
                spark.sql("select 2 as v, 99 as id"), t,
                mode="append")

    def test_by_default_accepts_and_advances_mark(self, spark,
                                                  tmp_path):
        t = str(tmp_path / "identdef")
        S.snapshot_write(
            spark.sql("select 1 as v"), t,
            generated={"id": {"identity": {"always": False}}})
        S.snapshot_write(
            spark.sql("select 2 as v, 40 as id"), t, mode="append")
        S.snapshot_write(spark.sql("select 3 as v"), t,
                         mode="append")      # assigned PAST 40
        rows = {r["v"]: r["id"] for r in
                S.snapshot_read(spark, t).spark_df.collect()}
        assert rows[2] == 40 and rows[3] == 41
        assert len(set(rows.values())) == 3  # all unique

    def test_step_and_start(self, spark, tmp_path):
        t = str(tmp_path / "identstep")
        S.snapshot_write(
            spark.range(3).select(F.col("id").alias("v")), t,
            generated={"id": {"identity": {"start": 100,
                                           "step": 10}}})
        ids = sorted(r["id"] for r in
                     S.snapshot_read(spark, t).spark_df.collect())
        assert ids == [100, 110, 120]
        with pytest.raises(ValueError, match="nonzero"):
            S.snapshot_write(
                spark.sql("select 1 as v"), str(tmp_path / "z"),
                generated={"id": {"identity": {"step": 0}}})

    def test_lost_race_never_mints_duplicates(self, spark, tmp_path):
        # the retry contract: a lost publish re-runs the WHOLE write
        # against the winner's mark — simulate by publishing a racing
        # append between manifest read and publish via the ordinary
        # sequential API (ids must stay unique and dense)
        t = str(tmp_path / "identrace")
        S.snapshot_write(
            spark.sql("select 1 as v"), t,
            generated={"id": {"identity": {}}})
        for i in range(4):
            S.snapshot_write(spark.sql(f"select {i + 2} as v"), t,
                             mode="append")
        ids = sorted(r["id"] for r in
                     S.snapshot_read(spark, t).spark_df.collect())
        assert ids == [1, 2, 3, 4, 5]

    def test_identity_on_creating_write_only(self, spark, tmp_path):
        t = str(tmp_path / "identlate")
        S.snapshot_write(spark.sql("select 1 as v"), t)
        with pytest.raises(ValueError, match="creation"):
            S.snapshot_write(
                spark.sql("select 2 as v"), t, mode="append",
                generated={"id": {"identity": {}}})
