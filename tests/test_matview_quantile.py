"""Round 14: APPROXIMATE QUANTILE view measures — ``matview_create(
quantile_cols=["val"])`` stores a per-group DataSketches KLL sketch in
the view row, maintained under the same CAS watermark as every other
measure: insert-only refreshes are one lossless sketch merge; any
delete of a non-NULL value repairs the group exactly from the pinned
base (the HLL ``distinct_approx_cols`` construction verbatim).
Exposed at read as ``q50_val`` / ``q95_val`` / ``q99_val``.

Parity: while a group holds <= kll_k values the sketch retains all of
them, so the returned quantile is an actual group value whose RANK is
within one position of the requested probability — the assertion used
here (definition-robust: KLL's rank convention need not match Spark's
interpolated ``percentile``)."""

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.matview import (
    matview_create, matview_create_join, matview_read,
    matview_refresh)
from cl_data_frame_spark.sources.snapshots import (
    snapshot_delete, snapshot_read, snapshot_write)


def _seed(spark, src, n=40):
    rows = [(i, f"g{i % 3}", float(i * 7 % 50)) for i in range(n)]
    rows += [(1000, "gnull", None), (1001, "gnull", None)]
    df = spark.createDataFrame(rows,
                               "id int, grp string, val double")
    snapshot_write(SparkFrame(df), src, mode="overwrite",
                   stats_cols=["id", "grp"])


def _group_vals(spark, src):
    base = snapshot_read(spark, src).spark_df
    out: dict[str, list] = {}
    for r in base.collect():
        out.setdefault(r["grp"], [])
        if r["val"] is not None:
            out[r["grp"]].append(r["val"])
    return {g: sorted(v) for g, v in out.items()}


def _assert_quantiles(spark, src, view, probs=(0.5, 0.95, 0.99)):
    vals = _group_vals(spark, src)
    got = {r["grp"]: r for r in
           matview_read(spark, view).spark_df.collect()}
    assert set(got) == set(vals)
    for g, vs in vals.items():
        for p in probs:
            tag = ("%g" % (p * 100)).replace(".", "_")
            q = got[g][f"q{tag}_val"]
            if not vs:
                assert q is None, (g, p, q)
                continue
            assert q in vs, (g, p, q, vs)   # a real retained value
            lo = sum(1 for v in vs if v < q) / len(vs)
            hi = sum(1 for v in vs if v <= q) / len(vs)
            # the value's rank interval must cover p within one slot
            assert lo - 1 / len(vs) <= p <= hi + 1 / len(vs), \
                (g, p, q, lo, hi)


class TestQuantileSingleSource:
    def test_parity_across_dml_history(self, spark, tmp_path):
        src, view = str(tmp_path / "src"), str(tmp_path / "mv")
        _seed(spark, src)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       quantile_cols=["val"])
        _assert_quantiles(spark, src, view)
        # insert-only refresh: the lossless merge path
        extra = spark.createDataFrame(
            [(200, "g0", 99.0), (201, "g0", 98.0),
             (202, "gnew", 1.0)],
            "id int, grp string, val double")
        snapshot_write(SparkFrame(extra), src, mode="append")
        out = matview_refresh(spark, view)
        assert out["groups_repaired"] == 0      # no delete: no repair
        _assert_quantiles(spark, src, view)
        # delete a non-NULL value: the exact-repair path
        snapshot_delete(spark, src, [("id", "==", 200)])
        out = matview_refresh(spark, view)
        assert out["groups_repaired"] >= 1
        _assert_quantiles(spark, src, view)
        # replay swallow: re-running the refresh is a no-op
        again = matview_refresh(spark, view)
        assert again["mode"] == "noop"
        _assert_quantiles(spark, src, view)

    def test_composes_with_measures_and_distinct(self, spark,
                                                 tmp_path):
        src, view = str(tmp_path / "srcc"), str(tmp_path / "mvc")
        _seed(spark, src, n=30)
        matview_create(spark, src, view, keys="grp",
                       measure_cols=["val"],
                       distinct_cols=["val"],
                       quantile_cols=["val"])
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(300, "g1", 13.0)], "id int, grp string, val double")),
            src, mode="append")
        snapshot_delete(spark, src, [("id", "==", 1)])
        matview_refresh(spark, view)
        _assert_quantiles(spark, src, view)
        base = snapshot_read(spark, src).spark_df
        exp = {r["grp"]: (r["cnt"], r["mn"], r["mx"]) for r in
               base.groupBy("grp")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.min("val").alias("mn"),
                    F.max("val").alias("mx")).collect()}
        got = {r["grp"]: (r["cnt"], r["min_val"], r["max_val"])
               for r in matview_read(spark, view).spark_df.collect()}
        assert got == exp

    def test_quantile_key_rejected(self, spark, tmp_path):
        src = str(tmp_path / "srcr")
        _seed(spark, src, n=6)
        with pytest.raises(ValueError, match="quantile_cols"):
            matview_create(spark, src, str(tmp_path / "x"),
                           keys="grp", quantile_cols=["grp"])

    def test_beyond_k_stays_within_rank_error(self, spark, tmp_path):
        # one group with > kll_k values: the estimate is FLAGGED
        # approximate — assert the KLL rank bound, not exactness
        src, view = str(tmp_path / "srcb"), str(tmp_path / "mvb")
        df = spark.range(3000).select(
            F.col("id").cast("int").alias("id"),
            F.lit("g").alias("grp"),
            F.col("id").cast("double").alias("val"))
        snapshot_write(SparkFrame(df), src, mode="overwrite",
                       stats_cols=["id"])
        matview_create(spark, src, view, keys="grp",
                       quantile_cols=["val"], kll_k=200)
        q95 = matview_read(spark, view).spark_df \
            .collect()[0]["q95_val"]
        # k=200 -> rank error ~1.65/sqrt(200) ~ 11.7%; assert 3x slack
        assert abs(q95 / 3000.0 - 0.95) < 0.35


class TestQuantileJoinView:
    def test_join_view_quantiles(self, spark, tmp_path):
        fact = str(tmp_path / "fact")
        dim = str(tmp_path / "dim")
        view = str(tmp_path / "mvj")
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(30)],
            "id int, fk int, val double")), fact,
            mode="overwrite", stats_cols=["id", "fk"])
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(k, f"c{k % 2}") for k in range(3)],
            "fk int, cat string")), dim, mode="overwrite",
            stats_cols=["fk"])
        matview_create_join(spark, fact, dim, view, on="fk",
                            keys="cat", measure_cols=["val"],
                            quantile_cols=["val"])
        snapshot_write(SparkFrame(spark.createDataFrame(
            [(50, 0, 200.0)], "id int, fk int, val double")),
            fact, mode="append")
        snapshot_delete(spark, fact, [("id", "==", 3)])
        matview_refresh(spark, view)
        f = snapshot_read(spark, fact).spark_df
        d = snapshot_read(spark, dim).spark_df
        j = f.join(d, on="fk", how="inner")
        vals: dict[str, list] = {}
        for r in j.collect():
            vals.setdefault(r["cat"], []).append(r["val"])
        vals = {g: sorted(v) for g, v in vals.items()}
        got = {r["cat"]: r["q50_val"] for r in
               matview_read(spark, view).spark_df.collect()}
        assert set(got) == set(vals)
        for g, vs in vals.items():
            q = got[g]
            assert q in vs
            lo = sum(1 for v in vs if v < q) / len(vs)
            hi = sum(1 for v in vs if v <= q) / len(vs)
            assert lo - 1 / len(vs) <= 0.5 <= hi + 1 / len(vs)
