"""Column-summary semantics (FIXTURES.md F6; cl-data-frame.lisp:60-90,463-476).

Not covered by the reference's own tests (print is smoke-only) but the
summary behavior constants are part of the semantic contract.
"""

from __future__ import annotations

from cl_data_frame_spark import (BitSummary, GenericSummary, QuantilesSummary,
                                 df)
from cl_data_frame_spark.summary import (QUANTILES_THRESHOLD,
                                         SUMMARY_MINIMUM_LENGTH)


def test_bit_summary(spark):
    # 25 ones of 100 -> count 25, 25% (cl-data-frame.lisp:31-38,65-66)
    bits = [i % 4 == 0 for i in range(100)]
    fr = df(spark, "b", bits, element_types={"b": "bit"})
    s = fr.column_summary("b")
    assert isinstance(s, BitSummary)
    assert s.count == 25 and s.length == 100
    assert abs(s.ratio - 0.25) < 1e-12
    assert "25" in repr(s)


def test_quantiles_above_threshold(spark):
    # >10 distinct reals -> exact 5-point summary (cl-data-frame.lisp:72-83)
    vals = [float(i) for i in range(1, 101)]  # 100 distinct reals
    fr = df(spark, "x", vals)
    s = fr.column_summary("x")
    assert isinstance(s, GenericSummary)
    q = s.quantiles
    assert isinstance(q, QuantilesSummary)
    assert q.count == 100
    assert q.min == 1.0 and q.max == 100.0
    assert q.q50 == 50.5  # exact percentile, not approximate
    assert q.q25 == 25.75 and q.q75 == 75.25


def test_quantiles_approximate_path(spark):
    # the 100 TB path: approx_percentile sketch instead of exact buffering;
    # on a small uniform column the sketch is exact at min/max and close
    # at the interior points
    vals = [float(i) for i in range(1, 101)]
    fr = df(spark, "x", vals)
    s = fr.column_summary("x", approximate=True)
    q = s.quantiles
    assert q is not None
    assert q.min == 1.0 and q.max == 100.0
    assert abs(q.q50 - 50.5) <= 1.0


def test_quantiles_with_nulls_keeps_null_frequency(spark):
    vals = [float(i) for i in range(1, 101)] + [None] * 5
    fr = df(spark, "x", vals, element_types={"x": float})
    s = fr.column_summary("x")
    assert s.quantiles is not None and s.quantiles.count == 100
    assert (None, 5) in s.frequencies


def test_frequency_below_threshold(spark):
    # <=10 distinct -> frequency table desc by count, no quantiles
    vals = [1, 1, 1, 2, 2, 3] * 4
    fr = df(spark, "x", vals)
    s = fr.column_summary("x")
    assert s.quantiles is None
    assert s.frequencies[0] == (1, 12)
    assert s.frequencies[1] == (2, 8)
    assert s.frequencies[2] == (3, 4)
    assert QUANTILES_THRESHOLD == 10


def test_string_frequencies(spark):
    fr = df(spark, "s", ["x", "y", "x", "z", "x", "y"])
    s = fr.column_summary("s")
    assert s.frequencies[0] == ("x", 3)
    assert s.frequencies[1] == ("y", 2)


def test_print_threshold(spark):
    # nrow < 10 -> verbatim; >= 10 -> summarized (cl-data-frame.lisp:463-476)
    assert SUMMARY_MINIMUM_LENGTH == 10
    small = df(spark, "a", [1, 2, 3])
    assert "[1, 2, 3]" in repr(small)
    big = df(spark, "a", [float(i) for i in range(50)])
    assert "reals" in repr(big)


def test_equi_width_histogram_bins_and_edges(spark):
    from cl_data_frame_spark.summary import equi_width_histogram
    df = spark.createDataFrame([(float(x),) for x in range(10)], ["v"])
    out = {r["bin"]: r for r in
           equi_width_histogram(df, "v", n_bins=5).collect()}
    # range [0, 9], width 1.8: bins 0..4 get 2 each; max clamps to bin 4
    assert {b: out[b]["n"] for b in out} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2}
    assert out[0]["lo"] == 0.0 and out[0]["hi"] == 1.8
    assert out[4]["hi"] == 9.0


def test_equi_width_histogram_degenerate_column(spark):
    from cl_data_frame_spark.summary import equi_width_histogram
    df = spark.createDataFrame([(5.0,)] * 7, ["v"])
    out = equi_width_histogram(df, "v", n_bins=4).collect()
    assert len(out) == 1
    assert out[0]["bin"] == 0 and out[0]["n"] == 7


def test_equi_width_histogram2d_cells(spark):
    from cl_data_frame_spark.summary import equi_width_histogram2d
    # 100 points on a diagonal: cells (i, i) each get 25; off-diagonal
    # cells are empty and must NOT appear
    rows = [(float(i), float(i * 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {(r.bin_x, r.bin_y): r for r in
           equi_width_histogram2d(df, "x", "y", 4, 4).collect()}
    assert set(out) == {(i, i) for i in range(4)}
    assert all(out[(i, i)].n == 25 for i in range(4))
    # max values clamp into the last closed bin; lo edges are exact
    assert out[(0, 0)].lo_x == 0.0 and out[(0, 0)].lo_y == 0.0
    assert out[(3, 3)].lo_x == 74.25  # 0 + 3 * (99 / 4)


def test_equi_width_histogram2d_degenerate_axis(spark):
    from cl_data_frame_spark.summary import equi_width_histogram2d
    rows = [(5.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {(r.bin_x, r.bin_y): r.n for r in
           equi_width_histogram2d(df, "x", "y", 3, 2).collect()}
    assert set(k[0] for k in out) == {0}       # x collapses to bin 0
    assert sum(out.values()) == 10


def test_key_containment_fk_partial_none(spark):
    from cl_data_frame_spark.summary import key_containment
    parent = spark.createDataFrame([(i,) for i in range(10)], ["pk"])
    child_fk = spark.createDataFrame(
        [(i % 10,) for i in range(50)], ["ck"])
    r = key_containment(child_fk, "ck", parent, "pk").spark_df.first()
    assert r["verdict"] == "fk" and r["containment"] == 1.0
    assert r["n_child_distinct"] == 10 and r["n_missing"] == 0
    # partial: some child values missing from the parent
    child_part = spark.createDataFrame(
        [(i,) for i in range(5, 15)], ["ck"])
    r2 = key_containment(child_part, "ck", parent, "pk").spark_df.first()
    assert r2["verdict"] == "partial"
    assert r2["n_matched"] == 5 and r2["n_missing"] == 5
    assert abs(r2["containment"] - 0.5) < 1e-9
    # duplicate parent keys disqualify the FK verdict even at
    # containment 1 (not a candidate key)
    dup_parent = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [3]], ["pk"])
    r3 = key_containment(child_fk, "ck", dup_parent, "pk").spark_df.first()
    assert r3["containment"] == 1.0 and r3["verdict"] == "partial"
    assert not r3["parent_unique"]
    # disjoint -> none; NULL child keys excluded
    child_none = spark.createDataFrame(
        [(100,), (None,)], "ck int")
    r4 = key_containment(child_none, "ck", parent, "pk").spark_df.first()
    assert r4["verdict"] == "none" and r4["n_child_distinct"] == 1
