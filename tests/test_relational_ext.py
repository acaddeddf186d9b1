"""Round-4 relational extensions: SCD2 history build/apply, as-of
'nearest' direction, and runtime-filtered joins."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import pytest

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.relational import (asof_join, scd2_apply,
                                                      scd2_build)


def _ts(s):
    return datetime.fromisoformat(s)


def _changes(spark):
    rows = [
        # key 1: A -> A (restated, no new version) -> B
        (1, _ts("2024-01-01T00:00:00"), "A", 10.0),
        (1, _ts("2024-02-01T00:00:00"), "A", 10.0),
        (1, _ts("2024-03-01T00:00:00"), "B", 12.0),
        # key 2: single version
        (2, _ts("2024-01-15T00:00:00"), "X", 5.0),
    ]
    return SparkFrame(spark.createDataFrame(
        rows, "k int, ts timestamp, status string, price double"))


def test_scd2_build_versions_and_collapse(spark):
    hist = scd2_build(_changes(spark), "k", "ts", ["status", "price"]).spark_df
    got = {(r.k, r.version): r for r in hist.collect()}
    assert len(got) == 3  # restated A collapsed
    v1 = got[(1, 1)]
    assert v1.status == "A" and v1.valid_to == _ts("2024-03-01T00:00:00")
    assert not v1.is_current
    v2 = got[(1, 2)]
    assert v2.status == "B" and v2.valid_to is None and v2.is_current
    assert got[(2, 1)].is_current


def test_scd2_build_tiebreak_deterministic(spark):
    rows = [(1, _ts("2024-01-01T00:00:00"), 100, "A"),
            (1, _ts("2024-01-01T00:00:00"), 200, "B")]
    df = SparkFrame(spark.createDataFrame(
        rows, "k int, ts timestamp, id int, status string"))
    hist = scd2_build(df, "k", "ts", ["status"],
                      tiebreak_col="id").spark_df.collect()
    by_ver = {r.version: r.status for r in hist}
    assert by_ver == {1: "A", 2: "B"}


def test_scd2_apply_closes_and_opens(spark):
    base = scd2_build(_changes(spark), "k", "ts", ["status", "price"])
    updates = SparkFrame(base.spark_df.sparkSession.createDataFrame(
        [(1, _ts("2024-06-01T00:00:00"), "C", 20.0),
         (3, _ts("2024-06-01T00:00:00"), "N", 1.0)],
        "k int, ts timestamp, status string, price double"))
    out = scd2_apply(base, updates, "k", "ts", ["status", "price"]).spark_df
    got = {(r.k, r.version): r for r in out.collect()}
    assert len(got) == 5
    # key 1's old current row is closed by the update
    assert got[(1, 2)].valid_to == _ts("2024-06-01T00:00:00")
    assert got[(1, 3)].status == "C" and got[(1, 3)].is_current
    # untouched key 2 passes through unchanged
    assert got[(2, 1)].is_current
    # brand-new key 3 opens at version 1
    assert got[(3, 1)].status == "N" and got[(3, 1)].is_current


def test_scd2_apply_restated_value_opens_no_version(spark):
    base = scd2_build(_changes(spark), "k", "ts", ["status", "price"])
    updates = SparkFrame(base.spark_df.sparkSession.createDataFrame(
        [(2, _ts("2024-07-01T00:00:00"), "X", 5.0)],
        "k int, ts timestamp, status string, price double"))
    out = scd2_apply(base, updates, "k", "ts", ["status", "price"]).spark_df
    k2 = [r for r in out.collect() if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current


def test_asof_nearest_picks_closer_side(spark):
    left = SparkFrame(spark.createDataFrame(
        [(1, 10), (1, 14), (1, 100), (2, 5)], "k int, t int"))
    right = SparkFrame(spark.createDataFrame(
        [(1, 8, "a"), (1, 15, "b"), (2, 50, "c")], "k int, t int, v string"))
    out = asof_join(left, right, on="t", by="k",
                    direction="nearest").spark_df
    got = {(r.k, r.t): r.r_v for r in out.collect()}
    assert got[(1, 10)] == "a"    # |10-8|=2 < |10-15|=5
    assert got[(1, 14)] == "b"    # forward closer
    assert got[(1, 100)] == "b"   # no forward candidate
    assert got[(2, 5)] == "c"     # no backward candidate


def test_asof_nearest_tie_prefers_backward(spark):
    left = SparkFrame(spark.createDataFrame([(1, 10)], "k int, t int"))
    right = SparkFrame(spark.createDataFrame(
        [(1, 8, "back"), (1, 12, "fwd")], "k int, t int, v string"))
    out = asof_join(left, right, on="t", by="k",
                    direction="nearest").spark_df.collect()
    assert out[0].r_v == "back"


def test_asof_nearest_exact_match_wins(spark):
    left = SparkFrame(spark.createDataFrame([(1, 10)], "k int, t int"))
    right = SparkFrame(spark.createDataFrame(
        [(1, 10, "exact"), (1, 9, "near")], "k int, t int, v string"))
    out = asof_join(left, right, on="t", by="k",
                    direction="nearest").spark_df.collect()
    assert out[0].r_v == "exact"


def test_asof_nearest_unkeyed_rejected(spark):
    left = SparkFrame(spark.createDataFrame([(1, 10)], "k int, t int"))
    with pytest.raises(ValueError):
        asof_join(left, left, on="t", direction="nearest")


def test_asof_nearest_single_exchange(spark):
    """Both fills share the hash partitioning on `by`: the plan must have
    exactly one Exchange for the window work (plus at most the scans)."""
    left = SparkFrame(spark.createDataFrame(
        [(1, 10), (1, 14)], "k int, t int"))
    right = SparkFrame(spark.createDataFrame(
        [(1, 8, "a")], "k int, t int, v string"))
    out = asof_join(left, right, on="t", by="k",
                    direction="nearest").spark_df
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_scd2_apply_untouched_keys_skip_window(spark):
    """The anti-join fast path: untouched history must not pass through
    the rebuild window (its plan branch has no Window node)."""
    base = scd2_build(_changes(spark), "k", "ts", ["status", "price"])
    updates = SparkFrame(base.spark_df.sparkSession.createDataFrame(
        [(1, _ts("2024-06-01T00:00:00"), "C", 20.0)],
        "k int, ts timestamp, status string, price double"))
    out = scd2_apply(base, updates, "k", "ts", ["status", "price"]).spark_df
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one rebuild branch with windows, one untouched branch joined anti
    assert "LeftAnti" in plan or "LEFT ANTI" in plan.upper()


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------

def test_incremental_merge_equals_full_recompute(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import (
        incremental_agg_build, incremental_agg_merge)

    rows = [(i % 7, float(i) * 1.25) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    base = df.filter(F.col("v") < 800)
    delta = df.filter(F.col("v") >= 800)
    merged = incremental_agg_merge(
        incremental_agg_build(base, "k", ["v"]),
        incremental_agg_build(delta, "k", ["v"]),
        "k", ["v"]).spark_df
    full = incremental_agg_build(df, "k", ["v"]).spark_df
    assert merged.subtract(full).count() == 0
    assert full.subtract(merged).count() == 0


def test_incremental_merge_is_slim(spark):
    # the merge plan never rescans raw inputs: both sides are partials
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import (
        incremental_agg_build, incremental_agg_merge)

    df = spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 4.0)], ["k", "v"])
    p = incremental_agg_build(df, "k", ["v"]).spark_df
    out = incremental_agg_merge(p, p, "k", ["v"]).spark_df.collect()
    got = {r["k"]: (r["cnt"], float(r["sum_v"]), r["min_v"], r["max_v"])
           for r in out}
    assert got == {1: (4, 10.0, 2.0, 3.0), 2: (2, 8.0, 4.0, 4.0)}


# ---------------------------------------------------------------------------
# resample + gap fill
# ---------------------------------------------------------------------------

def _ts_df(spark):
    from pyspark.sql import functions as F
    return spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0),
         ("a", "2024-01-01 03:20:00", 2.0),
         ("b", "2024-01-01 01:05:00", 5.0)],
        "k string, ts string, v double").withColumn(
            "ts", F.to_timestamp("ts"))


def test_resample_zero_fill_densifies_grid(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import resample_fill
    out = resample_fill(_ts_df(spark), "ts", "1 hour", ["k"],
                        {"n": F.count(F.lit(1))}, fill="zero").spark_df
    rows = {(r["k"], str(r["bucket"])): r["n"] for r in out.collect()}
    assert rows[("a", "2024-01-01 01:00:00")] == 0
    assert rows[("a", "2024-01-01 02:00:00")] == 0
    assert rows[("a", "2024-01-01 03:00:00")] == 1
    assert len([k for k in rows if k[0] == "a"]) == 4
    assert len([k for k in rows if k[0] == "b"]) == 1


def test_resample_ffill_carries_last_value(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import resample_fill
    out = resample_fill(_ts_df(spark), "ts", "1 hour", ["k"],
                        {"s": F.sum("v")}, fill="ffill").spark_df
    rows = {(r["k"], str(r["bucket"])): r["s"] for r in out.collect()}
    assert rows[("a", "2024-01-01 01:00:00")] == 1.0
    assert rows[("a", "2024-01-01 02:00:00")] == 1.0
    assert rows[("a", "2024-01-01 03:00:00")] == 2.0


def test_cohort_retention_matrix(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import cohort_retention
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"),
        (1, "2024-01-03 10:00:00"),
        (2, "2024-01-01 12:00:00"),
        (3, "2024-01-02 09:00:00"), (3, "2024-01-03 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r["cohort"]), r["offset"]): r["n_users"] for r in
           cohort_retention(df, granularity="day").spark_df.collect()}
    # cohort Jan-1: users 1,2 on day 0; only user 1 on days 1,2
    assert out[("2024-01-01 00:00:00", 0)] == 2
    assert out[("2024-01-01 00:00:00", 1)] == 1
    assert out[("2024-01-01 00:00:00", 2)] == 1
    # cohort Jan-2: user 3 on days 0,1
    assert out[("2024-01-02 00:00:00", 0)] == 1
    assert out[("2024-01-02 00:00:00", 1)] == 1


def test_rolling_zscore_flags_spike(spark):
    from pyspark.sql import functions as F
    from cl_data_frame_spark.operators.relational import rolling_zscore
    rows = [(1, i, f"2024-01-01 {h:02d}:00:00", 10.0 + (i % 3))
            for i, h in enumerate(range(10))]
    rows.append((1, 99, "2024-01-01 11:00:00", 500.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r for r in
           rolling_zscore(df, days=7).spark_df.collect()}
    assert out[99]["is_anomaly"] is True
    assert all(out[i]["is_anomaly"] is not True for i in range(10))
    # first event of a key has no std yet
    assert out[0]["roll_std"] is None


def test_table_diff_classifies_changes(spark):
    from cl_data_frame_spark.operators.relational import table_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], ["k", "v"])
    out = {r["k"]: r["change_type"] for r in
           table_diff(old, new, "k").spark_df.collect()}
    # 1 deleted, 2 unchanged (absent), 3 updated, 4 inserted
    assert out == {1: "delete", 3: "update", 4: "insert"}


def test_rolling_zscore_constant_window_gated(spark):
    """A trailing window of n>1 IDENTICAL values has zero variance: the
    z-score must be NULL and is_anomaly False (NOT NULL) — Spark's
    non-ANSI divide would otherwise leak NULL flags while an IEEE engine
    produced Inf/NaN (ADVICE round 4)."""
    from cl_data_frame_spark.operators.relational import rolling_zscore
    rows = [(i, _ts(f"2024-01-0{d} 12:00:00"), 1, 5.0)
            for i, d in enumerate([1, 2, 3], start=1)]
    rows.append((4, _ts("2024-01-04 12:00:00"), 1, 50.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    out = {r["event_id"]: r for r in rolling_zscore(
        df, days=7, z_threshold=3.0).spark_df.collect()}
    # events 2,3: n>1 but window is constant -> std 0, gated
    for eid in (2, 3):
        assert out[eid]["roll_std"] == 0.0
        assert out[eid]["zscore"] is None
        assert out[eid]["is_anomaly"] is False
    # first event: n=1 -> everything NULL as before
    assert out[1]["roll_std"] is None and out[1]["is_anomaly"] is None
    # the jump event has a real z-score
    assert out[4]["zscore"] is not None


def test_table_diff_injective_fingerprint(spark):
    """Separator/sentinel bytes inside values must not collide: the
    per-column md5 encoding classifies ('a\\x01b','c') vs ('a','b\\x01c')
    as update, and a literal '\\x00' value vs NULL as update."""
    from cl_data_frame_spark.operators.relational import table_diff
    old = spark.createDataFrame(
        [(1, "a\x01b", "c"), (2, "\x00", "x"), (3, "same", "same")],
        "k long, c1 string, c2 string")
    new = spark.createDataFrame(
        [(1, "a", "b\x01c"), (2, None, "x"), (3, "same", "same")],
        "k long, c1 string, c2 string")
    out = {r["k"]: r["change_type"]
           for r in table_diff(old, new, "k").spark_df.collect()}
    assert out.get(1) == "update"
    assert out.get(2) == "update"
    assert 3 not in out


def test_conversion_attribution_first_last_touch(spark):
    from cl_data_frame_spark.operators import relational as R
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view(1) click(2) purchase(3) view(4) purchase(5)
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase"),
        (4, t0 + dt.timedelta(minutes=3), 1, "view"),
        (5, t0 + dt.timedelta(minutes=4), 1, "purchase"),
        # user 2: purchase with no prior touch (error doesn't count)
        (6, t0, 2, "error"),
        (7, t0 + dt.timedelta(minutes=1), 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type"])
    out = {r["event_id"]: r for r in
           R.conversion_attribution(df).spark_df.collect()}
    assert set(out) == {3, 5, 7}
    assert (out[3]["first_touch_id"], out[3]["last_touch_id"]) == (1, 2)
    assert out[3]["last_touch_type"] == "click"
    # second conversion: first touch is STILL the very first view (full
    # user history), last touch is the view after the prior purchase
    assert (out[5]["first_touch_id"], out[5]["last_touch_id"]) == (1, 4)
    assert out[5]["last_touch_type"] == "view"
    assert out[7]["first_touch_id"] is None
    assert out[7]["last_touch_type"] is None


def test_conversion_attribution_tie_breaks_on_event_id(spark):
    from cl_data_frame_spark.operators import relational as R
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(10, t0, 1, "view"), (11, t0, 1, "click"),
            (12, t0, 1, "purchase")]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type"])
    row = R.conversion_attribution(df).spark_df.collect()[0]
    assert row["first_touch_id"] == 10 and row["last_touch_id"] == 11


def test_scd2_lookup_point_in_time(spark):
    from cl_data_frame_spark.operators import relational as R
    import datetime as dt
    changes = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), 10, "A"),
         (1, dt.datetime(2020, 6, 1), 11, "B"),
         (1, dt.datetime(2021, 1, 1), 12, "C"),
         (2, dt.datetime(2020, 3, 1), 13, "X")],
        ["k", "ts", "id", "attr"])
    hist = R.scd2_build(changes, "k", "ts", ["attr"],
                        tiebreak_col="id").spark_df
    probes = spark.createDataFrame(
        [(1, dt.datetime(2020, 7, 15)),   # inside version B
         (1, dt.datetime(2020, 6, 1)),    # boundary: valid_from inclusive
         (1, dt.datetime(2019, 1, 1)),    # before history -> no match
         (2, dt.datetime(2030, 1, 1))],   # open current version
        ["k", "pts"])
    out = [(r["k"], r["pts"], r["attr"])
           for r in R.scd2_lookup(hist, probes, "k", "pts")
           .spark_df.collect()]
    got = sorted(out)
    assert got == sorted([
        (1, __import__("datetime").datetime(2020, 7, 15), "B"),
        (1, __import__("datetime").datetime(2020, 6, 1), "B"),
        (2, __import__("datetime").datetime(2030, 1, 1), "X")])


def test_scd2_lookup_valid_to_exclusive(spark):
    from cl_data_frame_spark.operators import relational as R
    import datetime as dt
    changes = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), 1, "old"),
         (1, dt.datetime(2021, 1, 1), 2, "new")],
        ["k", "ts", "id", "attr"])
    hist = R.scd2_build(changes, "k", "ts", ["attr"],
                        tiebreak_col="id").spark_df
    probes = spark.createDataFrame(
        [(1, dt.datetime(2021, 1, 1))], ["k", "pts"])
    out = R.scd2_lookup(hist, probes, "k", "pts").spark_df.collect()
    # exactly ONE version matches at the boundary: closed-open intervals
    assert len(out) == 1 and out[0]["attr"] == "new"


def test_event_transitions_counts_and_probs(spark):
    from cl_data_frame_spark.operators import relational as R
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    seqs = {1: ["a", "b", "a", "b"], 2: ["a", "b", "c"], 3: ["c"]}
    rows = []
    eid = 0
    for u, types in seqs.items():
        for i, ty in enumerate(types):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, ty))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type"])
    out = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
           for r in R.event_transitions(df).spark_df.collect()}
    # transitions: u1 a>b, b>a, a>b; u2 a>b, b>c; u3 none
    assert out[("a", "b")] == (3, 1.0)
    assert out[("b", "a")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)
    assert len(out) == 3


def test_bloom_semi_filter_superset_and_determinism(spark):
    from cl_data_frame_spark.operators import relational as R
    probe = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(0, 2000, 40)],
                                  ["k"])
    passed = sorted(r["k"] for r in R.bloom_semi_filter(
        probe, build, "k").spark_df.collect())
    exact = set(range(0, 2000, 40))
    assert exact.issubset(set(passed))        # no false negatives, ever
    assert len(passed) < 2000                 # filter actually filters
    again = sorted(r["k"] for r in R.bloom_semi_filter(
        probe, build, "k").spark_df.collect())
    assert passed == again                    # deterministic pass set


def test_bloom_semi_filter_fp_rate_shrinks_with_bits(spark):
    from cl_data_frame_spark.operators import relational as R
    probe = spark.createDataFrame([(i,) for i in range(4000)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    small = R.bloom_semi_filter(probe, build, "k",
                                m_bits=1024).spark_df.count()
    big = R.bloom_semi_filter(probe, build, "k",
                              m_bits=65536).spark_df.count()
    assert big <= small
    assert big - 50 <= 40     # FP count tiny at 64k bits for n=50


def test_bloom_semi_filter_plan_broadcasts_no_probe_shuffle(spark):
    from cl_data_frame_spark.operators import relational as R
    probe = spark.range(1000).select(F.col("id").alias("k"))
    build = spark.range(10).select(F.col("id").alias("k"))
    p = (R.bloom_semi_filter(probe, build, "k").spark_df
         ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_cdc_apply_inverts_table_diff(spark):
    """apply(old, feed(old->new)) == new — the CDC round-trip
    invariant: a feed built from table_diff's classification plus the
    new-side after-images reconstructs the new snapshot exactly."""
    from cl_data_frame_spark.operators import relational as R
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")],
        ["k", "v", "s"])
    new = spark.createDataFrame(
        [(1, 10.0, "A"),      # unchanged
         (2, 25.0, "B"),      # update
         (4, 40.0, "D")],     # insert; key 3 deleted
        ["k", "v", "s"])
    diff = R.table_diff(old, new, "k").spark_df
    feed = (diff.join(new, on="k", how="left")
            .select("k", "v", "s",
                    F.col("change_type").alias("op")))
    applied = R.cdc_apply(old, feed, "k").spark_df
    assert sorted(tuple(r) for r in applied.collect()) == \
        sorted(tuple(r) for r in new.collect())


def test_table_checksum_order_and_partition_invariant(spark):
    from cl_data_frame_spark.operators import relational as R
    rows = [(i, f"s{i}") for i in range(500)]
    a = spark.createDataFrame(rows, ["k", "s"])
    b = spark.createDataFrame(list(reversed(rows)), ["k", "s"]) \
        .repartition(13)
    ca = R.table_checksum(a).spark_df.collect()[0]
    cb = R.table_checksum(b).spark_df.collect()[0]
    assert tuple(ca) == tuple(cb)
    # a single changed value must change the checksum
    c = spark.createDataFrame(
        [(0, "CHANGED")] + rows[1:], ["k", "s"])
    cc = R.table_checksum(c).spark_df.collect()[0]
    assert tuple(cc) != tuple(ca)
    assert cc["n_rows"] == ca["n_rows"]


def test_grouping_sets_with_grouping_id(spark):
    from cl_data_frame_spark.operators import relational as R
    import pytest
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], ["g1", "g2", "v"])
    out = {(r["g1"], r["g2"], r["gid"]): r["s"]
           for r in R.group_agg(df, ["g1", "g2"], {
               "s": F.sum("v"), "gid": F.grouping_id()},
               kind="grouping_sets",
               sets=[["g1", "g2"], ["g2"], []]).spark_df.collect()}
    assert out[("a", "x", 0)] == 1 and out[("b", "x", 0)] == 3
    assert out[(None, "x", 2)] == 4      # g1 aggregated away -> bit set
    assert out[(None, "y", 2)] == 2
    assert out[(None, None, 3)] == 6     # grand total
    assert ("a", None, 1) not in out     # (g1) alone is NOT a set
    with pytest.raises(ValueError):
        R.group_agg(df, ["g1"], {"s": F.sum("v")}, kind="grouping_sets")


def test_merge_intervals_islands(spark):
    from cl_data_frame_spark.operators.relational import merge_intervals
    rows = [
        # key 1: [0,10] overlaps [5,12]; [12,15] TOUCHES (merged, not >);
        # [20,25] separate; [21,22] contained
        (1, 0, 10), (1, 5, 12), (1, 12, 15), (1, 20, 25), (1, 21, 22),
        # key 2: single interval
        (2, 100, 110),
    ]
    df = SparkFrame(spark.createDataFrame(rows, "k int, s int, e int"))
    got = {(r.k, r.island_id): (r.island_start, r.island_end,
                                r.n_intervals)
           for r in merge_intervals(df, "k", "s", "e").spark_df.collect()}
    assert got[(1, 1)] == (0, 15, 3)       # touching end==start merges
    assert got[(1, 2)] == (20, 25, 2)      # contained interval absorbed
    assert got[(2, 1)] == (100, 110, 1)
    assert len(got) == 3


def test_ewma_matches_pandas_adjusted(spark):
    import pandas as pd
    from cl_data_frame_spark.operators.relational import ewma
    vals = [1.0, 2.0, 4.0, 8.0, 3.0]
    rows = [(1, i, datetime(2024, 1, 1, 0, i), v)
            for i, v in enumerate(vals)]
    df = SparkFrame(spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"))
    # k=8 > len(vals): truncation inactive -> exact pandas adjust=True
    got = {r.event_id: r.ewma
           for r in ewma(df, alpha=0.3, k=8).spark_df.collect()}
    want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[i] - round(want[i], 6)) < 1e-9


def test_ewma_truncates_at_k_lags(spark):
    from cl_data_frame_spark.operators.relational import ewma
    vals = [100.0, 1.0, 1.0]
    rows = [(1, i, datetime(2024, 1, 1, 0, i), v)
            for i, v in enumerate(vals)]
    df = SparkFrame(spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"))
    got = {r.event_id: r.ewma
           for r in ewma(df, alpha=0.5, k=2).spark_df.collect()}
    # at t=2 the window holds only [1.0, 1.0]; the 100.0 fell out of k=2
    assert got[2] == 1.0


def test_trailing_active_users_windowed_distinct(spark):
    from cl_data_frame_spark.operators.relational import (
        trailing_active_users)
    rows = [
        (1, datetime(2024, 1, 1, 5)), (2, datetime(2024, 1, 2, 6)),
        (1, datetime(2024, 1, 2, 7)),           # dup user within window
        (3, datetime(2024, 1, 10, 8)),          # far past the window
    ]
    df = SparkFrame(spark.createDataFrame(
        rows, "user_id int, ts timestamp"))
    got = {r.obs_day.day: r.active_users
           for r in trailing_active_users(df, days=3).spark_df.collect()}
    # only days WITH activity appear
    assert set(got) == {1, 2, 10}
    assert got[1] == 1          # user 1
    assert got[2] == 2          # users 1, 2 (dedup'd across events)
    assert got[10] == 1         # window [8, 10] sees only user 3


def test_rolling_median_window_and_robustness(spark):
    from cl_data_frame_spark.operators.relational import rolling_median
    vals = [1.0, 1.0, 100.0, 1.0, 1.0]
    rows = [(1, i, datetime(2024, 1, 1, 0, i), v)
            for i, v in enumerate(vals)]
    df = SparkFrame(spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"))
    got = {r.event_id: r.roll_median
           for r in rolling_median(df, k=3).spark_df.collect()}
    # the 100.0 outlier never moves the median of any 3-row window
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}


def test_top_paths_discovers_dominant_journey(spark):
    from cl_data_frame_spark.operators.relational import top_paths
    base = datetime(2024, 1, 1, 9)
    rows = []
    eid = 0
    # 3 users follow view>click>buy; 1 user follows view>view>view;
    # session gaps split a 4th user's events into two 1-event sessions
    for u in (1, 2, 3):
        for j, t in enumerate(["view", "click", "buy"]):
            rows.append((u, eid, base.replace(minute=j), t)); eid += 1
    for j in range(3):
        rows.append((4, eid, base.replace(minute=j), "view")); eid += 1
    rows.append((5, eid, base, "login")); eid += 1
    rows.append((5, eid, base.replace(hour=15), "login")); eid += 1
    df = SparkFrame(spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, event_type string"))
    got = {r.path: r.n_sessions
           for r in top_paths(df, depth=3, k=10).spark_df.collect()}
    assert got["view>click>buy"] == 3
    assert got["view>view>view"] == 1
    assert got["login"] == 2          # two single-event sessions


# --- interval-overlap join (round 6) ----------------------------------------

def _overlap_fixture(spark):
    # spans of wildly different lengths so intervals explode into 1..60
    # grid buckets; several pairs overlap across MANY shared buckets,
    # exercising the exactly-once anchor
    lrows = [(1, 0.0, 10.0), (2, 5.0, 300.0), (3, 250.0, 260.0),
             (4, 500.0, 501.0), (5, -50.0, -10.0)]
    rrows = [(10, 8.0, 12.0), (11, 100.0, 290.0), (12, 255.0, 256.0),
             (13, 600.0, 700.0), (14, -20.0, 5.0)]
    l = SparkFrame(spark.createDataFrame(
        lrows, "lid bigint, l_lo double, l_hi double"))
    r = SparkFrame(spark.createDataFrame(
        rrows, "rid bigint, r_lo double, r_hi double"))
    return l, r, lrows, rrows


def test_interval_overlap_join_matches_naive_quadratic(spark):
    from cl_data_frame_spark.operators.relational import \
        interval_overlap_join
    l, r, lrows, rrows = _overlap_fixture(spark)
    expected = {(a, b) for a, lo1, hi1 in lrows for b, lo2, hi2 in rrows
                if lo1 < hi2 and lo2 < hi1}
    for w in (5.0, 50.0, 1000.0):  # pair output must be width-invariant
        got = [(row.lid, row.rid) for row in
               interval_overlap_join(l, r, "l_lo", "l_hi",
                                     "r_lo", "r_hi", bucket_width=w)
               .spark_df.collect()]
        assert sorted(got) == sorted(expected), w  # exactly once each


def test_interval_overlap_join_is_bucket_equi_join(spark):
    """Plan shape: a hash-partitioned equi-join on the grid bucket —
    never a CartesianProduct or a data-sized nested-loop broadcast."""
    from cl_data_frame_spark.operators.relational import \
        interval_overlap_join
    l, r, _, _ = _overlap_fixture(spark)
    p = (interval_overlap_join(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
                               bucket_width=50.0)
         .spark_df._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
            or "BroadcastHashJoin" in p)


def test_interval_overlap_join_keyed(spark):
    """Equality keys join the bucket key: only same-user intervals
    pair, key columns appear once, exactly-once anchoring holds."""
    from cl_data_frame_spark.operators.relational import \
        interval_overlap_join
    lrows = [("u1", 1, 0.0, 100.0), ("u1", 2, 90.0, 95.0),
             ("u2", 3, 0.0, 100.0)]
    rrows = [("u1", 10, 50.0, 150.0), ("u2", 11, 200.0, 300.0),
             ("u3", 12, 0.0, 1000.0)]
    l = SparkFrame(spark.createDataFrame(
        lrows, "user string, lid bigint, l_lo double, l_hi double"))
    r = SparkFrame(spark.createDataFrame(
        rrows, "user string, rid bigint, r_lo double, r_hi double"))
    out = interval_overlap_join(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
                                bucket_width=25.0, on="user")
    rows = out.spark_df.collect()
    got = sorted((row.user, row.lid, row.rid) for row in rows)
    # u1 intervals overlap u1's [50,150); u2's [0,100) misses [200,300);
    # u3 has no left side at all
    assert got == [("u1", 1, 10), ("u1", 2, 10)]
    assert rows[0].__fields__.count("user") == 1  # key emitted once


def test_acf_alternating_and_constant_series(spark):
    from cl_data_frame_spark.operators.relational import acf
    # u1: perfectly alternating -1/+1 -> acf(1) = -1, acf(2) = +1
    # u2: constant -> zero variance -> NULL acf
    rows = ([(1, i, float(1 if i % 2 == 0 else -1))
             for i in range(40)]
            + [(2, i, 5.0) for i in range(10)])
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, "
                                     "value double")
    from pyspark.sql import functions as F
    df = df.withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    out = {(r.user_id, r.lag): r for r in
           acf(df, max_lag=2).spark_df.collect()}
    assert abs(out[(1, 1)].acf - (-39 / 40)) < 0.02   # ~ -(n-1)/n
    assert out[(1, 2)].acf > 0.9
    assert out[(1, 1)].n_pairs == 39
    assert out[(2, 1)].acf is None                     # zero variance


def test_acf_matches_numpy_definition(spark):
    from cl_data_frame_spark.operators.relational import acf
    import random
    rng = random.Random(3)
    xs = [0.0]
    for _ in range(199):
        xs.append(0.8 * xs[-1] + rng.gauss(0, 1))      # AR(1), phi=0.8
    rows = [(7, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, "
                                     "value double")
    from pyspark.sql import functions as F
    df = df.withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    got = {r.lag: r.acf for r in acf(df, max_lag=3).spark_df.collect()}
    m = sum(xs) / len(xs)
    den = sum((x - m) ** 2 for x in xs)
    for j in (1, 2, 3):
        want = sum((xs[t] - m) * (xs[t - j] - m)
                   for t in range(j, len(xs))) / den
        assert abs(got[j] - want) < 1e-4, j
    assert got[1] > 0.6                                # AR(1) memory


# --- as-of tolerance (round 6; pandas merge_asof semantics) -----------------

def test_asof_tolerance_keyed_backward(spark):
    from cl_data_frame_spark.operators.relational import asof_join
    left = SparkFrame(spark.createDataFrame(
        [(1, 10.0), (1, 100.0), (2, 5.0)], "k bigint, t double"))
    right = SparkFrame(spark.createDataFrame(
        [(1, 8.0, "a"), (1, 50.0, "b"), (2, 1.0, "c")],
        "k bigint, t double, v string"))
    out = {(r.k, r.t): r.r_v for r in
           asof_join(left, right, "t", by="k",
                     tolerance=10.0).spark_df.collect()}
    assert out[(1, 10.0)] == "a"      # dist 2 <= 10
    assert out[(1, 100.0)] is None    # nearest backward is 50, dist 50
    assert out[(2, 5.0)] == "c"       # dist 4
    # no tolerance: the stale match comes back
    full = {(r.k, r.t): r.r_v for r in
            asof_join(left, right, "t", by="k").spark_df.collect()}
    assert full[(1, 100.0)] == "b"


def test_asof_tolerance_unkeyed_and_nearest(spark):
    from cl_data_frame_spark.operators.relational import asof_join
    left = SparkFrame(spark.createDataFrame(
        [(i, float(i * 10)) for i in range(20)], "id bigint, t double"))
    right = SparkFrame(spark.createDataFrame(
        [(float(t), f"q{t}") for t in (5, 95, 170)],
        "t double, v string"))
    un = {r.id: r.r_v for r in
          asof_join(left, right, "t",
                    tolerance=20.0).spark_df.collect()}
    assert un[0] is None              # t=0: backward match none
    assert un[1] == "q5"              # t=10, dist 5
    assert un[5] is None              # t=50, last quote 5 -> dist 45
    assert un[10] == "q95"            # t=100, dist 5
    # nearest with tolerance (keyed): t=50's nearest quote is 5 or 95,
    # both at distance 45 > 20 -> NULL; t=100 snaps to 95 (dist 5)
    lk = SparkFrame(left.spark_df.withColumn("k", F.lit(1)))
    rk = SparkFrame(right.spark_df.withColumn("k", F.lit(1)))
    near = {r.id: r.r_v for r in
            asof_join(lk, rk, "t", by="k", direction="nearest",
                      tolerance=20.0).spark_df.collect()}
    assert near[5] is None
    assert near[10] == "q95"
    assert near[0] == "q5"            # t=0 forward match, dist 5


def test_resample_linear_interpolation(spark):
    from cl_data_frame_spark.operators.relational import resample_fill
    rows = [("a", _ts("2024-01-01T00:00:00"), 10.0),
            ("a", _ts("2024-01-01T04:00:00"), 50.0),
            ("a", _ts("2024-01-01T06:00:00"), 20.0)]
    df = SparkFrame(spark.createDataFrame(
        rows, "k string, ts timestamp, v double"))
    out = {r.bucket.hour: r.v for r in
           resample_fill(df, "ts", "1 hour", ["k"],
                         aggs={"v": F.max("v")},
                         fill="linear").spark_df.collect()}
    assert out[0] == 10.0 and out[4] == 50.0 and out[6] == 20.0
    assert out[1] == 20.0 and out[2] == 30.0 and out[3] == 40.0
    assert out[5] == 35.0                       # midpoint of 50 -> 20


def test_resample_bfill(spark):
    from cl_data_frame_spark.operators.relational import resample_fill
    rows = [("a", _ts("2024-01-01T00:00:00"), 1.0),
            ("a", _ts("2024-01-01T03:00:00"), 9.0)]
    df = SparkFrame(spark.createDataFrame(
        rows, "k string, ts timestamp, v double"))
    out = {r.bucket.hour: r.v for r in
           resample_fill(df, "ts", "1 hour", ["k"],
                         aggs={"v": F.max("v")},
                         fill="bfill").spark_df.collect()}
    assert out == {0: 1.0, 1: 9.0, 2: 9.0, 3: 9.0}


def test_interval_overlap_join_degenerate_and_boundary(spark):
    """ADVICE r6: empty intervals [x, x) overlap nothing under
    half-open semantics (and must not generate descending bucket
    sequences on a grid boundary); boundary-ending intervals on
    large-magnitude domains (epoch micros) replicate into exactly
    the buckets they touch — no epsilon underflow."""
    from cl_data_frame_spark.operators.relational import \
        interval_overlap_join
    # [5,5) is empty — even though 5 sits inside [4,6), no match;
    # [10,10) sits exactly on a bucket boundary of width 5
    l = SparkFrame(spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 10.0, 10.0), (3, 4.5, 5.5)],
        "lid bigint, l_lo double, l_hi double"))
    r = SparkFrame(spark.createDataFrame(
        [(10, 4.0, 6.0)], "rid bigint, r_lo double, r_hi double"))
    got = sorted((row.lid, row.rid) for row in
                 interval_overlap_join(l, r, "l_lo", "l_hi",
                                       "r_lo", "r_hi", bucket_width=5.0)
                 .spark_df.collect())
    assert got == [(3, 10)]
    # epoch-micros magnitude, intervals ending exactly on the grid:
    # [T, T+w) must touch exactly ONE bucket (1e-9 epsilon would
    # underflow and leak it into a second)
    T = 1_700_000_000_000_000.0           # ~2023 in epoch micros
    w = 1_000_000.0                        # 1-second grid
    lb = SparkFrame(spark.createDataFrame(
        [(1, T, T + w)], "lid bigint, l_lo double, l_hi double"))
    rb = SparkFrame(spark.createDataFrame(
        [(10, T, T + w), (11, T + w, T + 2 * w)],
        "rid bigint, r_lo double, r_hi double"))
    got2 = sorted((row.lid, row.rid) for row in
                  interval_overlap_join(lb, rb, "l_lo", "l_hi",
                                        "r_lo", "r_hi", bucket_width=w)
                  .spark_df.collect())
    assert got2 == [(1, 10)]              # half-open: no touch-match


def test_asof_tolerance_atomic_row_semantics(spark):
    """ADVICE r6: the matched right row is ATOMIC (pandas merge_asof):
    a NULL column in the nearest right row stays NULL — it must not
    backfill from an older, possibly out-of-tolerance row."""
    from cl_data_frame_spark.operators.relational import asof_join
    left = SparkFrame(spark.createDataFrame(
        [(1, 100.0)], "k bigint, t double"))
    # older row (t=10, out of tolerance) has v='old'; nearest row
    # (t=99, in tolerance) has v=NULL
    right = SparkFrame(spark.createDataFrame(
        [(1, 10.0, "old", 1.0), (1, 99.0, None, 2.0)],
        "k bigint, t double, v string, p double"))
    row = asof_join(left, right, "t", by="k",
                    tolerance=5.0).spark_df.first()
    assert row["r_p"] == 2.0        # from the matched row
    assert row["r_v"] is None       # NOT backfilled from t=10
    # same contract without tolerance: whole-row, not per-column fill
    row2 = asof_join(left, right, "t", by="k").spark_df.first()
    assert row2["r_p"] == 2.0 and row2["r_v"] is None
    # unkeyed path: same atomic semantics
    row3 = asof_join(SparkFrame(left.spark_df.drop("k")),
                     SparkFrame(right.spark_df.drop("k")),
                     "t", tolerance=5.0).spark_df.first()
    assert row3["r_p"] == 2.0 and row3["r_v"] is None


def test_seasonal_decompose_recovers_components(spark):
    """Pure trend+seasonal series: the classical decomposition recovers
    both exactly (residual 0 in the interior), edges have NULL trend,
    per-key isolation holds, odd periods use the plain centered MA."""
    from cl_data_frame_spark.operators.relational import \
        seasonal_decompose
    rows = []
    for g, off in (("a", 0.0), ("b", 5.0)):
        for t in range(40):
            s = [2.0, -1.0, -2.0, 1.0][t % 4]
            rows.append((g, t, 0.5 * t + s + off))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = seasonal_decompose(df, "t", "v", period=4,
                             by=["g"]).spark_df.collect()
    a = sorted((r for r in out if r["g"] == "a"),
               key=lambda r: r["t"])
    interior = [r for r in a if r["trend"] is not None]
    assert a[0]["trend"] is None and a[-1]["trend"] is None  # edges
    for r in interior:
        assert abs(r["trend"] - 0.5 * r["t"]) < 1e-6
        assert abs(r["seasonal"]
                   - [2.0, -1.0, -2.0, 1.0][r["phase"]]) < 1e-6
        assert abs(r["residual"]) < 1e-6
    # per-key isolation: same seasonal for b despite the +5 offset
    b = [r for r in out if r["g"] == "b" and r["trend"] is not None]
    assert all(abs(r["seasonal"]
                   - [2.0, -1.0, -2.0, 1.0][r["phase"]]) < 1e-6
               for r in b)
    # odd period: plain centered MA, still zero residual on pure series
    rows5 = [("a", t, 1.0 * t + [3, 1, -1, -2, -1][t % 5])
             for t in range(30)]
    df5 = spark.createDataFrame(rows5, "g string, t int, v double")
    out5 = [r for r in seasonal_decompose(df5, "t", "v", period=5,
                                          by=["g"]).spark_df.collect()
            if r["trend"] is not None]
    assert all(abs(r["residual"]) < 1e-6 for r in out5)


def test_holt_linear_matches_reference_fold(spark):
    from cl_data_frame_spark.operators.relational import holt_linear
    series = {"a": [10.0, 12.0, 13.0, 15.0],
              "b": [100.0, 90.0, 85.0, 70.0, 65.0]}
    rows = [(g, t, v) for g, ys in series.items()
            for t, v in enumerate(ys)]
    rows.append(("solo", 0, 5.0))     # 1-point series dropped
    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {r["g"]: r for r in
           holt_linear(df, "t", "v", by=["g"], alpha=0.5, beta=0.3,
                       horizon=3).spark_df.collect()}
    assert "solo" not in got

    def ref(ys, a=0.5, b=0.3):
        l, bt = ys[0], ys[1] - ys[0]
        c1, c2 = b * a, 1 - b * a
        for y in ys[1:]:
            ln = a * y + (1 - a) * (l + bt)
            bt = c1 * (y - l) + c2 * bt
            l = ln
        return l, bt

    for g, ys in series.items():
        l, bt = ref(ys)
        assert got[g]["n"] == len(ys)
        assert abs(got[g]["level"] - round(l, 6)) < 1e-9
        assert abs(got[g]["trend"] - round(bt, 6)) < 1e-9
        assert abs(got[g]["forecast"] - round(l + 3.0 * bt, 6)) < 1e-9
    # a pure linear series forecasts exactly on the line
    lin = [(float(t), 4.0 + 2.0 * t) for t in range(30)]
    dfl = spark.createDataFrame([("l", t, v) for t, v in lin],
                                "g string, t double, v double")
    r = holt_linear(dfl, "t", "v", by=["g"], alpha=0.5, beta=0.3,
                    horizon=5).spark_df.first()
    # level converges to the last point, trend to the slope
    assert abs(r["level"] - lin[-1][1]) < 1e-3
    assert abs(r["trend"] - 2.0) < 1e-3
    assert abs(r["forecast"] - (lin[-1][1] + 10.0)) < 5e-3


def test_cusum_drift_alarms_on_mean_shift(spark):
    import random
    from cl_data_frame_spark.operators.relational import cusum_drift
    rng = random.Random(9)
    rows = []
    for t in range(200):
        rows.append(("stable", t, rng.gauss(10.0, 1.0)))
        rows.append(("shift", t,
                     rng.gauss(10.0 if t < 100 else 13.0, 1.0)))
    rows.append(("solo", 0, 1.0))          # n < 2 dropped
    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {r.g: r for r in
           cusum_drift(df, "t", "v", by=["g"]).spark_df.collect()}
    assert "solo" not in got
    assert got["shift"].alarm and not got["stable"].alarm
    assert got["shift"].max_s_plus > 10 * got["shift"].sd
    assert got["stable"].max_s_plus <= 4.0 * got["stable"].sd
    # constant series: sd = 0, S stays 0, no alarm, no crash
    const = spark.createDataFrame([("c", t, 5.0) for t in range(20)],
                                  "g string, t int, v double")
    rc = cusum_drift(const, "t", "v", by=["g"]).spark_df.first()
    assert rc.max_s_plus == 0.0 and not rc.alarm


def test_bounded_series_guard_raises_and_escapes(spark):
    """The per-key array folds enforce the bounded-series contract: a
    key over max_points_per_key raises BEFORE the collect_list
    aggregation runs; assume_bounded=True skips the pre-scan; results
    are unchanged for in-bound data."""
    import pytest
    from cl_data_frame_spark.errors import BoundedSeriesExceeded
    from cl_data_frame_spark.operators.relational import (cusum_drift,
                                                          holt_linear)
    df = spark.range(0, 500).selectExpr(
        "CASE WHEN id < 450 THEN 'hot' ELSE 'cold' END AS g",
        "cast(id as int) AS t", "cast(id % 13 as double) AS v")
    for op in (holt_linear, cusum_drift):
        with pytest.raises(BoundedSeriesExceeded, match="hot|points"):
            op(df, "t", "v", by=["g"], max_points_per_key=100)
        # unkeyed: the whole table is one series
        with pytest.raises(BoundedSeriesExceeded):
            op(df, "t", "v", max_points_per_key=100)
        # escape hatch + in-bound data agree
        a = op(df, "t", "v", by=["g"],
               max_points_per_key=100,
               assume_bounded=True).spark_df.collect()
        b = op(df, "t", "v", by=["g"]).spark_df.collect()
        key = lambda r: r.g
        assert sorted(a, key=key) == sorted(b, key=key)
