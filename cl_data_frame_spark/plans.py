"""Physical-plan introspection and scalability guards — the user-facing
form of the checks `tests/test_plans.py` and `tools/plan_audit.py`
apply to the engine's own queries, so a pipeline author can assert
"this plan survives 100 TB" BEFORE running it.

The reference (`cl-data-frame.lisp`) has no optimizer or plan surface
at all; on Spark the plan IS the scalability contract, and the three
failure shapes worth guarding against are mechanical to detect:

* ``CartesianProduct`` — row-quadratic, never survives scale;
* ``BroadcastNestedLoopJoin`` beyond the one-row scalar-broadcast
  pattern (a crossJoin of a 1-row aggregate is constant-cost; a BNLJ
  against a real table is quadratic);
* a parquet scan that reads every column for a narrow projection
  (pushdown/pruning silently lost — e.g. a UDF fence).

Everything works off the EXECUTED plan string, the same stable surface
``df.explain()`` prints.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from cl_data_frame_spark.frame import SparkFrame


class PlanScalabilityError(AssertionError):
    """A plan shape that cannot survive a large input."""


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


def _plan_string(frame) -> str:
    df = _plain(frame)
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(frame) -> dict:
    """Counters over the executed plan: data ``shuffles`` (Exchange
    minus broadcast), ``broadcasts``, ``sort_merge_joins``,
    ``broadcast_hash_joins``, ``codegen_spans`` (WholeStageCodegen
    regions — wider is better), and ``cartesian`` (CartesianProduct +
    BroadcastNestedLoopJoin — the scale killers). NOTE: under AQE the
    un-executed plan may be wrapped in ``AdaptiveSparkPlan``; counts
    are then the static plan's, which AQE only improves on at runtime
    (partition coalescing, SMJ→BHJ, skew splits)."""
    p = _plan_string(frame)
    exch = p.count("Exchange")
    bcast = p.count("BroadcastExchange")
    return {
        "shuffles": exch - bcast,
        "broadcasts": bcast,
        "sort_merge_joins": p.count("SortMergeJoin"),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", p))),
        "cartesian": p.count("CartesianProduct")
        + p.count("BroadcastNestedLoopJoin"),
    }


def assert_scalable(frame, allow_bnlj: int = 0) -> dict:
    """Raise :class:`PlanScalabilityError` if the plan contains a
    CartesianProduct, or more BroadcastNestedLoopJoins than
    *allow_bnlj* (set it to the number of audited one-row
    scalar-broadcast crossJoins the query intentionally makes —
    corpus-stat literals, min/max bounds). Returns ``plan_summary``
    on success so callers can log it."""
    p = _plan_string(frame)
    if "CartesianProduct" in p:
        raise PlanScalabilityError(
            "plan contains a CartesianProduct — row-quadratic; "
            "add an equi-join key, blocking, or a broadcast hint")
    bnlj = p.count("BroadcastNestedLoopJoin")
    if bnlj > allow_bnlj:
        raise PlanScalabilityError(
            f"plan contains {bnlj} BroadcastNestedLoopJoin(s), "
            f"allowance {allow_bnlj} — a BNLJ against a real table "
            "is quadratic; only one-row scalar-broadcast crossJoins "
            "are constant-cost (raise allow_bnlj for each audited "
            "one)")
    return plan_summary(frame)


def scan_report(frame) -> list[dict]:
    """Per-scan pushdown report: for every parquet/orc scan in the
    plan, the ``PushedFilters`` list and the ``ReadSchema`` column
    names — the two things to check when a filter or projection
    mysteriously reads the whole table. Empty pushed filters on a
    filtered scan (or a ReadSchema far wider than the projection)
    means a UDF/opaque expression fenced the optimizer."""
    p = _plan_string(frame)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", p):
        entry = {"pushed_filters":
                 [f.strip() for f in m.group(1).split(",") if f.strip()]}
        tail = p[m.end():]
        rs = re.search(r"ReadSchema: struct<([^>]*)>", tail)
        if rs:
            entry["read_columns"] = [
                c.split(":")[0].strip()
                for c in rs.group(1).split(",") if c.strip()]
        out.append(entry)
    return out
