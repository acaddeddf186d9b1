"""Python UDTF surface (SURVEY §2.2 UDF/UDAF/UDTF).

UDTF classes are defined inside the tests: cloudpickle serializes local
classes by value, so workers don't need this test module importable.
"""

from __future__ import annotations

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators.relational import apply_udtf


def test_udtf_expands_rows(spark):
    class SplitWords:
        def eval(self, doc_id, txt):
            for i, w in enumerate(txt.split()):
                yield (i, w)

    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "txt"])
    out = apply_udtf(SparkFrame(df), SplitWords, ["doc_id", "txt"],
                     "pos int, word string", carry_cols=["doc_id"])
    rows = sorted((r["doc_id"], r["pos"], r["word"])
                  for r in out.spark_df.collect())
    assert rows == [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")]


def test_udtf_stateful_generator(spark):
    class TailNgrams:
        """Stateful across yields (not explode-able as an expression)."""

        def eval(self, doc_id, txt):
            prev = None
            for w in txt.split():
                if prev is not None:
                    yield (f"{prev} {w}",)
                prev = w

    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "txt"])
    out = apply_udtf(SparkFrame(df), TailNgrams, ["doc_id", "txt"],
                     "bigram string", carry_cols=["doc_id"])
    rows = sorted(r["bigram"] for r in out.spark_df.collect())
    assert rows == ["x y", "y z"]
