"""Property-based slice canonicalization tests (hypothesis): SparkFrame's
two-axis slice must agree with the reference cl-slice semantics — modeled
here by plain Python list indexing — for every spec shape: ints
(incl. negative), slices, ranges, int sequences (order + repeats
preserved), bool masks, and ALL."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cl_data_frame_spark.frame import ALL, df

N = 7
A = [10, 20, 30, 40, 50, 60, 70]
B = ["a", "b", "c", "d", "e", "f", "g"]

row_specs = st.one_of(
    st.just(ALL),
    st.integers(min_value=-N, max_value=N - 1),
    st.lists(st.integers(min_value=-N, max_value=N - 1),
             min_size=0, max_size=5),
    st.lists(st.booleans(), min_size=N, max_size=N),
    st.builds(slice,
              st.integers(min_value=0, max_value=N),
              st.integers(min_value=0, max_value=N)),
)


def expected_rows(spec):
    idx = list(range(N))
    if spec is ALL:
        return idx
    if isinstance(spec, slice):
        return idx[spec]
    if isinstance(spec, int):
        return [idx[spec]]
    if spec and all(isinstance(x, bool) for x in spec):
        return [i for i, b in enumerate(spec) if b]
    return [i if i >= 0 else N + i for i in spec]


_frame_cache = {}


def _frame(spark):
    if "fr" not in _frame_cache:
        _frame_cache["fr"] = df(spark, "a", A, "b", B)
    return _frame_cache["fr"]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=row_specs)
def test_row_slice_matches_list_semantics(spark, spec):
    fr = _frame(spark)
    want = expected_rows(spec)
    if isinstance(spec, int):
        got = fr.slice(spec, ["a"])     # DataVector
        assert [A.index(got["a"])] == want
        return
    out = fr.slice(spec, ALL)
    got = [A.index(v) for v in out.column("a")]
    assert got == want, f"spec={spec!r}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cols=st.lists(st.sampled_from(["a", "b", 0, 1, -1, -2]),
                     min_size=1, max_size=3, unique=True))
def test_column_slice_resolution(spark, cols):
    import pytest
    from cl_data_frame_spark.errors import DuplicateKey

    fr = _frame(spark)
    names = ["a", "b"]
    want = [c if isinstance(c, str) else names[c] for c in cols]
    if len(set(want)) != len(want):
        # two specs resolving to one key -> duplicate-key error, like the
        # reference's unique-key constraint at construction
        with pytest.raises(DuplicateKey):
            fr.slice(ALL, list(cols))
        return
    out = fr.slice(ALL, list(cols))
    assert out.keys() == want
