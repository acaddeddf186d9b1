"""Sub-linear version-log resolution (round 12): `_version_range`
(O(1) hint + existence binary search over the contiguous version
range), binary-searched `snapshot_version_at` / `_since`, the
newest-n `snapshot_history(limit=)`, and the no-hint listing
fallback. Pure manifest-layer tests — no Spark session needed."""

import json
import os

import pytest

from cl_data_frame_spark.sources import snapshots as S

SCHEMA = '{"type":"struct","fields":[]}'


def _log(tmp_path, n, start=1, hint=True):
    t = str(tmp_path / "log")
    os.makedirs(os.path.join(t, S._MANIFEST_DIR), exist_ok=True)
    for v in range(start, n + 1):
        with open(S._manifest_path(t, v), "w") as f:
            json.dump({"version": v,
                       "parent": v - 1 if v > start else None,
                       "operation": "append", "schema": SCHEMA,
                       "files": []}, f)
    if hint:
        S._write_latest_hint(t, n)
    return t


class TestVersionRange:
    def test_full_range(self, tmp_path):
        t = _log(tmp_path, 9)
        assert S._version_range(t) == (1, 9)
        assert S._versions(t) == list(range(1, 10))

    def test_vacuumed_prefix(self, tmp_path):
        t = _log(tmp_path, 40, start=17)
        S._write_latest_hint(t, 40)
        assert S._version_range(t) == (17, 40)
        assert S._versions(t)[0] == 17

    def test_single_survivor(self, tmp_path):
        t = _log(tmp_path, 25, start=25)
        S._write_latest_hint(t, 25)
        assert S._version_range(t) == (25, 25)

    def test_empty_table(self, tmp_path):
        t = str(tmp_path / "empty")
        os.makedirs(os.path.join(t, S._MANIFEST_DIR))
        assert S._version_range(t) is None
        assert S._versions(t) == []

    def test_no_hint_listing_fallback(self, tmp_path):
        t = _log(tmp_path, 6, hint=False)
        assert S._latest_version(t) == 6       # listing fallback
        assert S._version_range(t) == (1, 6)

    def test_stale_hint_probes_forward(self, tmp_path):
        t = _log(tmp_path, 8)
        S._write_latest_hint(t, 5)             # regressed hint
        assert S._latest_version(t) == 8


class TestVersionAtBinarySearch:
    def test_boundaries_and_interior(self, tmp_path):
        t = _log(tmp_path, 12)
        mts = [os.path.getmtime(S._manifest_path(t, v))
               for v in range(1, 13)]
        # exact commit instants resolve to their own version
        for v in (1, 6, 12):
            assert S.snapshot_version_at(t, mts[v - 1]) == v
        # an instant between commits resolves to the earlier one
        mid = (mts[3] + mts[4]) / 2
        if mts[3] < mid < mts[4]:
            assert S.snapshot_version_at(t, mid) == 4
        assert S.snapshot_version_at(t, mts[-1] + 10) == 12
        with pytest.raises(ValueError, match="history starts later"):
            S.snapshot_version_at(t, mts[0] - 10)

    def test_since_boundaries(self, tmp_path):
        t = _log(tmp_path, 9)
        mts = [os.path.getmtime(S._manifest_path(t, v))
               for v in range(1, 10)]
        assert S.snapshot_version_since(t, mts[0] - 5) == 1
        assert S.snapshot_version_since(t, mts[4]) == 5  # at = included
        assert S.snapshot_version_since(t, mts[-1] + 5) is None

    def test_at_with_vacuumed_prefix(self, tmp_path):
        t = _log(tmp_path, 30, start=11)
        S._write_latest_hint(t, 30)
        mts = {v: os.path.getmtime(S._manifest_path(t, v))
               for v in range(11, 31)}
        assert S.snapshot_version_at(t, mts[20]) == 20
        with pytest.raises(ValueError):
            S.snapshot_version_at(t, mts[11] - 10)


class TestHistoryLimit:
    def test_tail_and_full(self, tmp_path):
        t = _log(tmp_path, 14)
        h = S.snapshot_history(t, limit=4)
        assert [x["version"] for x in h] == [11, 12, 13, 14]
        assert len(S.snapshot_history(t)) == 14
        assert [x["version"] for x in S.snapshot_history(t, limit=99)] \
            == list(range(1, 15))


class TestHistoryLimitEdge:
    def test_limit_zero_returns_no_entries(self, tmp_path):
        t = _log(tmp_path, 5)
        assert S.snapshot_history(t, limit=0) == []
        assert [e["version"] for e in S.snapshot_history(t, limit=2)] \
            == [4, 5]


class TestNonMonotoneMtimeFallback:
    """Round 13 (advisor): the binary-searched timestamp resolvers
    assume commit mtimes are monotone in version. A table copied
    without mtime preservation breaks that silently — the resolvers
    now verify the boundary with one extra stat and fall back to the
    exact O(N) scan on violation."""

    def _scrambled(self, tmp_path, times):
        t = _log(tmp_path, len(times))
        for v, mt in times.items():
            os.utime(S._manifest_path(t, v), (mt, mt))
        return t

    def test_version_at_exact_under_reversed_mtimes(self, tmp_path):
        # the realistic breakage: a copy restored newest-first, so
        # mtimes DECREASE with version
        times = {v: 900.0 - v * 100.0 for v in range(1, 9)}
        t = self._scrambled(tmp_path, times)
        for ts in (95.0, 100.0, 350.0, 620.0, 900.0):
            exact = max((v for v, mt in times.items() if mt <= ts),
                        default=None)
            if exact is None:
                with pytest.raises(ValueError):
                    S.snapshot_version_at(t, ts)
            else:
                assert S.snapshot_version_at(t, ts) == exact, ts

    def test_version_since_exact_under_reversed_mtimes(self,
                                                       tmp_path):
        times = {v: 900.0 - v * 100.0 for v in range(1, 9)}
        t = self._scrambled(tmp_path, times)
        for ts in (95.0, 100.5, 350.0, 620.0, 801.0):
            exact = min((v for v, mt in times.items() if mt >= ts),
                        default=None)
            assert S.snapshot_version_since(t, ts) == exact, ts

    def test_version_at_clock_regression_bracket(self, tmp_path):
        # one commit's clock jumped back: the boundary-bracket stat
        # sees the violation and the exact scan answers
        times = {1: 100.0, 2: 200.0, 3: 150.0, 4: 400.0}
        t = self._scrambled(tmp_path, times)
        assert S.snapshot_version_at(t, 170.0) == 3
        assert S.snapshot_version_since(t, 160.0) == 2

    def test_monotone_log_untouched(self, tmp_path):
        t = _log(tmp_path, 6)
        for v in range(1, 7):
            os.utime(S._manifest_path(t, v), (100.0 + v, 100.0 + v))
        assert S.snapshot_version_at(t, 103.5) == 3
        assert S.snapshot_version_since(t, 103.5) == 4
