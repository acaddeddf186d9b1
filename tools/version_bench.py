"""Synthetic 100k-version log benchmark (round-12 directive):
measure the point-lookup APIs against a long history — latest
version, txn watermark, timestamp time travel, and the earliest-
version boundary — and compare against the O(#versions) listing
walk they replaced.

No Spark session: this exercises only the manifest-log layer.

Usage:
    python tools/version_bench.py [n_versions]   # default 100_000

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from cl_data_frame_spark.sources import snapshots as S
    t = tempfile.mkdtemp(prefix="version_bench_")
    mdir = os.path.join(t, S._MANIFEST_DIR)
    os.makedirs(mdir)
    schema = '{"type":"struct","fields":[]}'
    # write tiny delta manifests directly (the bench measures log
    # RESOLUTION, not publish) + a checkpoint so reads resolve
    base = {"version": 1, "parent": None, "operation": "append",
            "schema": schema, "files": ["data/a/p.parquet"],
            "txn": {"app": 1}}
    t0 = time.time()
    with open(S._manifest_path(t, 1), "w") as f:
        json.dump(base, f)
    for v in range(2, n + 1):
        with open(S._manifest_path(t, v), "w") as f:
            json.dump({"version": v, "parent": v - 1, "delta": 1,
                       "operation": "append", "schema": schema,
                       "txn": {"app": v}}, f)
    S._write_latest_hint(t, n)
    S._write_checkpoint(t, {**base, "version": n,
                            "parent": n - 1, "txn": {"app": n}})
    build_s = time.time() - t0
    mid_ts = os.path.getmtime(S._manifest_path(t, n // 2))

    def timed(fn, reps=5):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 6)

    latest_s = timed(lambda: S._latest_version(t))
    txn_s = timed(lambda: S.snapshot_txn_version(t, "app"))
    at_s = timed(lambda: S.snapshot_version_at(t, mid_ts))
    range_s = timed(lambda: S._version_range(t))
    listed_s = timed(lambda: S._versions_listed(t), reps=2)
    assert S._latest_version(t) == n
    assert S.snapshot_version_at(t, mid_ts) == n // 2
    assert S._version_range(t) == (1, n)
    print(json.dumps({
        "n_versions": n,
        "build_sec": round(build_s, 3),
        "latest_version_sec": latest_s,
        "txn_version_sec": txn_s,
        "version_at_sec": at_s,
        "version_range_sec": range_s,
        "listing_walk_sec": listed_s,
    }))


if __name__ == "__main__":
    main()
