"""Synthetic million-file manifest benchmark (round-11 directive):
measure a COLD predicated file listing against a parquet checkpoint
at N files — streamed (`_streamed_scan_files`) vs the full-state
dict reconstruction — reporting wall time, peak driver allocation,
and checkpoint bytes.

No Spark session: this exercises only the manifest/checkpoint layer
(the part whose driver cost is at stake at 1M files).

Usage:
    python tools/ckpt_bench.py [n_files]        # default 1_000_000

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from cl_data_frame_spark.sources import snapshots as S
    t = tempfile.mkdtemp(prefix="ckpt_bench_")
    files = [f"data/v00000001-x/part-{i:08d}.parquet"
             for i in range(n)]
    state = {
        "version": 20, "parent": None, "operation": "append",
        "schema": '{"type":"struct","fields":[]}',
        "files": files,
        "stats": {f: {"k": {"min": i, "max": i, "null_count": 0}}
                  for i, f in enumerate(files)},
    }
    t0 = time.time()
    S._write_checkpoint(t, state)
    write_s = time.time() - t0
    # a delta on top so the listing exercises the overlay too
    os.makedirs(os.path.join(t, S._MANIFEST_DIR), exist_ok=True)
    with open(S._manifest_path(t, 21), "w") as f:
        json.dump({"version": 21, "parent": 20,
                   "operation": "append", "delta": 1,
                   "schema": state["schema"],
                   "add": ["data/v00000021-x/part-00000000.parquet"],
                   "stats_add": {
                       "data/v00000021-x/part-00000000.parquet":
                       {"k": {"min": 10 * n, "max": 10 * n,
                              "null_count": 0}}}}, f)
    ckpt_bytes = os.path.getsize(S._ckpt_pq_path(t, 20))
    del state
    where = [("k", "==", n // 2)]

    # wall and peak are measured in SEPARATE runs: tracemalloc
    # instruments every allocation and inflates allocation-heavy
    # paths by an order of magnitude, so timing under it would
    # charge the dict path ~10x and the streamed path ~30x
    S._STATE_CACHE.clear()
    t0 = time.time()
    got = S.snapshot_scan_files(t, 21, where=where)
    stream_s = time.time() - t0
    assert got == [files[n // 2]], got
    S._STATE_CACHE.clear()
    tracemalloc.start()
    S.snapshot_scan_files(t, 21, where=where)
    stream_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    # DNF (OR-of-conjunctions) listing: must stay on the streamed
    # path, within the same order as the single-conjunction listing
    dnf = [[("k", "==", n // 2)], [("k", ">=", n - 3)]]
    S._STATE_CACHE.clear()
    t0 = time.time()
    got2 = S.snapshot_scan_files(t, 21, where=dnf)
    dnf_s = time.time() - t0
    assert set(got2) == {files[n // 2], files[n - 3], files[n - 2],
                         files[n - 1],
                         "data/v00000021-x/part-00000000.parquet"}, \
        got2
    S._STATE_CACHE.clear()
    tracemalloc.start()
    S.snapshot_scan_files(t, 21, where=dnf)
    dnf_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    S._STATE_CACHE.clear()
    t0 = time.time()
    m = S._read_manifest(t, 21)
    dict_s = time.time() - t0
    assert len(m["files"]) == n + 1
    S._STATE_CACHE.clear()
    tracemalloc.start()
    S._read_manifest(t, 21)
    dict_peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    # STATE-CACHE BOUND (round-13 directive): the reconstructed-state
    # LRU is capped by TOTAL cached files, and a state above
    # _STATE_CACHE_ENTRY_MAX_FILES never caches at all — so repeated
    # reads of giant tables keep driver RSS flat instead of pinning
    # a deep-copied ~GB dict per table. Measured as the high-water
    # RSS after the first full reconstruction vs after 4 more: with
    # the bound they are equal (the dict is garbage after each call).
    import resource
    S._STATE_CACHE.clear()
    S._read_manifest(t, 21)
    rss_first = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for _ in range(4):
        S._read_manifest(t, 21)
    rss_repeat = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    cached_entries = len(S._STATE_CACHE)

    print(json.dumps({
        "n_files": n,
        "ckpt_bytes": ckpt_bytes,
        "ckpt_write_sec": round(write_s, 3),
        "streamed_scan_sec": round(stream_s, 3),
        "streamed_peak_mb": round(stream_peak / 1e6, 1),
        "dnf_scan_sec": round(dnf_s, 3),
        "dnf_peak_mb": round(dnf_peak / 1e6, 1),
        "dict_reconstruct_sec": round(dict_s, 3),
        "dict_peak_mb": round(dict_peak / 1e6, 1),
        "cache_entry_max_files": S._STATE_CACHE_ENTRY_MAX_FILES,
        "cache_total_max_files": S._STATE_CACHE_MAX_FILES,
        "cache_entries_after_5_reads": cached_entries,
        "rss_after_first_read_mb": round(rss_first / 1024, 1),
        "rss_after_5_reads_mb": round(rss_repeat / 1024, 1),
    }))


if __name__ == "__main__":
    main()
