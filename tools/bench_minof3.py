"""Min-of-3 re-measurement of individually named bench entries under the
FROZEN bench methodology (same session confs as bench.py, same warm-up,
noop-sink execution, clearCache between samples) — the clearance tool the
round verdicts prescribe for unattributed driver-bench flags.

Usage:
    python tools/bench_minof3.py entry [entry ...] [--samples N]

Prints one line per sample and a JSON summary {entry: {"samples": [...],
"min": ...}} on stdout, suitable for pasting into README.md next to the
round's BENCH file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser(
        description="min-of-N re-measurement of named bench entries")
    ap.add_argument("entries", nargs="+", metavar="entry")
    ap.add_argument("--samples", type=int, default=3)
    ns = ap.parse_args()
    args, n_samples = ns.entries, ns.samples

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cl_data_frame_spark_bench_minof3")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -XX:ReservedCodeCacheSize=1g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in args:
        fn = qs.get(name)
        if fn is None:
            print(f"[minof3] unknown entry {name}", file=sys.stderr)
            continue
        samples = []
        for i in range(n_samples):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            samples.append(dt)
            print(f"[minof3] {name} sample {i + 1}: {dt:.2f}s",
                  file=sys.stderr)
        out[name] = {"samples": samples, "min": min(samples)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
