"""spark-submit entry point: replay/tail a change log into a CDC table.

Cluster form (SURVEY.md §3.2 / BASELINE.json deployment contract)::

    spark-submit --master <cluster> --py-files dist/cdc.zip \
        scripts/cdc_replay.py --log-dir LOG --table TABLE [options]

Local-mode examples::

    spark-submit --master 'local[8]' --py-files dist/cdc.zip \
        scripts/cdc_replay.py --log-dir /data/log --table /data/t --reps 3

Options:
    --stream              use the Structured Streaming path (AvailableNow)
    --batches-per-commit  checkpoint granularity for batch replay
    --reps N              replay N times into fresh tables (bench: first is
                          cold, min of rest is steady-state); default 1
    --json                print one machine-readable JSON result line

Prints per-rep wall seconds and events/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--batches-per-commit", type=int, default=None)
    ap.add_argument("--lww-via", default="maxby",
                    choices=["maxby", "window", "salted", "semi"])
    ap.add_argument("--mode", choices=["cow", "mor"], default="cow",
                    help="cow = rewrite touched partitions per commit; "
                         "mor = append delta layers, reconcile on read")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--layout", choices=["repo_hash", "key_hash"],
                    default="repo_hash",
                    help="key_hash: table partitions = Spark's own hash "
                         "partition of the key, so commits skip their "
                         "write repartition (one wide shuffle per commit)")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--no-metrics", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    # under spark-submit the SparkSession comes from the submit conf;
    # standalone invocation falls back to the engine's local factory
    try:
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.getOrCreate()
    except Exception:  # pragma: no cover
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "src"))
        from cdc.session import get_spark
        spark = get_spark("cdc-replay")

    from cdc.pipeline import replay
    from cdc.stream.pipeline import stream_to_table
    from cdc.table.table import CdcTable

    n_events = spark.read.option("recursiveFileLookup", "true") \
        .parquet(args.log_dir).count()

    results = []
    for i in range(args.reps):
        root = args.table if args.reps == 1 else f"{args.table}-rep{i}"
        table = CdcTable(root, n_partitions=args.partitions, layout=args.layout)
        t0 = time.monotonic()
        if args.stream:
            stream_to_table(spark, args.log_dir, table,
                            metrics=not args.no_metrics)
        else:
            replay(spark, args.log_dir, table,
                   batches_per_commit=args.batches_per_commit,
                   metrics=not args.no_metrics, mode=args.mode,
                   lww_via=args.lww_via)
        wall = time.monotonic() - t0
        results.append(wall)
        print(f"rep {i}: {wall:.2f}s  ({int(n_events / wall)} events/sec)",
              file=sys.stderr)
        if args.reps > 1 and i < args.reps - 1:
            # bench mode: drop the timed table so rep N+1 isn't measured
            # under the tmpfs/page-cache pressure of N accumulated copies
            import shutil
            shutil.rmtree(root, ignore_errors=True)

    steady = min(results[1:]) if len(results) > 1 else results[0]
    out = {
        "events": n_events,
        "reps_sec": [round(r, 3) for r in results],
        "cold_sec": round(results[0], 3),
        "steady_sec": round(steady, 3),
        "events_per_sec": int(n_events / steady),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"replayed {n_events} events: cold {out['cold_sec']}s, "
              f"steady {out['steady_sec']}s ({out['events_per_sec']} ev/s)")


if __name__ == "__main__":
    main()
