"""Sharded test gate: run the pytest suite as K concurrent pytest
processes (one JVM each) and aggregate the results.

Why: the suite is LATENCY-bound, not compute-bound — a quiet-box default
run is ~18.5 min wall at ~20% CPU (hundreds of table commits, each a
handful of small Spark jobs whose scheduling/py4j round-trips dominate).
One pytest process cannot overlap that latency (no pytest-xdist in this
environment); K processes on a 32-core box can. Shards are whole test
FILES (session-scoped SparkSession per process; no cross-file state),
heavy files seeded round-robin first so shards stay balanced.

Profiles:
  python scripts/fast_gate.py              # default profile (no `slow`)
  python scripts/fast_gate.py --full       # the pre-commit gate
  python scripts/fast_gate.py --shards 2   # fewer JVMs on small boxes
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

# measured-heaviest files first (full-run --durations), so round-robin
# seeding spreads them across shards; everything else is appended
# alphabetically — deterministic, new files just join the rotation
HEAVY = [
    "tests/test_streaming.py",
    "tests/test_round4_dedup.py",
    "tests/test_round5_dedup_cdc.py",
    "tests/test_datasource.py",
    "tests/test_ann.py",
    "tests/test_table_replay.py",
    "tests/test_patch.py",
    "tests/test_index.py",
    "tests/test_alter.py",
    "tests/test_ops_modules.py",
    "tests/test_parity.py",
    "tests/test_wap.py",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--full", action="store_true",
                    help="include slow-marked tests (the pre-commit gate)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(root)
    files = sorted(glob.glob("tests/test_*.py"))
    heavy = [f for f in HEAVY if f in files]
    ordered = heavy + [f for f in files if f not in heavy]
    shards: list[list[str]] = [[] for _ in range(args.shards)]
    for i, f in enumerate(ordered):
        shards[i % args.shards].append(f)

    t0 = time.monotonic()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
               f"--basetemp=/tmp/fastgate-{i}", *shard]
        if args.full:
            cmd += ["-m", "slow or not slow"]
        procs.append((i, shard, subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)))

    ok = True
    for i, shard, p in procs:
        out, _ = p.communicate()
        tail = [ln for ln in out.splitlines() if ln.strip()][-1:]
        print(f"shard {i} ({len(shard)} files): rc={p.returncode} "
              f"{tail[0] if tail else ''}", flush=True)
        if p.returncode != 0:
            ok = False
            print(out[-4000:])
    print(f"fast_gate: {'PASS' if ok else 'FAIL'} in "
          f"{time.monotonic() - t0:.1f}s with {args.shards} shards")
    return 0 if ok else 1


if __name__ == "__main__":
    main = main()
    sys.exit(main)
