"""Two-cluster-size scaling benchmark (the sandbox form of the north rule's
N vs 4N executors criterion).

No real cluster exists here, so the same spark-submit job runs at two
parallelism levels — local[8] (N) and local[32] (4N) — over the IDENTICAL
pre-generated change log, each in its own cold JVM via
``spark-submit --py-files dist/cdc.zip`` (the spec's deployment form).
Within each JVM the replay runs ``--reps`` times into fresh tables; the min
of the warm reps is the steady-state time (JIT excluded symmetrically).

throughput scaling efficiency = (events/sec at 4N) / (4 * events/sec at N)

Writes BENCH.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [--keys 120000] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))


def spark_submit(master: str, cores: int, zip_path: str, log_dir: str,
                 table: str, reps: int) -> dict:
    cmd = [
        "spark-submit",
        "--master", master,
        "--driver-memory", "20g",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.shuffle.partitions=64",  # identical plan both configs
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.local.dir=/dev/shm/spark-local"
        if os.path.isdir("/dev/shm") else "spark.local.dir=/tmp",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "cdc_replay.py"),
        "--log-dir", log_dir, "--table", table,
        "--partitions", "32", "--reps", str(reps), "--json",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    if out.returncode != 0:
        raise RuntimeError(f"spark-submit failed:\n{out.stderr[-4000:]}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=300_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--work", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_dist import build
    zip_path = build()

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = args.work or tempfile.mkdtemp(prefix="cdc_scale_", dir=scratch)
    log_dir = os.path.join(work, "log")

    if not os.path.isdir(log_dir):
        from cdc.session import get_spark
        from cdc.testing.gen import gen_change_events, write_change_log
        spark = get_spark("scale-gen", cores=32)
        ev = gen_change_events(spark, n_keys=args.keys, mean_events_per_key=10,
                               seed=11)
        write_change_log(ev, log_dir, events_per_file=50_000)
        spark.stop()

    results = {}
    try:
        for cores in (8, 32):
            results[cores] = spark_submit(
                f"local[{cores}]", cores, zip_path, log_dir,
                os.path.join(work, f"table-{cores}"), args.reps)
    finally:
        if args.work is None:
            shutil.rmtree(work, ignore_errors=True)

    t8, t32 = results[8]["steady_sec"], results[32]["steady_sec"]
    eff = (t8 / t32) / 4.0
    summary = {
        "metric": "scaling_efficiency_local8_to_local32",
        "value": round(eff, 3),
        "unit": "ratio",
        "events": results[32]["events"],
        "n_cores": {"N": 8, "4N": 32},
        "steady_sec": {"8": t8, "32": t32},
        "events_per_sec": {"8": results[8]["events_per_sec"],
                           "32": results[32]["events_per_sec"]},
        "cold_sec": {"8": results[8]["cold_sec"], "32": results[32]["cold_sec"]},
        "reps_sec": {"8": results[8]["reps_sec"], "32": results[32]["reps_sec"]},
        "threshold": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — scaling evidence (N vs 4N)

North rule criterion: throughput scaling efficiency >= 0.8 between N and 4N
executors. Sandbox proxy (no real cluster): the same
`spark-submit --py-files dist/cdc.zip scripts/cdc_replay.py` job at
`local[8]` (N) vs `local[32]` (4N) over one pre-generated change log
({summary['events']:,} events), fresh JVM per configuration, {args.reps} reps
per JVM, steady-state = min of warm reps (JIT excluded symmetrically).

| config | cold (s) | steady (s) | events/sec |
|---|---|---|---|
| local[8]  (N)  | {results[8]['cold_sec']} | {t8} | {results[8]['events_per_sec']:,} |
| local[32] (4N) | {results[32]['cold_sec']} | {t32} | {results[32]['events_per_sec']:,} |

**Scaling efficiency = ({t8} / {t32}) / 4 = {eff:.3f}**
(threshold 0.8 -> {"PASS" if eff >= 0.8 else "FAIL"})

Reproduce: `python scripts/scaling_bench.py --keys {args.keys} --reps {args.reps}`
""")


if __name__ == "__main__":
    main()
