"""Corpus-independence evidence for the continuous-dedup epoch cost
(VERDICT r4 next-round #7): run ONE identical ingest epoch against
standing dedup state built over a SMALL and a LARGE corpus and report the
ratio. The O(batch) claim test_round4_dedup pins structurally (spy-based
IO assertions) becomes a measured number: epoch time must not scale with
the standing corpus.

Also measures the batch-scaling control: a 10x batch against the SAME
corpus — epoch cost should move with the batch, not the corpus.

Method: one local[8] session; standing state built untimed (in
production it was paid for epoch by epoch); per config, `--reps` epochs
with distinct ids/keys, min taken (first rep absorbs JIT/page-cache —
this box's one-shot noise is up to 4x, see BENCH.md). Deterministic
synthetic corpus (seeded word sequences + 2% duplicate pairs), no
external data.

Usage: python scripts/epoch_corpus_bench.py [--small 5000] [--big 50000]
       [--batch 150] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

VOCAB = 500
DOC_WORDS = 60


def _corpus_df(spark, n: int, id_base: int = 0, dup_every: int = 50):
    """Deterministic synthetic documents: word k of doc i is
    vocab[(i*31 + k*7) % VOCAB]; every ``dup_every``-th doc re-appears
    once at id + 10_000_000 (true near-dup pairs at any scale)."""
    from pyspark.sql import functions as F
    words = F.array(*[F.lit(f"w{v:03d}") for v in range(VOCAB)])
    base = spark.range(n).select(
        (F.col("id") + id_base).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(DOC_WORDS - 1)),
                        lambda k: F.element_at(
                            words,
                            (((F.col("id") + id_base) * 31 + k * 7)
                             % VOCAB + 1).cast("int"))),
            " ").alias("text"))
    dup = (base.filter(F.col("doc_id") % dup_every == 0)
           .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    return base.unionByName(dup)


def _batch_df(spark, corpus_n: int, size: int, rep: int):
    """One ingest batch: ``size`` brand-new docs (ids disjoint from every
    corpus size and every rep), a third of which duplicate standing docs
    with ids < 1000 (present in BOTH corpus sizes, so probe work is
    identical)."""
    from pyspark.sql import functions as F
    id0 = 20_000_000 + rep * 1_000_000
    fresh = _corpus_df(spark, size, id_base=id0, dup_every=10**9)
    dup_of_standing = (
        _corpus_df(spark, 1000, id_base=0, dup_every=10**9)
        .filter(F.col("doc_id") % (1000 // max(1, size // 3)) == 0)
        .limit(size // 3)
        .withColumn("doc_id", F.col("doc_id") + id0 + 500_000))
    return fresh.unionByName(dup_of_standing)


def run_config(spark, scratch: str, corpus_n: int, batch: int,
               reps: int, mode: str) -> list[float]:
    from cdc.stream.dedup import dedup_tables, ingest_dedup_batch
    work = tempfile.mkdtemp(prefix=f"epoch_{corpus_n}_{mode}_", dir=scratch)
    bands, groups = dedup_tables(os.path.join(work, "b"),
                                 os.path.join(work, "g"), n_partitions=64)
    docs = _corpus_df(spark, corpus_n)
    ingest_dedup_batch(spark, bands, groups, docs, "seed")
    times = []
    for rep in range(reps):
        b = _batch_df(spark, corpus_n, batch, rep)
        b = b.localCheckpoint(eager=True)   # materialize OUTSIDE the timer
        t0 = time.monotonic()
        ingest_dedup_batch(spark, bands, groups, b, f"epoch-{rep}",
                           mode=mode)
        times.append(round(time.monotonic() - t0, 3))
    shutil.rmtree(work, ignore_errors=True)
    return times


def run_one(corpus_n: int, batch: int, mode: str, reps: int) -> None:
    """Child-process entry: one config in a fresh JVM. Isolation matters
    twice over: py4j JVMs outlive spark.stop() while the parent python
    lives (CLAUDE.md), and a JVM lost to a long stall (observed: a 230 s
    heartbeat starvation under background load killed the shared-session
    run) costs one config, not the whole bench. Timeouts are raised far
    past the observed pause so a stalled-but-alive JVM recovers."""
    from cdc.session import get_spark
    spark = get_spark("epoch-corpus-bench", cores=8, shuffle_partitions=8,
                      extra_conf={
                          "spark.network.timeout": "600s",
                          "spark.executor.heartbeatInterval": "60s",
                      })
    scratch = tempfile.mkdtemp(prefix="cdc_epoch_bench_")
    try:
        ts = run_config(spark, scratch, corpus_n, batch, reps, mode)
        print("RESULT " + json.dumps({"corpus": corpus_n, "batch": batch,
                                      "mode": mode, "reps": ts,
                                      "min_s": min(ts)}), flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=5000)
    ap.add_argument("--big", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=150)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--one", default=None,
                    help="internal: run one config 'corpus,batch,mode'")
    args = ap.parse_args()

    if args.one:
        c, b, m = args.one.split(",")
        run_one(int(c), int(b), m, args.reps)
        return

    import subprocess
    rows = {}
    # mor = the documented high-frequency micro-batch mode (O(batch)
    # delta commits); cow measured alongside for honesty — its write
    # half rewrites touched partitions, which IS corpus-proportional
    # at a fixed partition count (that trade is why mor exists).
    for corpus_n, batch, mode in (
            (args.small, args.batch, "mor"),
            (args.big, args.batch, "mor"),
            (args.small, args.batch * 10, "mor"),
            (args.small, args.batch, "cow"),
            (args.big, args.batch, "cow")):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one", f"{corpus_n},{batch},{mode}",
               "--reps", str(args.reps)]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        res = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not res:
            print(json.dumps({"corpus": corpus_n, "batch": batch,
                              "mode": mode, "error": "child failed",
                              "rc": proc.returncode,
                              "tail": proc.stderr[-500:]}), flush=True)
            continue
        row = json.loads(res[-1][len("RESULT "):])
        rows[(corpus_n, batch, mode)] = row["min_s"]
        print(json.dumps(row), flush=True)

    def ratio(a, b):
        return round(rows[a] / rows[b], 3) if a in rows and b in rows \
            else None
    base = (args.small, args.batch, "mor")
    print(json.dumps({
        "mor_corpus_ratio_10x": ratio((args.big, args.batch, "mor"), base),
        "mor_batch_ratio_10x":
            ratio((args.small, args.batch * 10, "mor"), base),
        "cow_corpus_ratio_10x": ratio((args.big, args.batch, "cow"),
                                      (args.small, args.batch, "cow")),
    }))


if __name__ == "__main__":
    main()
