"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline: end-to-end CDC replay (seeded change-event log -> exact dedup ->
pandas-UDF normalization -> LWW collapse -> transactional partitioned MERGE
commit -> lineage metrics), reported both as wall seconds and as
events/sec. Plus the hot operators from the parity library at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs (driver contract):
  SPARK_GRAFT_SF_DIR  — testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    — local[N] parallelism (default 32)
  CDC_BENCH_KEYS      — replay key count (default 60000, ~600k events)

Usage: python bench.py            # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_keys = int(os.environ.get("CDC_BENCH_KEYS", "60000"))

    from cdc.session import get_spark
    spark = get_spark("cdc-bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    import __spark_entry__ as em
    queries = em.queries()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # ---- headline: CDC replay throughput ---------------------------------
    from cdc.pipeline import replay
    from cdc.table.table import CdcTable
    from cdc.testing.gen import gen_change_events, write_change_log

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc_bench_", dir=scratch)
    try:
        log_dir = os.path.join(work, "log")
        ev = gen_change_events(spark, n_keys=n_keys, mean_events_per_key=10, seed=11)
        write_change_log(ev, log_dir, events_per_file=50_000)
        n_events = spark.read.parquet(f"{log_dir}/v=1", f"{log_dir}/v=2").count() + \
            spark.read.parquet(f"{log_dir}/v=3").count()

        # cold = first full replay (plan compile + JIT); steady = min of 3
        # further replays of the same log into fresh tables (methodology in
        # BASELINE.md — steady-state is what a long-running ingest job sees)
        reps = []
        table = None
        for i in range(4):
            table = CdcTable(os.path.join(work, f"t{i}"), n_partitions=max(cpus, 8),
                             layout="key_hash")
            t0 = time.monotonic()
            # lww_via pinned to the planner's known choice at this scale
            # (semi: narrow winner shuffle + broadcast-back) so the bench
            # measures the replay, not the planner's extra stats pass
            replay(spark, log_dir, table, batches_per_commit=None, metrics=True,
                   lww_via="semi")
            reps.append(time.monotonic() - t0)
        timings["cdc_replay_cold"] = round(reps[0], 3)
        replay_s = min(reps[1:])
        timings["cdc_replay"] = round(replay_s, 3)
        events_per_sec = int(n_events / replay_s)

        # incremental tail: +1 batch group of fresh events onto existing state
        ev2 = gen_change_events(spark, n_keys=n_keys // 10, mean_events_per_key=4, seed=12)
        from pyspark.sql import functions as F
        hi = table.lsn_high()
        ev2 = ev2.withColumn("lsn", F.col("lsn") + hi)
        log2 = os.path.join(work, "log2")
        write_change_log(ev2, log2, events_per_file=50_000)
        timed("cdc_incremental_tail",
              lambda: replay(spark, log2, table, batches_per_commit=None,
                             metrics=True, lww_via="semi"))

        # merge-on-read tail: same shape of fresh events, appended as a
        # delta layer (no partition rewrite) — the high-frequency-commit path
        ev3 = gen_change_events(spark, n_keys=n_keys // 10, mean_events_per_key=4, seed=13)
        ev3 = ev3.withColumn("lsn", F.col("lsn") + table.lsn_high())
        log3 = os.path.join(work, "log3")
        write_change_log(ev3, log3, events_per_file=50_000)
        timed("cdc_incremental_tail_mor",
              lambda: replay(spark, log3, table, batches_per_commit=None,
                             metrics=True, mode="mor", lww_via="semi"))
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---- parity-library hot operators at sf ------------------------------
    bench_queries = [
        "w1_lww_salted", "a4_lww_maxby", "j1_merge_full_outer",
        "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q5_region_volume",
        "w3_running_sum", "w4_ntile_deciles", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_simhash_pairs", "dedup_embed_lsh",
        "ann_cosine_topk", "ann_ivf_search", "ann_ivf_search_np2", "ann_pq_search",
        "ann_ivfpq_search",
        "t4_session_window", "txt_quality", "txt_repetition",
        "v1_normalize_sha", "mm_decode_meta", "mm_decode_ppm",
        "a10_patch_mor_lww", "dedup_groups",
    ]
    for name in bench_queries:
        timed(name, lambda n=name: queries[n](spark, sf_dir).write
              .format("noop").mode("overwrite").save())

    # ---- incremental ingest probes vs their full twins -------------------
    # The point is the RATIO: the standing band tables live AT REST
    # (parquet, written untimed — in production they were paid for at
    # ingest time); the timed part is ONE batch's bands + the probe +
    # (for vectors) the exact-cosine confirm. Compare dedup_lsh_incr_probe
    # with dedup_minhash_lsh and dedup_embed_lsh_incr_probe with
    # dedup_embed_lsh above.
    from pyspark.sql import functions as F

    from cdc.lsh import minhash_bands, minhash_pairs_incremental
    from cdc.parity.common import load
    from cdc.parity.textops import _new_docs
    from cdc.vectors import cosine_near_dup_lsh_incremental, rh_bands

    inc_work = tempfile.mkdtemp(prefix="cdc_bench_inc_", dir=scratch)
    try:
        d = load(spark, sf_dir, "documents")
        minhash_bands(d).write.parquet(os.path.join(inc_work, "mh_bands"))
        standing_mh = spark.read.parquet(os.path.join(inc_work, "mh_bands"))
        timed("dedup_lsh_incr_probe",
              lambda: minhash_pairs_incremental(standing_mh, _new_docs(d))[0]
              .write.format("noop").mode("overwrite").save())

        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        rh_bands(emb).write.parquet(os.path.join(inc_work, "rh_bands"))
        standing_rh = spark.read.parquet(os.path.join(inc_work, "rh_bands"))
        new_emb = (emb.filter(F.col("vec_id") % 100 == 0)
                   .withColumn("vec_id", F.col("vec_id") + 100000))
        timed("dedup_embed_lsh_incr_probe",
              lambda: cosine_near_dup_lsh_incremental(
                  standing_rh, emb.unionByName(new_emb), new_emb,
                  threshold=0.95)[0]
              .write.format("noop").mode("overwrite").save())

        # ---- streaming continuous-dedup: ONE full epoch ------------------
        # Standing state (band + assignment CdcTables over the whole doc
        # corpus) is built UNTIMED — in production it was paid for batch by
        # batch; the timed row is one end-to-end micro-batch: batch bands +
        # bucket-pruned standing probe + O(churn) CC delta + the two
        # exactly-once commits. Tracks VERDICT r3's O(corpus)->O(churn)
        # epoch rework as a measured number.
        from cdc.stream.dedup import dedup_tables, ingest_dedup_batch
        bands_t, groups_t = dedup_tables(
            os.path.join(inc_work, "sb"), os.path.join(inc_work, "sg"),
            n_partitions=16)
        ingest_dedup_batch(spark, bands_t, groups_t,
                           d.select("doc_id", "text"), "seed")
        batch_docs = _new_docs(d)
        timed("dedup_stream_epoch",
              lambda: ingest_dedup_batch(spark, bands_t, groups_t,
                                         batch_docs, "epoch-1"))

        # ---- standing IVF index: ONE ingest epoch -------------------------
        # quantizer train + base fill untimed; timed = one batch assigned
        # against the frozen broadcast centroids + MERGE commit.
        from cdc.ann import IvfIndex
        idx = IvfIndex(os.path.join(inc_work, "ivf"), n_partitions=16)
        idx.train_on(spark, emb, "base", n_centroids=8, iters=0)
        timed("ann_ivf_ingest_epoch",
              lambda: idx.ingest(spark, new_emb, "epoch-1"))

        # ---- CDC U/D epochs through the standing state (round 5) ----------
        # one op-typed micro-batch (updates + deletes + inserts with
        # pre/post images) through apply_doc_changes / ingest_changes — the
        # retire+insert band netting and affected-component rebuild as a
        # measured number (standing state from the rows above, untimed).
        from cdc.stream.dedup import apply_doc_changes
        upd = (d.filter(F.col("doc_id") % 97 == 0)
               .select("doc_id", F.lit("U").alias("op"),
                       F.concat_ws(" ", "text",
                                   F.lit("round5 edit")).alias("text"),
                       F.col("text").alias("text_pre")))
        dele = (d.filter(F.col("doc_id") % 101 == 3)
                .select("doc_id", F.lit("D").alias("op"),
                        F.lit(None).cast("string").alias("text"),
                        F.col("text").alias("text_pre")))
        ins = (d.filter(F.col("doc_id") % 103 == 5)
               .select((F.col("doc_id") + 500_000).alias("doc_id"),
                       F.lit("I").alias("op"), F.col("text"),
                       F.lit(None).cast("string").alias("text_pre")))
        changes = (upd.unionByName(dele).unionByName(ins)
                   .localCheckpoint(eager=True))
        cur = (d.select("doc_id", "text")
               .unionByName(batch_docs.select("doc_id", "text"))
               .join(changes.select("doc_id"), "doc_id", "left_anti")
               .unionByName(changes.filter("op != 'D'")
                            .select("doc_id", "text")))
        timed("dedup_changes_epoch",
              lambda: apply_doc_changes(
                  spark, bands_t, groups_t, changes, "cdc-1",
                  fetch_docs=lambda s, ids: cur.join(ids, "doc_id",
                                                     "left_semi")))

        vtype = emb.schema["embedding"].dataType
        vec_upd = (emb.filter(F.col("vec_id") % 37 == 0)
                   .select("vec_id", F.lit("U").alias("op"),
                           F.reverse("embedding").alias("embedding"),
                           F.col("embedding").alias("embedding_pre")))
        vec_del = (emb.filter(F.col("vec_id") % 41 == 1)
                   .select("vec_id", F.lit("D").alias("op"),
                           F.lit(None).cast(vtype).alias("embedding"),
                           F.col("embedding").alias("embedding_pre")))
        timed("ann_ivf_cdc_epoch",
              lambda: idx.ingest_changes(
                  spark, vec_upd.unionByName(vec_del), "cdc-1"))
    finally:
        shutil.rmtree(inc_work, ignore_errors=True)

    out = {
        "metric": "cdc_replay_plus_operator_suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "replay_events": n_events,
        "replay_events_per_sec": events_per_sec,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
