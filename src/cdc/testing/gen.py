"""S8 — deterministic synthetic change-event stream generator (FIXTURES.md §2).

Every value is a pure function of (seed, key, version): no wall clock, no
Python ``random`` state. Generation is expressed entirely in Spark column
expressions (JVM-side, codegen'd) so the same code produces 10^5 test rows
or 10^7 bench rows; only the final lsn-assignment window is a deliberate
single-task global sort (fixture-scale acceptable; the *engine* never does
this).

Fixture semantics produced (FIXTURES.md §2):
- strictly increasing ``lsn`` with ~3% gaps;
- ~2% verbatim duplicate events (at-least-once delivery);
- first event per key is 'I'; ~10% of keys end in 'D'; ~1% of dead keys get
  a trailing 'U' (upsert-on-dead-key violation the engine must tolerate);
- hot-repo skew: repos 0-4 own ~60% of keys/events;
- ``ts`` mostly follows lsn order, ~1% rows 15 min late (watermark tests);
- ``schema_version`` 1 -> 2 -> 3 over the lsn axis; v2 adds (size_bytes int,
  score float); v3 widens them to (bigint, double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["python", "java", "scala", "sql", "md", "toml"]
EXTS = {"python": "py", "java": "java", "scala": "scala", "sql": "sql", "md": "md", "toml": "toml"}
T0 = "2026-01-01 00:00:00"


def _h(*cols):
    """Deterministic non-negative 64-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def gen_change_events(
    spark: SparkSession,
    n_keys: int = 5_000,
    mean_events_per_key: int = 20,
    seed: int = 42,
    n_repos: int = 50,
    n_hot_repos: int = 5,
) -> DataFrame:
    """Return the change_events DataFrame (latest schema v3, all columns).

    Expected row count ~= n_keys * mean_events_per_key (exact count is a
    deterministic function of the seed).
    """
    s = F.lit(seed)
    keys = spark.range(n_keys).withColumnRenamed("id", "key_id")

    # -- key-level attributes ------------------------------------------------
    hot_cut = int(n_keys * 0.6)
    keys = keys.withColumn(
        "repo_id",
        F.when(F.col("key_id") < hot_cut, F.pmod(_h(s, F.col("key_id"), F.lit("r")), F.lit(n_hot_repos)))
        .otherwise(n_hot_repos + F.pmod(_h(s, F.col("key_id"), F.lit("r")), F.lit(n_repos - n_hot_repos))),
    )
    keys = keys.withColumn("repo", F.format_string("repo_%04d", F.col("repo_id")))
    keys = keys.withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(_h(s, F.col("key_id"), F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int")))
    ext_map = F.create_map(*[y for x in EXTS.items() for y in (F.lit(x[0]), F.lit(x[1]))])
    keys = keys.withColumn(
        "path",
        F.format_string(
            "src/%s/%s_%d.%s",
            F.substring(F.md5(F.concat(s.cast("string"), F.lit(":d:"), F.col("key_id").cast("string"))), 1, 6),
            F.substring(F.md5(F.concat(s.cast("string"), F.lit(":n:"), F.col("key_id").cast("string"))), 1, 8),
            F.col("key_id"),
            ext_map[F.col("lang")],
        ),
    )
    # events per key: 1 + h % (2*mean - 1)  -> mean ~= mean_events_per_key
    keys = keys.withColumn("m", (F.lit(1) + F.pmod(_h(s, F.col("key_id"), F.lit("m")), F.lit(2 * mean_events_per_key - 1))).cast("int"))
    keys = keys.withColumn("dies", F.pmod(_h(s, F.col("key_id"), F.lit("die")), F.lit(10)) == 0)
    keys = keys.withColumn("post_death_u", F.col("dies") & (F.pmod(_h(s, F.col("key_id"), F.lit("pd")), F.lit(10)) == 0))
    keys = keys.withColumn("m_total", F.col("m") + F.when(F.col("post_death_u"), 1).otherwise(0))

    # -- explode to event skeleton -------------------------------------------
    ev = keys.select(
        "key_id", "repo", "path", "lang", "m", "dies", "post_death_u", "m_total",
        F.explode(F.sequence(F.lit(0), F.col("m_total") - 1)).alias("i"),
    )
    ev = ev.withColumn("r", _h(s, F.col("key_id"), F.col("i"), F.lit("ord")))
    # logical version = rank of r within the key -> per-key event order
    w_key = Window.partitionBy("key_id").orderBy("r", "i")
    ev = ev.withColumn("version", F.row_number().over(w_key) - 1)
    ev = ev.withColumn(
        "op",
        F.when(F.col("version") == 0, F.lit("I"))
        .when(F.col("dies") & (F.col("version") == F.col("m") - 1), F.lit("D"))
        .otherwise(F.lit("U")),
    )
    # ~0.5% of U events flip the lang (rename-style churn)
    ev = ev.withColumn(
        "lang",
        F.when(
            (F.col("op") == "U") & (F.pmod(_h(s, F.col("key_id"), F.col("version"), F.lit("lc")), F.lit(200)) == 0),
            F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(_h(s, F.col("key_id"), F.col("version")), F.lit(len(LANGS))) + 1).cast("int")),
        ).otherwise(F.col("lang")),
    )

    # -- global lsn assignment (single-task sort: generator-only) ------------
    w_glob = Window.orderBy("r", "key_id", "i")
    ev = ev.withColumn("rid", F.row_number().over(w_glob))
    gap = F.when(F.pmod(_h(s, F.col("rid"), F.lit("gap")), F.lit(100)) < 3, 1 + F.pmod(_h(s, F.col("rid"), F.lit("gapsz")), F.lit(3))).otherwise(F.lit(0))
    ev = ev.withColumn("lsn", (F.col("rid") + F.sum(gap).over(w_glob.rowsBetween(Window.unboundedPreceding, 0))).cast("long"))

    # break the single-task window stage BEFORE the payload projections:
    # without this exchange Catalyst pipelines the (heavy) content/md5
    # generation into the same lone task the global window ran in.
    # Range partitioning on the now-unique lsn keeps it deterministic.
    ev = ev.repartitionByRange(64, "lsn")

    # -- payload columns ------------------------------------------------------
    base = F.sha2(F.concat_ws(":", s.cast("string"), F.col("repo"), F.col("path"), F.col("version").cast("string")), 256)
    ev = ev.withColumn("commit", F.substring(base, 1, 40))
    nlines = (F.lit(2) + F.pmod(_h(s, F.col("key_id"), F.col("version"), F.lit("len")), F.lit(60))).cast("int")
    line = lambda k: F.format_string("line %s: %s", k.cast("string"), F.substring(F.repeat(base, 4), (F.pmod(k * 17, F.lit(160)) + 1).cast("int"), 57))
    content = F.concat_ws("\n", F.transform(F.sequence(F.lit(0), nlines - 1), line))
    ev = ev.withColumn("content", F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(content))

    jitter = (F.pmod(_h(s, F.col("lsn"), F.lit("ts")), F.lit(10_000)) - 5_000) / 1000.0  # +-5s
    late = F.when(F.pmod(_h(s, F.col("lsn"), F.lit("late")), F.lit(100)) == 0, F.lit(-900.0)).otherwise(F.lit(0.0))
    ev = ev.withColumn("ts", F.timestamp_seconds(F.unix_timestamp(F.lit(T0).cast("timestamp")) + F.col("lsn") * 0.1 + jitter + late))
    ev = ev.withColumn("batch_id", (F.col("lsn") / 1000).cast("long"))
    ev = ev.withColumn("size_bytes", F.length("content").cast("long"))
    ev = ev.withColumn("score", (F.pmod(_h(s, F.col("lsn"), F.lit("sc")), F.lit(100_000)) / 1000.0).cast("double"))

    n_est = n_keys * mean_events_per_key
    ev = ev.withColumn(
        "schema_version",
        F.when(F.col("lsn") < int(0.4 * n_est), 1).when(F.col("lsn") < int(0.7 * n_est), 2).otherwise(3).cast("int"),
    )

    out_cols = ["lsn", "ts", "op", "repo", "path", "commit", "lang", "content", "schema_version", "batch_id", "size_bytes", "score"]
    ev = ev.select(*out_cols)

    # -- at-least-once duplicates: ~2% of events re-delivered verbatim -------
    dups = ev.filter(F.pmod(_h(s, F.col("lsn"), F.lit("dup")), F.lit(50)) == 0)
    return ev.unionAll(dups)


def write_change_log(events: DataFrame, out_dir: str, events_per_file: int = 1_000) -> None:
    """Write the log as Parquet, one subdir per schema version (v=1|2|3).

    v1 files physically lack (size_bytes, score); v2 stores them narrow
    (int, float); v3 stores them wide (bigint, double) — the engine's
    registry-driven read path (U1/W2) must reconcile these.

    Files are lsn-range-partitioned and sorted so that (a) parquet footer
    min/max stats enable lsn-pruned tailing (S2) and (b) file order ~= lsn
    order for streaming maxFilesPerTrigger tailing (S3).
    """
    events = events.persist()  # the generator plan ends in a global-sort
    n = events.count()         # window; don't re-run it per schema version
    for v in (1, 2, 3):
        sub = events.filter(F.col("schema_version") == v)
        if v == 1:
            sub = sub.drop("size_bytes", "score")
        elif v == 2:
            sub = sub.withColumn("size_bytes", F.col("size_bytes").cast("int")).withColumn("score", F.col("score").cast("float"))
        n_files = max(1, int(n / 3 / events_per_file))
        (sub.repartitionByRange(n_files, "lsn").sortWithinPartitions("lsn")
            .write.mode("overwrite").parquet(f"{out_dir}/v={v}"))
    events.unpersist()


def gen_src_snapshot(spark: SparkSession, n_keys: int = 5_000, seed: int = 42, **kw) -> DataFrame:
    """FIXTURES.md §1 — version-0 snapshot of the key space: one live row per
    key in the spec's input shape (repo, path, commit, lang, content)."""
    ev = gen_change_events(spark, n_keys=n_keys, seed=seed, **kw)
    first = ev.filter(F.col("op") == "I")
    return first.select("repo", "path", "commit", "lang", "content").dropDuplicates(["repo", "path"])
