"""Time travel, skew planner, audit, enrichment registry, maintenance
(SURVEY.md §2.B J5/J6, W4/O3, U2/J7, R12; Iceberg-style compaction)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc.audit import assert_parity, batch_conflicts, parity_diff
from cdc.enrich import apply_enrichments, registered
from cdc.pipeline import replay
from cdc.skew import choose_salt, key_deciles, plan_lww, skew_stats, topk_hot_keys
from cdc.table.maintenance import compact, expire_snapshots, vacuum_orphans
from cdc.table.table import CdcTable
from cdc.table.timetravel import probe_versions, read_as_of, snapshot_diff
from cdc.testing.gen import gen_change_events, write_change_log
from cdc.testing.oracle import expected_state


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ops")
    events = gen_change_events(spark, n_keys=600, mean_events_per_key=6, seed=21).cache()
    log_dir = str(root / "log")
    write_change_log(events, log_dir, events_per_file=1_000)
    table = CdcTable(str(root / "table"), n_partitions=4)
    # chunked replay -> several snapshots for time travel / maintenance
    replay(spark, log_dir, table, batches_per_commit=2, metrics=False)
    return {"events": events, "log_dir": log_dir, "table": table}


# ---- time travel -----------------------------------------------------------

def test_read_as_of_matches_pandas_oracle(spark, env):
    pdf = env["events"].toPandas()
    mid = int(pdf.lsn.quantile(0.5))
    got = read_as_of(spark, env["table"], mid, log_dir=env["log_dir"])
    exp = expected_state(pdf[pdf.lsn <= mid])
    got_set = {(r.repo, r.path, r._content_sha256, r._lsn)
               for r in got.select("repo", "path", "_content_sha256", "_lsn").collect()}
    exp_set = set(map(tuple, exp[["repo", "path", "content_sha256", "last_lsn"]].values))
    assert got_set == exp_set


def test_read_as_of_at_snapshot_boundary(spark, env):
    snaps = env["table"].snapshots()
    boundary = snaps[0]["lsn_high"]
    got = read_as_of(spark, env["table"], boundary, log_dir=env["log_dir"])
    pdf = env["events"].toPandas()
    exp = expected_state(pdf[pdf.lsn <= boundary])
    assert got.count() == len(exp)


def test_probe_versions_range_join(spark, env):
    ev = env["events"]
    probes = spark.range(1, 4).select((F.col("id") * 500).alias("probe"))
    out = probe_versions(ev.dropDuplicates(["lsn"]), probes).collect()
    assert len(out) > 0
    # spot-check one: the returned interval must contain the probe
    r = out[0]
    assert r.lsn_lo <= r.probe < r.lsn_hi


def test_snapshot_diff(spark, env):
    snaps = env["table"].snapshots()
    d = snapshot_diff(spark, env["table"], snaps[0]["snapshot_id"],
                      snaps[-1]["snapshot_id"])
    assert d.count() > 0
    assert set(d.select("change").distinct().toPandas().change) <= {
        "added_or_changed", "removed_or_changed"}


# ---- skew ------------------------------------------------------------------

def test_topk_and_deciles(spark, env):
    top = topk_hot_keys(env["events"], keys=("repo",), k=5).collect()
    assert len(top) == 5
    assert top[0].n >= top[-1].n
    dec = key_deciles(env["events"], keys=("repo",)).collect()
    assert sum(r.n_keys for r in dec) == env["events"].select("repo").distinct().count()


def test_choose_salt_thresholds():
    assert choose_salt({"max_key": 1000}, target_rows_per_task=10_000) == 1
    assert choose_salt({"max_key": 25_000}, target_rows_per_task=10_000) == 4
    assert choose_salt({"max_key": 10**9}, target_rows_per_task=10_000, max_salt=64) == 64


def test_plan_lww_on_generated_stream(spark, env):
    # bounded key set -> semi (narrow winner shuffle, wide payload never moves)
    via, salt = plan_lww(env["events"], target_rows_per_task=100_000)
    assert via == "semi" and salt == 1
    # too many keys to broadcast + no hot key -> skew-robust maxby
    via1, salt1 = plan_lww(env["events"], target_rows_per_task=100_000,
                           broadcast_keys_max=10)
    assert via1 == "maxby" and salt1 == 1
    # too many keys to broadcast + hot key beyond budget -> salted window
    via2, salt2 = plan_lww(env["events"], keys=("repo",),
                           target_rows_per_task=50, broadcast_keys_max=10)
    assert via2 == "salted" and salt2 > 1


def test_skew_stats_shape(spark, env):
    s = skew_stats(env["events"], keys=("repo",))
    assert s["n_events"] > 0 and s["max_key"] >= s["p999"] > 0


# ---- audit -----------------------------------------------------------------

def test_parity_diff_empty_on_self(spark, env):
    state = env["table"].read(spark)
    assert parity_diff(state, state).count() == 0
    assert_parity(state, state)


def test_parity_diff_detects_mutation(spark, env):
    state = env["table"].read(spark)
    mutated = state.withColumn(
        "_content_sha256",
        F.when(F.monotonically_increasing_id() == 0, F.lit("deadbeef"))
        .otherwise(F.col("_content_sha256")))
    d = parity_diff(state, mutated)
    assert d.count() == 2  # one row differs -> one on each side
    with pytest.raises(AssertionError):
        assert_parity(state, mutated)


def test_batch_conflicts(spark, env):
    ev = env["events"]
    mid = 1800
    c = batch_conflicts(ev.filter(F.col("lsn") < mid), ev.filter(F.col("lsn") >= mid))
    assert c.count() > 0
    row = c.first()
    assert row.lsn_b2 > row.lsn_b1


# ---- enrichment ------------------------------------------------------------

def test_enrichment_registry_and_routing(spark, env):
    state = env["table"].read(spark)
    names = ["lang_stats", "repo_activity", "path_depth_histogram"]
    assert set(names) <= set(registered())
    out = apply_enrichments(state, names)
    assert out["lang_stats"].agg(F.sum("n_files")).collect()[0][0] == state.count()
    assert out["repo_activity"].count() == state.select("repo").distinct().count()
    assert out["path_depth_histogram"].agg(F.sum("n_files")).collect()[0][0] == state.count()


def test_enrichment_dim_lookup(spark, env):
    state = env["table"].read(spark)
    dim = spark.createDataFrame(
        [("python", "Python"), ("java", "Java")], "lang string, lang_name string")
    out = apply_enrichments(state, ["dim_lookup"], dim=dim)["dim_lookup"]
    assert out.count() == state.count()
    assert out.filter(F.col("lang_name").isNotNull()).count() > 0


# ---- maintenance -----------------------------------------------------------

def test_compact_preserves_live_state_and_drops_tombstones(spark, env):
    table = env["table"]
    before_live = {(r.repo, r.path, r._content_sha256)
                   for r in table.read(spark).select("repo", "path", "_content_sha256").collect()}
    n_tomb_before = table.read(spark, include_deleted=True).filter("_deleted").count()
    assert n_tomb_before > 0

    snap = compact(spark, table, vacuum_tombstones_below_lsn=table.lsn_high(),
                   files_per_partition=1)
    assert snap["operation"] == "compact"
    after_live = {(r.repo, r.path, r._content_sha256)
                  for r in table.read(spark).select("repo", "path", "_content_sha256").collect()}
    assert after_live == before_live
    assert table.read(spark, include_deleted=True).filter("_deleted").count() == 0
    # all data now in the compacted snapshot's files
    assert all(f["origin"] == "added" for f in snap["files"])


def test_expire_and_vacuum(spark, env):
    table = env["table"]
    data_root = os.path.join(table.root, "data")
    n_dirs_before = len(os.listdir(data_root))
    expired = expire_snapshots(table, keep_last=1)
    assert expired, "expected snapshots to expire"
    removed = vacuum_orphans(table)
    assert removed, "expected orphan data dirs"
    assert len(os.listdir(data_root)) < n_dirs_before
    # table still readable at current snapshot
    assert table.read(spark).count() > 0


# ---- metadata tables -------------------------------------------------------

def test_commits_and_manifest_dataframes(spark, env, tmp_path):
    # fresh table: earlier tests in this module compact/expire env's table
    table = CdcTable(str(tmp_path / "meta_t"), n_partitions=4)
    replay(spark, env["log_dir"], table, batches_per_commit=2, metrics=False)
    c = table.commits_df(spark)
    assert c.count() == len(table.snapshots()) >= 2
    assert c.filter(F.col("operation") == "merge").count() >= 1
    # lsn_high is monotone over snapshot_id
    rows = c.orderBy("snapshot_id").collect()
    assert all(a.lsn_high <= b.lsn_high for a, b in zip(rows, rows[1:]))
    m = table.manifest_df(spark)
    assert m.count() == len(table.current_snapshot()["files"])
    assert m.filter(F.col("lsn_max") < F.col("lsn_min")).count() == 0


# ---- text ops edge cases ----------------------------------------------------

def test_shingles_short_docs_yield_zero_rows(spark):
    """Docs with fewer words than the shingle size must produce NO shingles
    (not an element_at(_, 0) crash from a descending sequence) — ADVICE.md
    round-1 finding on cdc.parity.textops._shingles."""
    from cdc.parity.textops import _shingles
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three"),
         (5, "a b c d")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["shingle"] for r in _shingles(df, n=3).collect()}
    assert 1 not in rows and 2 not in rows and 3 not in rows
    assert rows[4] == "one two three"
    out = _shingles(df, n=3).groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in out} == {4: 1, 5: 2}


# ---- vector LSH / IVF -------------------------------------------------------

def _toy_vecs(spark, n=40, dim=8, dupes=(0, 3)):
    import math
    rows = []
    for i in range(n):
        v = [math.sin(0.7 * i + 1.3 * d) for d in range(dim)]
        rows.append((i, v))
    for j, i in enumerate(dupes):           # exact copies of existing vectors
        rows.append((1000 + j, rows[i][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embed_lsh_is_subset_of_bruteforce_and_catches_exact_dupes(spark):
    """LSH near-dup candidates, after the exact-cosine filter, must be a
    SUBSET of the brute-force pairs (same threshold) and must contain every
    exact-duplicate pair (identical vectors collide on all bands)."""
    from cdc.vectors import cosine_near_dup_lsh, cosine_near_dup_pairs
    vecs = _toy_vecs(spark)
    exact = {(r.id_a, r.id_b) for r in
             cosine_near_dup_pairs(vecs, 0.95).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           cosine_near_dup_lsh(vecs, 0.95, dim=8).collect()}
    assert lsh <= exact
    assert (0, 1000) in lsh and (3, 1001) in lsh


def test_ivf_train_and_assign(spark):
    from cdc.vectors import ivf_assign, ivf_train, seed_centroids
    vecs = _toy_vecs(spark, n=60, dim=8, dupes=())
    cent0 = ivf_train(vecs, n_centroids=4, iters=0)
    assert {r.cid for r in cent0.collect()} == {0, 1, 2, 3}
    a0 = ivf_assign(vecs, cent0)
    assert a0.count() == 60
    assert a0.select("vec_id").distinct().count() == 60  # exactly one cluster each
    # a vector that IS a centroid assigns to itself with cos ~ 1
    self_row = a0.filter(F.col("vec_id") == 2).collect()[0]
    assert self_row["centroid"] == 2 and abs(self_row["cos"] - 1.0) < 1e-9

    # one Lloyd iteration refines centroids away from the raw seeds but
    # keeps a full deterministic assignment
    cent1 = ivf_train(vecs, n_centroids=4, iters=1)
    a1 = ivf_assign(vecs, cent1)
    assert a1.count() == 60
    s0 = seed_centroids(vecs, 4).collect()
    c1 = {r.cid: r.cemb for r in cent1.collect()}
    assert any(list(r.cemb) != list(c1[r.cid]) for r in s0 if r.cid in c1)


def test_ivf_nprobe_improves_recall_monotonically(spark):
    """nprobe is the IVF recall knob: recall vs brute-force top-k must be
    non-decreasing in nprobe, and nprobe = n_centroids = exact search
    (every cluster probed -> the full candidate set)."""
    from cdc.vectors import cosine_topk, ivf_search, ivf_train
    vecs = _toy_vecs(spark, n=60, dim=8, dupes=())
    queries = vecs.filter(F.col("vec_id") < 10)
    cent = ivf_train(vecs, n_centroids=4, iters=0)
    truth = {(r.qid, r.vec_id) for r in
             cosine_topk(queries, vecs, k=3).collect()}

    def recall(nprobe):
        got = {(r.qid, r.vec_id) for r in
               ivf_search(queries, vecs, cent, k=3, nprobe=nprobe).collect()}
        return len(got & truth) / len(truth)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4
    assert r4 == 1.0                       # all clusters probed == exact
    assert r2 > r1 or r1 == 1.0            # the knob actually moves recall


def test_quadratic_guards_fail_fast(spark):
    """The brute-force verification twins refuse big inputs with a
    pointer to their sub-quadratic default."""
    from cdc.vectors import cosine_near_dup_pairs, cosine_topk
    vecs = _toy_vecs(spark, n=50, dim=8, dupes=())
    with pytest.raises(ValueError, match="cosine_near_dup_lsh"):
        cosine_near_dup_pairs(vecs, 0.95, max_rows=10).collect()
    with pytest.raises(ValueError, match="ivf_search"):
        cosine_topk(vecs.limit(5), vecs, k=3, max_rows=10).collect()
    # max_rows=None forces through; partitioned top-k is never guarded
    assert cosine_near_dup_pairs(vecs, 0.9999, max_rows=None).count() >= 0


def test_domain_quota_two_stage_salted(spark):
    """The two-stage salted quota must (a) equal the naive single-window
    global rank on a skewed corpus, and (b) never run a whole domain
    through ONE window task: the first Window in the plan partitions by
    (source, _salt)."""
    from pyspark.sql import Window as W

    from cdc.parity.textops import domain_quota
    rows = [(i, "mega.example") for i in range(500)] + \
           [(1000 + i, f"small{i % 7}.example") for i in range(70)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_quota(docs, cap=20, salts=8)

    naive_w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    naive = (docs.select("doc_id", "source",
                         F.row_number().over(naive_w).alias("rn"))
             .filter(F.col("rn") <= 20))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, naive.collect()))

    plan = out._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert len(windows) >= 2
    # stage 1 (the last Window in the tree = first executed) is salted
    assert "_salt" in windows[-1], windows


def test_ngram_jaccard_guard(spark):
    from cdc.parity.textops import _shingles, ngram_jaccard_pairs
    docs = spark.createDataFrame(
        [(i, "one two three four five") for i in range(20)],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="dedup_minhash_lsh"):
        ngram_jaccard_pairs(_shingles(docs), max_rows=5).collect()
    assert ngram_jaccard_pairs(_shingles(docs), max_rows=100).count() > 0
    # None forces through — same convention as cdc.vectors
    assert ngram_jaccard_pairs(_shingles(docs), max_rows=None).count() > 0


def test_exact_ntile_matches_window_ntile(spark):
    """The distributed exact_ntile must equal ntile() over the global
    window for every k, including ties and k > N."""
    from pyspark.sql import Window as W
    from cdc.skew import exact_ntile
    rows = [(i, [5, 3, 3, 3, 2, 2, 1, 1, 1, 1][i % 10] + i // 10) for i in range(23)]
    counts = spark.createDataFrame(rows, "user_id long, n long")
    for k in (1, 4, 10, 23, 40):
        got = {r.user_id: r.ntile for r in
               exact_ntile(counts, k, tiebreak_cols=("user_id",)).collect()}
        exp = {r.user_id: r.nt for r in counts.withColumn(
            "nt", F.ntile(k).over(W.orderBy(F.desc("n"), F.asc("user_id")))).collect()}
        assert got == exp, f"k={k}"


def test_mm_resize_and_features(spark):
    from cdc.mm import extract_features, resize_payload, with_binary_payload
    d = spark.createDataFrame(
        [(1, "x" * 300), (2, "y" * 10), (3, "")], "doc_id long, text string")
    r = {row["doc_id"]: row for row in
         resize_payload(with_binary_payload(d)).collect()}
    # n=300 -> width 364 -> stride 2 -> 150 bytes, out_w 182
    assert r[1]["stride"] == 2 and r[1]["resized_bytes"] == 150
    assert r[1]["out_w"] == 182 and len(r[1]["resized"]) == 150
    assert r[2]["stride"] == 1 and r[2]["resized_bytes"] == 10
    assert r[3]["resized_bytes"] == 0
    f = {row["doc_id"]: row for row in
         extract_features(with_binary_payload(d)).collect()}
    assert len(f[1]["embedding"]) == 8
    assert f[1]["embedding"][0] == ((300 * 1 * 31) % 997) / 997.0


def test_change_feed_classifies_insert_update_delete(spark, tmp_path):
    """CDF read: per-key insert/update/delete classification between two
    snapshots, and CDF(from->mid) + CDF(mid->to) keys == CDF(from->to)."""
    import datetime
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable
    from cdc.table.timetravel import change_feed

    t0 = datetime.datetime(2026, 1, 1)
    ddl = ("repo string, path string, content string, lsn long, "
           "ts timestamp, op string, batch_id long")
    t = CdcTable(str(tmp_path / "t"), n_partitions=2)
    apply_batch(spark, t, spark.createDataFrame(
        [("r", "a.py", "A1", 1, t0, "I", 0),
         ("r", "b.py", "B1", 2, t0, "I", 0)], ddl), "b1",
        normalize=False, metrics=False)
    apply_batch(spark, t, spark.createDataFrame(
        [("r", "a.py", "A2", 3, t0, "U", 1),        # update
         ("r", "b.py", None, 4, t0, "D", 1),        # delete
         ("r", "c.py", "C1", 5, t0, "I", 1)], ddl), "b2",
        normalize=False, metrics=False)

    cf = {r["path"]: r["_change_type"]
          for r in change_feed(spark, t, 1, 2).collect()}
    assert cf == {"a.py": "update", "b.py": "delete", "c.py": "insert"}

    apply_batch(spark, t, spark.createDataFrame(
        [("r", "b.py", "B2", 6, t0, "I", 2)], ddl), "b3",
        normalize=False, metrics=False)
    direct = {(r["path"], r["_change_type"])
              for r in change_feed(spark, t, 1, 3).collect()}
    assert direct == {("a.py", "update"), ("b.py", "update"), ("c.py", "insert")}


def test_hot_key_stream_salted_equals_maxby(spark):
    """Pathological single hot KEY: the planner (small broadcast cap to
    simulate an unbroadcastable key space) escalates to salted ranking, and
    the salted result equals the skew-robust maxby bit-for-bit."""
    from cdc.dedup import last_writer_wins
    from cdc.skew import plan_lww
    # 50k events on ONE key + 1k spread keys
    hot = spark.range(50_000).select(
        F.lit("hot_repo").alias("repo"), F.lit("hot.py").alias("path"),
        F.col("id").alias("lsn"), F.col("id").alias("batch_id"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("content"))
    cold = spark.range(1_000).select(
        F.lit("cold_repo").alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        (F.col("id") + 100_000).alias("lsn"), F.lit(0).alias("batch_id"),
        F.lit("c").alias("content"))
    ev = hot.unionByName(cold)
    via, salt = plan_lww(ev, target_rows_per_task=10_000, broadcast_keys_max=10)
    assert via == "salted" and salt >= 4
    got = {(r.repo, r.path, r.lsn) for r in
           last_writer_wins(ev, via="salted", salt_buckets=salt).collect()}
    exp = {(r.repo, r.path, r.lsn) for r in
           last_writer_wins(ev, via="maxby").collect()}
    assert got == exp
    assert ("hot_repo", "hot.py", 49_999) in got


def test_exact_ntile_hot_value_range_split(spark):
    """A value group bigger than max_group_rows is range-split on sampled
    tiebreak splitters — the result must still equal global ntile exactly
    (splitters are pure partition points)."""
    from pyspark.sql import Window as W
    from cdc.skew import exact_ntile
    # 500 keys with n=1 (the dominant group) + a few bigger values
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 5 + i) for i in range(7)]
    counts = spark.createDataFrame(rows, "user_id long, n long")
    got = {r.user_id: r.ntile for r in
           exact_ntile(counts, 10, tiebreak_cols=("user_id",),
                       max_group_rows=50, range_buckets=8).collect()}
    exp = {r.user_id: r.nt for r in counts.withColumn(
        "nt", F.ntile(10).over(W.orderBy(F.desc("n"), F.asc("user_id")))).collect()}
    assert got == exp


def test_connected_components_and_keepers(spark):
    from cdc.cc import connected_components, dedup_keepers
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),    # chain of 5 -> group 1
         (10, 11), (11, 12), (10, 12),      # triangle -> group 10
         (20, 21)],                         # pair -> group 20
        "src long, dst long")
    comp = {r.id: r.grp for r in
            connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    keep = {r.group_id: (r.keeper, r.n_members) for r in
            dedup_keepers(connected_components(edges)).collect()}
    assert keep == {1: (1, 5), 10: (10, 3), 20: (20, 2)}
    # a diameter-4 chain must not converge in 1 propagation round
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1, escalate=False).collect()
    # with escalation (the default) the same exhaustion falls back to the
    # star form and still produces the right components
    comp = {r.id: r.grp for r in
            connected_components(edges, max_iter=1).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=25).filter(lambda es: any(a != b for a, b in es))


@pytest.mark.slow
@given(es=_EDGES)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_star_cc_equals_propagation(spark, es):
    """The large-star/small-star form must produce the same components as
    min-label propagation on arbitrary graphs (incl. self loops and
    duplicate edges, which both must tolerate)."""
    from cdc.cc import connected_components, connected_components_star
    edges = spark.createDataFrame(es, "src long, dst long")
    a = {r.id: r.grp for r in connected_components(edges).collect()}
    b = {r.id: r.grp for r in connected_components_star(edges).collect()}
    assert a == b


@pytest.mark.slow
@given(es=_EDGES, cut=st.integers(min_value=0, max_value=25))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_incremental_cc_equals_recompute(spark, es, cut):
    """Splitting an edge list at an arbitrary point and merging the second
    half incrementally into the first half's components must equal one
    recompute over the whole list."""
    from cdc.cc import connected_components, connected_components_incremental
    first, second = es[:cut], es[cut:]
    if not first or not second:
        return
    full = {r.id: r.grp for r in connected_components(
        spark.createDataFrame(es, "src long, dst long")).collect()}
    prior = connected_components(
        spark.createDataFrame(first, "src long, dst long"))
    incr = {r.id: r.grp for r in connected_components_incremental(
        prior, spark.createDataFrame(second, "src long, dst long")).collect()}
    assert incr == full


def test_incremental_cc_targeted(spark):
    """Bridge edge merges two prior groups; untouched group passes through
    verbatim; an all-new pair forms its own component; a touched singleton
    keeps its row."""
    from cdc.cc import connected_components, connected_components_incremental
    prior = connected_components(spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)],
        "src long, dst long"))
    # 40 is a prior singleton component (inject directly)
    prior = prior.unionAll(prior.sparkSession.createDataFrame(
        [(40, 40)], "id long, grp long"))
    new = spark.createDataFrame(
        [(3, 10),      # bridges {1,2,3} and {10,11} -> grp 1
         (50, 51),     # brand-new component
         (40, 52)],    # touched singleton gains a member
        "src long, dst long")
    got = {r.id: r.grp for r in
           connected_components_incremental(prior, new).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1,
                   20: 20, 21: 20, 30: 30, 31: 30,
                   40: 40, 50: 50, 51: 50, 52: 40}


def test_minhash_pairs_incremental_equals_full(spark):
    """Ingest-batch pair generation must produce exactly the full
    self-join's pairs that touch a new doc, and appending the returned
    new bands to the standing table must reproduce the full band table —
    so repeated ingests never re-shingle the standing corpus."""
    from cdc.parity.textops import (minhash_bands, minhash_pairs,
                                    minhash_pairs_incremental)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    old_rows = [(i, " ".join(words[i % 3:] * 3)) for i in range(12)]
    # new docs: exact copies of some old docs (guaranteed pairs) + a
    # fresh doc + a copy-pair WITHIN the batch
    new_rows = ([(100 + i, old_rows[i][1]) for i in (0, 4)]
                + [(200, " ".join(reversed(words)) )]
                + [(201, old_rows[1][1]), (202, old_rows[1][1])])
    full = minhash_pairs(mk(old_rows + new_rows))
    want = {(r.doc_a, r.doc_b) for r in
            full.filter(F.col("doc_b") >= 100).collect()}
    pairs, nb = minhash_pairs_incremental(minhash_bands(mk(old_rows)),
                                          mk(new_rows))
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == want and want   # non-empty: copies must collide
    appended = minhash_bands(mk(old_rows)).unionByName(nb)
    a = {tuple(r) for r in appended.collect()}
    b = {tuple(r) for r in minhash_bands(mk(old_rows + new_rows)).collect()}
    assert a == b


def test_simhash_incremental_equals_full(spark):
    """The SimHash ingest probe must produce exactly the full banded
    Hamming join's pairs that touch a new doc (pigeonhole completeness
    carries over: the probe side holds every new doc's 4 bands)."""
    from cdc.parity.textops import (_sim_banded, _sim_pairs,
                                    simhash_signatures)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    old_rows = [(i, " ".join(words[i % 4:] * 2)) for i in range(12)]
    new_rows = ([(100 + i, old_rows[i][1]) for i in (0, 5)]    # copies
                + [(200, " ".join(reversed(words)))]           # fresh
                + [(201, old_rows[2][1]), (202, old_rows[2][1])])
    full_b = _sim_banded(simhash_signatures(mk(old_rows + new_rows)))
    want = {(r.doc_a, r.doc_b, r.hamming) for r in
            _sim_pairs(full_b, full_b, symmetric=True)
            .filter(F.col("doc_b") >= 100).collect()}
    nb = _sim_banded(simhash_signatures(mk(new_rows)))
    standing = _sim_banded(simhash_signatures(mk(old_rows)))
    got = {(r.doc_a, r.doc_b, r.hamming) for r in
           _sim_pairs(nb, standing.unionByName(nb)).collect()}
    assert got == want and want


def test_embed_lsh_incremental_equals_full(spark):
    """The vector twin of the minhash incremental property: batch bands
    probing the standing band table must produce exactly the full
    self-join's confirmed pairs that touch a new vector, and appending
    the returned bands reproduces the full band table."""
    from cdc.vectors import (cosine_near_dup_lsh,
                             cosine_near_dup_lsh_incremental, rh_bands)

    def vec(i, copy_of=None):
        s = i if copy_of is None else copy_of
        return (i, [float(((s * 31 + j * 17) % 13) - 6) for j in range(8)])

    old = [vec(i) for i in range(15)]
    new = [vec(100, copy_of=3), vec(101, copy_of=7), vec(102),
           vec(103, copy_of=102)]   # dup WITHIN the batch too
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    full = cosine_near_dup_lsh(mk(old + new), threshold=0.95, dim=8)
    want = {(r.id_a, r.id_b, r.cosine) for r in
            full.filter(F.col("id_b") >= 100).collect()}
    pairs, nb = cosine_near_dup_lsh_incremental(
        rh_bands(mk(old), dim=8), mk(old + new), mk(new),
        threshold=0.95, dim=8)
    got = {(r.id_a, r.id_b, r.cosine) for r in pairs.collect()}
    assert got == want and want   # copies must collide on all bands
    a = {tuple(r) for r in rh_bands(mk(old), dim=8).unionByName(nb).collect()}
    b = {tuple(r) for r in rh_bands(mk(old + new), dim=8).collect()}
    assert a == b


def test_cc_self_loop_only_nodes(spark):
    """A node that appears ONLY in self loops must still come out as a
    singleton from all three CC forms (the star/incremental rounds drop
    self loops internally and re-attach the nodes)."""
    from cdc.cc import (connected_components, connected_components_star,
                        connected_components_incremental)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7), (8, 8), (3, 3)], "src long, dst long")
    want = {1: 1, 2: 1, 3: 1, 7: 7, 8: 8}
    a = {r.id: r.grp for r in connected_components(edges).collect()}
    b = {r.id: r.grp for r in connected_components_star(edges).collect()}
    assert a == want and b == want
    prior = connected_components(spark.createDataFrame(
        [(1, 2), (10, 10)], "src long, dst long"))
    new = spark.createDataFrame(
        [(10, 10),    # self loop on a touched prior singleton: row kept
         (60, 60),    # brand-new self-loop-only node: fresh singleton
         (2, 3)],     # real growth
        "src long, dst long")
    got = {r.id: r.grp for r in
           connected_components_incremental(prior, new).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 60: 60}


def test_bloom_prefilter_exact_composition(spark):
    """No false negatives ever; FP rate near the 10-bits/key design point;
    prefilter + exact confirm equals the plain join."""
    from cdc.bloom import bloom_prefilter, build_bloom
    members = spark.range(800).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s"))
    bloom = build_bloom(members, "s", expected=800)
    assert bloom.nbytes <= 2 * 800 * 10 // 8   # ~10 bits/key, small slack
    # every member survives the prefilter (bloom has no false negatives)
    assert bloom_prefilter(members, "s", bloom).count() == 800
    others = spark.range(10000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("s"))
    fp = bloom_prefilter(others, "s", bloom).count()
    assert fp / 10000 < 0.05, f"false-positive rate {fp/10000} way off"
    mixed = members.unionAll(others)
    bench = members.withColumnRenamed("s", "t")
    exact = {r.s for r in mixed.join(
        bench, F.col("s") == F.col("t"), "left_semi").collect()}
    via = {r.s for r in bloom_prefilter(mixed, "s", bloom).join(
        bench, F.col("s") == F.col("t"), "left_semi").collect()}
    assert via == exact and len(exact) == 800


def test_star_cc_long_chain(spark):
    """A diameter-16 chain: propagation needs 16 rounds; star must land
    the same single component well within its O(log^2 n) budget."""
    from cdc.cc import connected_components_star
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "src long, dst long")
    comp = {r.id: r.grp for r in
            connected_components_star(edges).collect()}
    assert set(comp.values()) == {0} and len(comp) == 17


def test_canonical_pairs_hot_bucket_guard(spark):
    """max_bucket drops oversized buckets from the pair join (both
    sides), leaves small buckets untouched, and default None keeps the
    exact semantics."""
    from cdc.lsh import canonical_pairs
    rows = ([(i, 0, "hot") for i in range(10)]      # 10-member bucket
            + [(100, 0, "cold"), (101, 0, "cold")]  # 2-member bucket
            + [(100, 1, "x"), (102, 1, "x")])
    bands = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    full = {(r.doc_a, r.doc_b) for r in canonical_pairs(
        bands, bands, "doc_id", ("band", "bucket"), "doc_a", "doc_b",
        symmetric=True).collect()}
    assert len(full) == 45 + 1 + 1
    capped = {(r.doc_a, r.doc_b) for r in canonical_pairs(
        bands, bands, "doc_id", ("band", "bucket"), "doc_a", "doc_b",
        symmetric=True, max_bucket=5).collect()}
    assert capped == {(100, 101), (100, 102)}
    # asymmetric probe: same guard on both sides
    probe = spark.createDataFrame(
        [(5, 0, "hot"), (101, 0, "cold")], "doc_id long, band int, bucket string")
    got = {(r.doc_a, r.doc_b) for r in canonical_pairs(
        probe, bands, "doc_id", ("band", "bucket"), "doc_a", "doc_b",
        max_bucket=5).collect()}
    assert got == {(100, 101)}
