"""Write-Audit-Publish over the snapshot store (Iceberg WAP pattern,
SURVEY.md §4 commit protocol extension).

Flow: ``stage`` runs the normal LWW-collapse + MERGE commit machinery but
lands the snapshot under a NAMED REF (``meta/_ref-<name>``) instead of
``_current`` — data files and metadata are fully written, readers of the
table see nothing. ``read_staged`` exposes the staged state as a normal
snapshot read for audits (row counts, `cdc.quality` expectations, diff
against current). ``publish`` atomically swaps ``_current`` to the staged
snapshot iff the table is still at the staged snapshot's parent (CAS —
an audit that raced a main-line commit can never publish stale state);
``abandon`` drops the ref + metadata so ``maintenance.vacuum_orphans``
reclaims the staged files.

Staged snapshot ids come from the same allocator as main-line commits
(``store.next_snapshot_id`` — one past the highest metadata file), so a
commit landing between stage and publish can never collide with the
staged snapshot's files; it instead invalidates the publish CAS.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from cdc import quality
from cdc.meta import store
from cdc.table.table import CdcTable


def stage(spark: SparkSession, table: CdcTable, batch_final: DataFrame,
          batch_key: str, ref: str = "audit", mode: str = "cow") -> dict:
    """Run a full CoW MERGE (or MOR delta append) of an LWW-collapsed
    batch, committed to ``ref`` instead of ``_current``. Returns the
    staged snapshot dict.

    Staging onto a ref that already holds a snapshot CHAINS: the new
    commit merges against the staged state (a branch — multiple batches
    audited and published together as one fast-forward). The CAS guards
    the branch base throughout, and exactly-once applies against the
    BRANCH ledger: a batch_key already staged on this ref (or published
    on the chain's base) no-ops."""
    onto = store.read_ref(table.root, ref)
    if mode == "mor":
        return table.commit_delta(spark, batch_final, batch_key, ref=ref,
                                  onto=onto)
    return table.commit_merge(spark, batch_final, batch_key, ref=ref,
                              onto=onto)


def staged(table: CdcTable, ref: str = "audit") -> dict | None:
    """The snapshot a ref points at, or None when nothing is staged."""
    return store.read_ref(table.root, ref)


def read_staged(spark: SparkSession, table: CdcTable,
                ref: str = "audit") -> DataFrame:
    """Snapshot read of the staged state (manifest-resolved, MOR
    reconciled — byte-identical semantics to what publish would make
    visible)."""
    snap = staged(table, ref)
    if snap is None:
        raise ValueError(f"no staged snapshot under ref {ref!r}")
    return table.read(spark, snapshot_id=snap["snapshot_id"])


def publish(table: CdcTable, ref: str = "audit") -> dict:
    """Atomic pointer swap to the staged snapshot (CAS on its parent)."""
    return store.publish_ref(table.root, ref)


def abandon(table: CdcTable, ref: str = "audit") -> bool:
    """Drop a staged snapshot (audit failed / superseded). Data files are
    reclaimed by the next ``maintenance.vacuum_orphans``."""
    return store.drop_ref(table.root, ref)


def publish_all(pairs: Sequence[tuple[CdcTable, str]]) -> list[dict]:
    """Atomic MULTI-TABLE publish: fast-forward every (table, ref) pair in
    one transaction — all CASes validated under all commit locks before
    any pointer moves, a crash mid-swap rolls forward via the fsynced
    intent (``wap.recover``). The cross-table consistency primitive: a
    fact table and its derived aggregates become visible together.
    Returns published snapshots in input order."""
    by_root = store.publish_refs_atomic([(t.root, ref) for t, ref in pairs])
    return [by_root[t.root] for t, _ in pairs]


def recover(tables: Sequence[CdcTable]) -> bool:
    """Complete a crashed ``publish_all`` (roll the intent forward).
    False when there is nothing to recover."""
    return store.recover_txn([t.root for t in tables])


def audit_and_publish(
    spark: SparkSession,
    table: CdcTable,
    ref: str = "audit",
    predicates: Mapping[str, Column] | None = None,
    unique: Sequence[str] | None = None,
) -> dict:
    """The whole gate: evaluate `cdc.quality` expectations against the
    staged snapshot in one aggregate pass; publish on success, abandon and
    re-raise ``ExpectationError`` on violation. Returns the published
    snapshot."""
    df = read_staged(spark, table, ref)
    try:
        quality.enforce(df, predicates or {}, unique=unique)
    except quality.ExpectationError:
        abandon(table, ref)
        raise
    return publish(table, ref)
