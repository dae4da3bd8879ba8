"""S4 — JSON snapshot / manifest metadata store for the Iceberg-style table.

Layout under a table root::

    root/
      data/snap-<sid>/part=<p>/*.parquet    # immutable data files
      meta/snap-<sid>.json                  # snapshot: manifest + ledger
      meta/_current                         # pointer file -> snap-<sid>.json
      metrics/                              # lineage_metrics parquet (append)

Commit protocol (SURVEY.md §4 "exactly-once commit"):
1. stage data files under a snapshot-deterministic directory (a retried
   commit overwrites the same staging paths — no duplicates);
2. write + fsync the snapshot JSON (manifest, schema, batch ledger);
3. atomically swap ``meta/_current`` via ``os.replace`` (POSIX-atomic).
A crash anywhere before (3) leaves the table at the parent snapshot with
only invisible orphan files. Single-writer by design (optimistic
multi-writer CAS is an Iceberg-catalog concern, out of scope per SURVEY).

Scale note: each snapshot embeds the *full* file manifest and a bounded
recent-batch ledger. At 10^10-event scale the manifest would move to
Iceberg's two-level (manifest-list -> manifest) form; the pruning
interfaces here (per-file part + lsn_min/lsn_max stats) are exactly what
that form needs, so the swap is mechanical.
"""

from __future__ import annotations

import json
import os
from typing import Any

CURRENT = "_current"
LEDGER_KEEP = 10_000  # recent batch keys kept for duplicate-epoch detection


def meta_dir(root: str) -> str:
    return os.path.join(root, "meta")


def snap_path(root: str, snapshot_id: int) -> str:
    return os.path.join(meta_dir(root), f"snap-{snapshot_id:012d}.json")


def read_current(root: str) -> dict[str, Any] | None:
    """Resolve the current snapshot dict, or None for an empty/new table."""
    ptr = os.path.join(meta_dir(root), CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return read_snapshot_file(os.path.join(meta_dir(root), name))


def read_snapshot_file(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def read_snapshot(root: str, snapshot_id: int) -> dict[str, Any]:
    return read_snapshot_file(snap_path(root, snapshot_id))


def list_snapshots(root: str) -> list[dict[str, Any]]:
    d = meta_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("snap-") and name.endswith(".json"):
            out.append(read_snapshot_file(os.path.join(d, name)))
    return out


def write_snapshot(root: str, snap: dict[str, Any]) -> None:
    """Steps (2)+(3): durable snapshot JSON, then atomic pointer swap."""
    os.makedirs(meta_dir(root), exist_ok=True)
    path = snap_path(root, snap["snapshot_id"])
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)

    ptr = os.path.join(meta_dir(root), CURRENT)
    ptr_tmp = ptr + ".tmp"
    with open(ptr_tmp, "w") as f:
        f.write(os.path.basename(path))
        f.flush()
        os.fsync(f.fileno())
    os.replace(ptr_tmp, ptr)  # the commit point


def new_snapshot(
    parent: dict[str, Any] | None,
    batch_key: str,
    lsn_high: int,
    files: list[dict[str, Any]],
    schema_ddl: str,
    operation: str = "merge",
    committed_ts: str = "",
) -> dict[str, Any]:
    parent_id = parent["snapshot_id"] if parent else 0
    ledger = list(parent["committed_batches"]) if parent else []
    ledger.append(batch_key)
    return {
        "snapshot_id": parent_id + 1,
        "parent_id": parent_id,
        "batch_key": batch_key,
        "lsn_high": lsn_high,
        "operation": operation,
        "committed_ts": committed_ts,
        "schema_ddl": schema_ddl,
        "committed_batches": ledger[-LEDGER_KEEP:],
        "files": files,
    }
