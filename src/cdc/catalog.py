"""A minimal catalog: named tables over the snapshot store.

``Catalog(root)`` maps ``db.table`` names to table roots through one JSON
file per table under ``<root>/<db>/<table>.json`` — the single-box POSIX
stand-in for a metastore. What it adds over bare roots:

- names: ``create / get / drop / list`` with the partition spec recorded
  at create time (``CdcTable.open`` semantics thereafter — a handle can
  never disagree with the stored spec);
- cross-table operations by name: ``publish_all([("db.a", "audit"), …])``
  resolves names and delegates to the atomic multi-table publish;
- the SQL router (cdc.sql) resolves its table references here.

Entry files are written atomically (tmp + rename); DROP removes the name
only — data stays until the caller deletes the root (the safe default:
names are cheap, data is not).
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Sequence

from cdc.table.table import CdcTable

_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _entry_path(self, name: str) -> str:
        db, _, tbl = name.rpartition(".")
        db = db or "default"
        if not (_NAME.match(db) and _NAME.match(tbl)):
            raise ValueError(f"bad table name {name!r} (use db.table)")
        return os.path.join(self.root, db, f"{tbl}.json")

    def create(self, name: str, table_root: str | None = None,
               key_cols: Sequence[str] = ("repo", "path"),
               n_partitions: int = 16, layout: str = "key_hash",
               **kw) -> CdcTable:
        """Register ``name``; data lives at ``table_root`` (default: a
        ``data/<db>/<table>`` dir beside the catalog)."""
        path = self._entry_path(name)
        if os.path.exists(path):
            raise ValueError(f"table {name!r} already exists")
        if table_root is None:
            db, _, tbl = name.rpartition(".")
            table_root = os.path.join(self.root, "data", db or "default", tbl)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"root": os.path.abspath(table_root),
                       "spec": {"key_cols": list(key_cols),
                                "n_partitions": n_partitions,
                                "layout": layout}}, f)
        os.replace(tmp, path)
        return CdcTable(table_root, key_cols=key_cols,
                        n_partitions=n_partitions, layout=layout, **kw)

    def get(self, name: str, **overrides) -> CdcTable:
        """Resolve a name to a handle. Committed tables open under their
        snapshot-RECORDED spec (CdcTable.open — authoritative); a freshly
        created, never-committed table falls back to the spec stored at
        CREATE time (the first commit then records it in the snapshot)."""
        path = self._entry_path(name)
        if not os.path.exists(path):
            raise KeyError(f"no table {name!r}")
        with open(path) as f:
            entry = json.load(f)
        if "root" not in entry:
            raise ValueError(f"{name!r} is a VIEW, not a table — query it "
                             f"through cdc.sql, or drop and recreate")
        root = entry["root"]
        try:
            return CdcTable.open(root, **overrides)
        except ValueError:
            spec = entry.get("spec")
            if spec is None:
                raise
            return CdcTable(root, key_cols=tuple(spec["key_cols"]),
                            n_partitions=int(spec["n_partitions"]),
                            layout=spec["layout"], **overrides)

    def root_of(self, name: str) -> str:
        path = self._entry_path(name)
        if not os.path.exists(path):
            raise KeyError(f"no table {name!r}")
        with open(path) as f:
            return json.load(f)["root"]

    def create_view(self, name: str, sql: str,
                    replace: bool = False) -> None:
        """Register a named SQL view (resolved lazily by cdc.sql.execute,
        recursively — views may reference tables and other views)."""
        path = self._entry_path(name)
        if os.path.exists(path):
            if not replace:
                raise ValueError(f"{name!r} already exists")
            with open(path) as f:
                if "root" in json.load(f):
                    raise ValueError(f"{name!r} is a TABLE — OR REPLACE "
                                     f"only replaces views")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"view_sql": sql}, f)
        os.replace(tmp, path)

    def view_sql(self, name: str) -> str | None:
        """The view definition, or None if ``name`` is not a view."""
        path = self._entry_path(name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f).get("view_sql")

    def drop(self, name: str) -> bool:
        """Unregister the NAME; data dirs are not touched."""
        path = self._entry_path(name)
        if not os.path.exists(path):
            return False
        os.remove(path)
        return True

    def tables(self, db: str | None = None) -> list[str]:
        out = []
        for d in sorted(os.listdir(self.root)):
            full = os.path.join(self.root, d)
            if d == "data" or not os.path.isdir(full):
                continue
            if db is not None and d != db:
                continue
            for f in sorted(os.listdir(full)):
                if f.endswith(".json") and not f.endswith(".tmp"):
                    out.append(f"{d}.{f[:-5]}")
        return out

    def publish_all(self, pairs: Sequence[tuple[str, str]]) -> list[dict]:
        """Atomic multi-table publish by NAME: [(name, ref), ...]."""
        from cdc.table import wap

        return wap.publish_all([(self.get(n), ref) for n, ref in pairs])
