"""SQL façade: one ``execute(spark, catalog, statement)`` entry that
routes a narrow, loudly-bounded SQL dialect onto the engine's primitives.

Supported statements (table references resolve through ``cdc.catalog``):

- ``CREATE TABLE db.t KEY (repo, path) [PARTITIONS n] [LAYOUT key_hash]``
- ``DROP TABLE db.t``                      (name only; data stays)
- ``INSERT INTO db.t <SELECT ...>``        (rows become op='U' upserts at
  one statement LSN — CDC tables have no blind append)
- ``DELETE FROM db.t WHERE <pred>``        → cdc.table.mutate.delete_where
- ``UPDATE db.t SET c = expr, ... WHERE <pred>`` → update_where
- ``ALTER TABLE db.t RENAME COLUMN a TO b | DROP COLUMN a |
  ADD COLUMN a <type> | ALTER COLUMN a TYPE <type>`` → cdc.table.alter
- ``OPTIMIZE db.t [ZORDER BY (a, b)]``     → maintenance.compact
- ``VACUUM db.t [RETAIN k SNAPSHOTS]``     → expire_snapshots + orphan GC
- ``SELECT ...`` over registered names, with time travel:
  ``FROM db.t [VERSION AS OF k | TIMESTAMP AS OF 'ts']`` — each reference
  is bound to a temp view of the right snapshot, then handed to
  ``spark.sql`` (full Spark SQL power downstream of the binding).

Everything mutating runs through ``apply_batch``/commit machinery, so the
statements inherit exactly-once ledgers, CAS concurrency and MOR/CoW
semantics. Unrecognized statements raise — this is a façade, not a parser;
the DataFrame API underneath remains the full surface.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.catalog import Catalog

_WS = r"\s+"
_ID = r"[A-Za-z_][A-Za-z0-9_]*"
_TBL = rf"{_ID}(?:\.{_ID})?"


def _key(stmt: str) -> str:
    return f"sql-{uuid.uuid4().hex[:12]}"


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (SET lists carry exprs with calls and
    quoted string literals — commas inside parens or '…' don't split)."""
    out, depth, buf, quoted = [], 0, [], False
    for ch in s + ",":
        if quoted:
            buf.append(ch)
            quoted = ch != "'"
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            quoted = ch == "'"
            depth += ch in "(["
            depth -= ch in ")]"
            buf.append(ch)
    return [p for p in out if p]


def execute(spark: SparkSession, catalog: Catalog, stmt: str,
            **kw) -> DataFrame | dict | None:
    """Route one statement. Returns a DataFrame for SELECT, the commit
    snapshot dict for mutations, None for DDL. ``kw`` passes through to
    the underlying primitive (e.g. ``mode='cow'``, ``conflict_retries``)."""
    s = stmt.strip().rstrip(";").strip()

    m = re.match(rf"CREATE{_WS}TABLE{_WS}({_TBL}){_WS}KEY\s*\(([^)]+)\)"
                 rf"(?:{_WS}PARTITIONS{_WS}(\d+))?"
                 rf"(?:{_WS}LAYOUT{_WS}({_ID}))?$", s, re.I)
    if m:
        name, keys, parts, layout = m.groups()
        catalog.create(name, key_cols=tuple(k.strip() for k in keys.split(",")),
                       n_partitions=int(parts or 16),
                       layout=(layout or "key_hash").lower(), **kw)
        return None

    m = re.match(rf"DROP{_WS}(?:TABLE|VIEW){_WS}({_TBL})$", s, re.I)
    if m:
        catalog.drop(m.group(1))
        return None

    m = re.match(rf"CREATE(?:{_WS}OR{_WS}REPLACE)?{_WS}VIEW{_WS}({_TBL})"
                 rf"{_WS}AS{_WS}(SELECT\b.*)$", s, re.I | re.S)
    if m:
        catalog.create_view(m.group(1), m.group(2),
                            replace="REPLACE" in s[:40].upper())
        return None

    m = re.match(rf"INSERT{_WS}INTO{_WS}({_TBL}){_WS}(SELECT\b.*)$", s,
                 re.I | re.S)
    if m:
        from datetime import datetime, timezone

        from cdc.pipeline import apply_batch

        t = catalog.get(m.group(1))
        rows = execute(spark, catalog, m.group(2))
        ts = datetime.now(timezone.utc).isoformat()
        ev = (rows
              .withColumn("lsn", F.lit(t.lsn_high() + 1))
              .withColumn("ts", F.to_timestamp(F.lit(ts)))
              .withColumn("op", F.lit("U"))
              .withColumn("batch_id", F.lit(0).cast("long")))
        return apply_batch(spark, t, ev, _key(s), normalize=False,
                           metrics=False, **kw)

    m = re.match(rf"DELETE{_WS}FROM{_WS}({_TBL}){_WS}WHERE{_WS}(.+)$", s,
                 re.I | re.S)
    if m:
        from cdc.table.mutate import delete_where

        return delete_where(spark, catalog.get(m.group(1)), m.group(2),
                            _key(s), **kw)

    m = re.match(rf"UPDATE{_WS}({_TBL}){_WS}SET{_WS}(.+?){_WS}WHERE{_WS}(.+)$",
                 s, re.I | re.S)
    if m:
        from cdc.table.mutate import update_where

        sets = {}
        for part in _split_top(m.group(2)):
            col, _, expr = part.partition("=")
            sets[col.strip()] = expr.strip()
        return update_where(spark, catalog.get(m.group(1)), m.group(3),
                            sets, _key(s), **kw)

    m = re.match(rf"ALTER{_WS}TABLE{_WS}({_TBL}){_WS}(.+)$", s, re.I | re.S)
    if m:
        from cdc.table import alter

        t, rest = catalog.get(m.group(1)), m.group(2).strip()
        m2 = re.match(rf"RENAME{_WS}COLUMN{_WS}({_ID}){_WS}TO{_WS}({_ID})$",
                      rest, re.I)
        if m2:
            return alter.rename_column(t, m2.group(1), m2.group(2))
        m2 = re.match(rf"DROP{_WS}COLUMN{_WS}({_ID})$", rest, re.I)
        if m2:
            return alter.drop_column(t, m2.group(1))
        m2 = re.match(rf"ADD{_WS}COLUMN{_WS}({_ID}){_WS}(.+)$", rest, re.I)
        if m2:
            return alter.add_column(t, m2.group(1), m2.group(2))
        m2 = re.match(rf"ALTER{_WS}COLUMN{_WS}({_ID}){_WS}TYPE{_WS}(.+)$",
                      rest, re.I)
        if m2:
            return alter.widen_column(t, m2.group(1), m2.group(2))
        m2 = re.match(rf"ADD{_WS}CONSTRAINT{_WS}({_ID}){_WS}CHECK\s*"
                      rf"\((.+)\)$", rest, re.I | re.S)
        if m2:
            return alter.set_check(t, m2.group(1), m2.group(2))
        m2 = re.match(rf"DROP{_WS}CONSTRAINT{_WS}({_ID})$", rest, re.I)
        if m2:
            return alter.drop_check(t, m2.group(1))
        m2 = re.match(rf"SET{_WS}TBLPROPERTIES\s*\(\s*'([^']+)'\s*=\s*"
                      rf"'([^']*)'\s*\)$", rest, re.I)
        if m2:
            return alter.set_property(t, m2.group(1), m2.group(2))
        raise ValueError(f"unsupported ALTER TABLE clause: {rest!r}")

    m = re.match(rf"OPTIMIZE{_WS}({_TBL})"
                 rf"(?:{_WS}ZORDER{_WS}BY\s*\(([^)]+)\))?$", s, re.I)
    if m:
        from cdc.table.maintenance import compact

        cols = ([c.strip() for c in m.group(2).split(",")]
                if m.group(2) else None)
        return compact(spark, catalog.get(m.group(1)), cluster_by=cols,
                       zorder=bool(cols and len(cols) > 1), **kw)

    m = re.match(rf"VACUUM{_WS}({_TBL})"
                 rf"(?:{_WS}RETAIN{_WS}(\d+){_WS}SNAPSHOTS)?$", s, re.I)
    if m:
        from cdc.table.maintenance import expire_snapshots, vacuum_orphans

        t = catalog.get(m.group(1))
        expired = expire_snapshots(t, keep_last=int(m.group(2) or 3))
        return {"expired": expired, "removed": vacuum_orphans(t)}

    m = re.match(rf"SHOW{_WS}TABLES(?:{_WS}IN{_WS}({_ID}))?$", s, re.I)
    if m:
        rows = [(n.split(".", 1)[0], n.split(".", 1)[1])
                for n in catalog.tables(db=m.group(1))]
        return spark.createDataFrame(rows or [("", "")],
                                     "database string, table string"
                                     ).filter("table <> ''")

    m = re.match(rf"DESCRIBE{_WS}(?:(HISTORY|DETAIL|TABLE){_WS})?({_TBL})$",
                 s, re.I)
    if m:
        kind = (m.group(1) or "TABLE").upper()
        t = catalog.get(m.group(2))
        if kind == "HISTORY":
            return t.commits_df(spark)
        if kind == "DETAIL":
            snap = t.current_snapshot() or {}
            import json as _json

            row = (t.root, _json.dumps(t.table_config()),
                   _json.dumps(snap.get("properties") or {}),
                   snap.get("snapshot_id", 0), snap.get("lsn_high", -1),
                   len(snap.get("files", ())))
            return spark.createDataFrame(
                [row], "location string, table_config string, "
                       "properties string, snapshot_id long, lsn_high long, "
                       "n_files int")
        snap = t.current_snapshot()
        if snap is None:
            raise ValueError(f"{m.group(2)} has no commits yet")
        fields = [(n.strip().split(" ", 1)[0], n.strip().split(" ", 1)[1])
                  for n in _split_top(snap["schema_ddl"])]
        return spark.createDataFrame(fields, "col_name string, data_type string")

    m = re.match(rf"EXPLAIN(?:{_WS}(EXTENDED|FORMATTED))?{_WS}(SELECT\b.*)$",
                 s, re.I | re.S)
    if m:
        mode = (m.group(1) or "FORMATTED").upper()
        return spark.sql(f"EXPLAIN {mode} "
                         f"{_bind_refs(spark, catalog, m.group(2))}")

    if re.match(r"SELECT\b", s, re.I):
        return _select(spark, catalog, s)

    raise ValueError(f"unsupported statement: {stmt!r}")


def _select(spark: SparkSession, catalog: Catalog, s: str,
            depth: int = 0) -> DataFrame:
    """Bind catalog table references to temp views, then spark.sql."""
    return spark.sql(_bind_refs(spark, catalog, s, depth))


def _bind_refs(spark: SparkSession, catalog: Catalog, s: str,
               depth: int = 0) -> str:
    """Rewrite catalog table references (with optional time travel) to
    bound temp views and return the rewritten SQL. References are matched
    after FROM and JOIN keywords only — plain identifiers elsewhere are
    untouched. Named views resolve recursively (cycle-bounded)."""
    if depth > 10:
        raise ValueError("view nesting exceeds 10 levels (cycle?)")
    bound = {}

    def bind(name: str, version: str | None, ts: str | None) -> str:
        view = re.sub(r"\W", "_", f"cdc_{name}_{version or ''}_{ts or ''}")
        if view not in bound:
            vsql = catalog.view_sql(name)
            if vsql is not None:
                if version or ts:
                    raise ValueError(f"time travel on a VIEW ({name}) — "
                                     f"travel the base tables instead")
                df = _select(spark, catalog, vsql, depth + 1)
            else:
                t = catalog.get(name)
                df = t.read(spark,
                            snapshot_id=int(version) if version else None,
                            as_of=ts.strip("'\"") if ts else None)
            df.createOrReplaceTempView(view)
            bound[view] = True
        return view

    pat = re.compile(
        rf"\b(FROM|JOIN){_WS}({_TBL})"
        rf"(?:{_WS}VERSION{_WS}AS{_WS}OF{_WS}(\d+)"
        rf"|{_WS}TIMESTAMP{_WS}AS{_WS}OF{_WS}('[^']*'))?", re.I)

    def repl(m: re.Match) -> str:
        name = m.group(2)
        try:
            if catalog.view_sql(name) is None:
                catalog.root_of(name)
        except (KeyError, ValueError):
            return m.group(0)          # not ours: subquery alias, etc.
        return f"{m.group(1)} {bind(name, m.group(3), m.group(4))}"

    return pat.sub(repl, s)


def transaction(spark: SparkSession, catalog: Catalog,
                stmts: list[str]) -> list[dict]:
    """Cross-table ATOMIC transaction: run INSERT / UPDATE / DELETE
    statements staged on a per-table branch ref, then publish every
    touched table in ONE all-or-nothing pointer-swap transaction
    (``wap.publish_all`` — CAS-validated before any pointer moves,
    crash-recovered by roll-forward). Any statement failure — including
    a CHECK-constraint violation — abandons every staged branch: no
    table shows any of the transaction's effects.

    Isolation: statements see the transaction's OWN staged state (same-
    table statements chain), never other writers'; a concurrent main-line
    commit on any touched table fails the publish CAS and the whole
    transaction aborts (optimistic snapshot isolation). Only mutating
    statements are allowed inside — run SELECTs before or after.

    Returns the published snapshots (one per touched table, in first-
    touch order)."""
    import uuid as _uuid

    from cdc import quality
    from cdc.dedup import last_writer_wins
    from cdc.table import wap

    ref = f"txn{_uuid.uuid4().hex[:10]}"
    touched: dict[str, "object"] = {}

    def table_for(name: str):
        if name not in touched:
            touched[name] = catalog.get(name)
        return touched[name]

    def base_of(t):
        return wap.staged(t, ref) or t.current_snapshot()

    def enforce_checks(t, batch):
        snap = base_of(t)
        props = (snap or {}).get("properties") or {}
        checks = {k[len("check."):]: F.expr(v) for k, v in props.items()
                  if k.startswith("check.")}
        if checks:
            live = (batch.filter(F.col("op") != "D")
                    if "op" in batch.columns else batch)
            quality.enforce(live, checks)

    try:
        for i, stmt in enumerate(stmts):
            s = stmt.strip().rstrip(";").strip()
            m = re.match(rf"INSERT{_WS}INTO{_WS}({_TBL}){_WS}(SELECT\b.*)$",
                         s, re.I | re.S)
            if m:
                from datetime import datetime, timezone

                t = table_for(m.group(1))
                base = base_of(t)
                rows = execute(spark, catalog, m.group(2))
                lsn = (base["lsn_high"] if base else -1) + 1
                ts = datetime.now(timezone.utc).isoformat()
                batch = (rows
                         .withColumn("lsn", F.lit(lsn).cast("long"))
                         .withColumn("ts", F.to_timestamp(F.lit(ts)))
                         .withColumn("op", F.lit("U"))
                         .withColumn("batch_id", F.lit(0).cast("long")))
                batch = last_writer_wins(batch, keys=t.key_cols, via="maxby")
                enforce_checks(t, batch)
                wap.stage(spark, t, batch, f"{ref}-s{i}", ref=ref)
                continue
            m = re.match(rf"DELETE{_WS}FROM{_WS}({_TBL}){_WS}WHERE{_WS}(.+)$",
                         s, re.I | re.S)
            if m:
                from cdc.table.mutate import _matched_events

                t = table_for(m.group(1))
                ev = _matched_events(spark, t, m.group(2), "D",
                                     base=base_of(t))
                wap.stage(spark, t, ev, f"{ref}-s{i}", ref=ref)
                continue
            m = re.match(rf"UPDATE{_WS}({_TBL}){_WS}SET{_WS}(.+?)"
                         rf"{_WS}WHERE{_WS}(.+)$", s, re.I | re.S)
            if m:
                from cdc.table.mutate import _matched_events

                t = table_for(m.group(1))
                sets = {}
                for part in _split_top(m.group(2)):
                    col, _, expr = part.partition("=")
                    sets[col.strip()] = expr.strip()
                ev = _matched_events(spark, t, m.group(3), "U", set=sets,
                                     base=base_of(t))
                enforce_checks(t, ev)
                wap.stage(spark, t, ev, f"{ref}-s{i}", ref=ref)
                continue
            raise ValueError(
                f"only INSERT/UPDATE/DELETE are allowed inside a "
                f"transaction, got: {stmt!r}")
        return wap.publish_all([(t, ref) for t in touched.values()])
    except BaseException:
        for t in touched.values():
            try:
                wap.abandon(t, ref)
            except Exception:
                pass
        raise
