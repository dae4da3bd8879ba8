"""Independent pure-pandas expected-state reducer (FIXTURES.md §4).

Deliberately NOT Spark: a ~40-line sequential fold over the event log that
defines the engine's correctness contract. The engine's distributed replay
must reproduce exactly this state (set-equality on (repo, path,
content_sha256) plus row count) — the sandbox form of BASELINE.json's
"per-row content sha256 equality against the reference snapshot".

Semantics (upsert CDC):
- drop exact (batch_id, lsn) duplicate deliveries;
- apply events in (lsn, batch_id) order per key;
- 'I'/'U' both upsert (U on a dead/missing key resurrects it);
- 'D' removes the key.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def expected_state(events: pd.DataFrame) -> pd.DataFrame:
    """events: columns (lsn, batch_id, op, repo, path, commit, lang, content).

    Returns (repo, path, commit, lang, content_sha256, last_lsn), one row per
    surviving key, sorted by (repo, path).
    """
    ev = events.drop_duplicates(subset=["batch_id", "lsn"]).sort_values(["lsn", "batch_id"])
    state: dict[tuple[str, str], tuple] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = (row.commit, row.lang, row.content, row.lsn)
    rows = [
        {
            "repo": k[0],
            "path": k[1],
            "commit": v[0],
            "lang": v[1],
            "content_sha256": hashlib.sha256(v[2].encode()).hexdigest(),
            "last_lsn": v[3],
        }
        for k, v in state.items()
    ]
    out = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content_sha256", "last_lsn"])
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
