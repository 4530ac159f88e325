"""Targeted row deletion with file-level zone-map pruning — the
"right to be forgotten" maintenance pass of a lakehouse table.

Deleting a handful of keys from a 100 TB table must NOT rewrite the
table: parquet footers already carry per-file/row-group min/max
statistics, so any file whose [min, max] key envelope cannot contain
a target key is PROVABLY untouched and is left byte-identical on
disk — only the files that might hold a target are read, filtered,
and atomically replaced 1:1 (same file name, tmp-then-rename).  On a
key-clustered layout (sorted or Z-ordered writes,
``sources/layout.py``) that bounds the rewrite to O(targets) files —
the same envelope argument ``operators/zonemap.py`` audits for scans,
applied to writes.

Stats come from the parquet FOOTERS via pyarrow (no data pages are
decoded for pruning), and the per-file rewrite uses pyarrow too so
the file-for-file layout survives (a Spark write would fan each file
into a directory).  Production systems layer deletion vectors on top
to defer even the affected-file rewrite; the pruning logic — the part
with engine substance — is identical.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

__all__ = ["plan_targeted_delete", "targeted_delete"]


def _key_envelope(path: str, key_col: str):
    """(min, max) of ``key_col`` across a file's row groups, from the
    footer only.  Returns None when any row group lacks stats (the
    file then counts as affected — correctness over pruning)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(key_col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def plan_targeted_delete(
    table_dir: str, key_col: str, keys: list
) -> dict:
    """Split the table's files into pruned / affected by the footer
    envelopes.  Output: ``{"affected": [paths], "pruned": [paths]}``."""
    files = sorted(
        os.path.join(table_dir, f)
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    )
    affected, pruned = [], []
    for path in files:
        env = _key_envelope(path, key_col)
        if env is None or any(env[0] <= k <= env[1] for k in keys):
            affected.append(path)
        else:
            pruned.append(path)
    return {"affected": affected, "pruned": pruned}


def targeted_delete(table_dir: str, key_col: str, keys: list) -> dict:
    """Delete all rows whose ``key_col`` is in ``keys``; rewrite ONLY
    the files whose footer envelope admits a target.  Each affected
    file is rewritten to a tmp path and renamed over the original
    (atomic on POSIX), preserving the file-per-file layout.

    Returns ``{"files_total", "files_rewritten", "rows_deleted"}``.
    """
    plan = plan_targeted_delete(table_dir, key_col, keys)
    targets = set(keys)
    deleted = 0
    rewritten = 0
    for path in plan["affected"]:
        t = pq.read_table(path)
        col = t.column(key_col).to_pylist()
        mask = [v not in targets for v in col]
        if all(mask):
            continue  # envelope admitted the key, rows didn't match
        kept = t.filter(mask)
        deleted += len(col) - kept.num_rows
        rewritten += 1
        tmp = path + ".tmp"
        pq.write_table(kept, tmp)
        os.replace(tmp, path)
    return {
        "files_total": len(plan["affected"]) + len(plan["pruned"]),
        "files_rewritten": rewritten,
        "rows_deleted": deleted,
    }
