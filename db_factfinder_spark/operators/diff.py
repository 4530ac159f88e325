"""Table diff / reconciliation — keyed snapshot comparison.

``table_diff(old, new, keys, compare_cols)`` classifies every key as
``added`` (only in new), ``removed`` (only in old), ``changed`` (in
both, at least one compared column differs, null-safe) or ``same``,
and lists which columns changed.  The data-migration acceptance check:
"what exactly differs between yesterday's table and today's?"

Plan shape: ONE full-outer equi-join on the key columns — at 100 TB
both snapshots shuffle once on the key (or neither does, when both
are bucketed on it via ``sources.bucketing.write_bucketed``); the
per-column null-safe comparisons are pure map-side expressions on the
joined row.  Output is usually tiny (the diff), so the common
follow-up aggregations are cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_same: bool = False,
) -> DataFrame:
    """Diff two keyed snapshots.  Returns one row per key present in
    either side: the key columns, ``status`` ('added' / 'removed' /
    'changed' / 'same'), and ``changed_cols`` (comma-joined names of
    differing columns, '' unless status='changed').  ``include_same``
    keeps unchanged keys (off by default — the diff, not the table).
    """
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, list(keys), "full_outer")
    diffs = [
        ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
        for c in compare_cols
    ]
    any_diff = F.lit(False)
    for d in diffs:
        any_diff = any_diff | d
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    changed_cols = F.when(
        status == "changed",
        # concat_ws skips NULLs: each column contributes its name only
        # when it differs — the engine-portable list-building idiom
        F.concat_ws(
            ",", *[F.when(d, F.lit(c)) for c, d in zip(compare_cols, diffs)]
        ),
    ).otherwise(F.lit(""))
    out = j.select(
        *keys, status.alias("status"), changed_cols.alias("changed_cols")
    )
    if not include_same:
        out = out.filter(F.col("status") != "same")
    return out
