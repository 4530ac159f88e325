"""Longest-prefix-match join — most-specific-rule resolution.

The lookup pattern behind IP routing tables, geo hierarchies
(state ⊂ county ⊂ tract geoids — the factfinder universe's own key
scheme), and layered config resolution: a rules table holds prefixes
of MIXED specificity and each fact must take the payload of the
longest prefix that matches its key.  The naive form is a LIKE-join
(every rule scanned per fact); the scalable form exploits that rule
prefixes only occur at a few known lengths: explode each fact key
into its prefixes AT THOSE LENGTHS (bounded fan-out = number of
levels), equi-join against the rules, and keep the longest match per
fact with one max-of-struct aggregate — no window, no LIKE, shuffles
keyed like any join (q159's suffix-explode blocklist is the boolean
cousin; this returns THE winning rule, not membership).

Determinism: rule prefixes must be unique (one payload per prefix —
the routing-table invariant), so a fact holds at most one candidate
per level and the lexicographic struct max on (prefix length) can't
tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["longest_prefix_match"]


def longest_prefix_match(
    facts: DataFrame,
    key_col: str,
    rules: DataFrame,
    prefix_col: str,
    payload_col: str,
    lengths: list[int],
) -> DataFrame:
    """Resolve each fact row to the most specific matching rule.

    ``lengths`` are the prefix lengths present in ``rules`` (levels of
    the hierarchy).  Facts with no matching rule at any level are
    dropped (left-join semantics belong to the caller's completeness
    audit).  Returns the fact columns plus ``rule_len`` and
    ``<payload_col>`` of the winning rule.
    """
    if not lengths or len(set(lengths)) != len(lengths):
        raise ValueError("lengths must be non-empty and distinct")
    fcols = facts.columns
    cands = facts.select(
        *fcols,
        F.explode(
            F.array(
                *[F.substring(F.col(key_col), 1, L) for L in sorted(lengths)]
            )
        ).alias("__pfx"),
    )
    r = rules.select(
        F.col(prefix_col).alias("__pfx"),
        F.col(payload_col).alias("__payload"),
    )
    matched = cands.join(r, "__pfx")
    best = F.max(
        F.struct(
            F.length("__pfx").alias("l"), F.col("__payload").alias("p")
        )
    ).alias("__best")
    return (
        matched.groupBy(*fcols)
        .agg(best)
        .select(
            *fcols,
            F.col("__best.l").alias("rule_len"),
            F.col("__best.p").alias(payload_col),
        )
    )
