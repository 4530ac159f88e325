"""URL normalization for web-crawl corpora — the canonicalization pass
that runs BEFORE URL-keyed dedup and domain accounting (two spellings
of one page must collide on the key, or exact dedup silently
under-merges).

Pure column expressions over engine-portable regexes (simple character
classes only — identical semantics under Java regex and RE2), so the
pass runs inside whole-stage codegen on the scan and the SQL oracle
re-derives every field.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/rest — anchored, greedy host up to :/ or end
_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add canonical URL components:

    * ``scheme`` — lowercased;
    * ``host`` — lowercased, leading 'www.' stripped;
    * ``site`` — naive registrable domain = last two host labels
      (documented approximation: a real deployment substitutes the
      Public Suffix List here, as a broadcast suffix table — the
      domain_blocklist_filter machinery);
    * ``path`` — fragment and query stripped, trailing '/' removed
      ('' for the root);
    * ``url_norm`` — scheme://host/path with default ports (http 80,
      https 443) dropped, non-default ports kept.

    Unparseable rows (no scheme://host shape) keep NULL components —
    surfaced, not guessed.
    """
    u = F.col(url_col)
    scheme = F.lower(F.nullif(F.regexp_extract(u, _SCHEME, 1), F.lit("")))
    raw_host = F.lower(
        F.nullif(F.regexp_extract(u, _HOST, 1), F.lit(""))
    )
    host = F.regexp_replace(raw_host, r"^www\.", "")
    port = F.nullif(F.regexp_extract(u, _PORT, 1), F.lit(""))
    # regexp_extract returns '' (not NULL) on no match, so gate path on
    # a parsed host to honor the NULL-components contract for
    # unparseable rows ('' is reserved for a parsed root path).
    path = F.when(
        host.isNotNull(),
        F.regexp_replace(F.regexp_extract(u, _PATH, 1), r"/+$", ""),
    )
    labels = F.split(host, r"\.")
    site = F.when(
        F.size(labels) >= 2,
        F.concat_ws(
            ".",
            F.element_at(labels, -2),
            F.element_at(labels, -1),
        ),
    ).otherwise(host)
    default_port = (
        (scheme == "http") & (port == "80")
    ) | ((scheme == "https") & (port == "443"))
    port_part = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    url_norm = F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path),
    )
    return df.withColumns(
        {
            "scheme": scheme,
            "host": host,
            "site": site,
            "path": path,
            "url_norm": url_norm,
        }
    )


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 16,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Resolve redirect chains to their final target by POINTER
    DOUBLING: ``ceil(log2(max_hops))`` self-joins instead of
    ``max_hops`` sequential ones — the only shape that survives long
    chains at crawl scale (each round squares the reachable distance;
    every round is one equi-join shuffle on the node id).

    ``edges`` holds one row per redirecting URL (``src`` → ``dst``);
    a URL absent from ``src`` is terminal.  Returns one row per node
    (every URL appearing on either side): ``url``, ``final_url``,
    ``hops`` (exact chain length when resolved), and ``resolved`` —
    False for chains longer than ``max_hops`` and for redirect cycles,
    whose walk never reaches a terminal node (surfaced, not guessed).
    ``max_hops`` must be a power of two ≥ 2: the doubling rounds reach
    exactly ``max_hops`` only then, and a silently rounded-up cap
    would resolve chains the contract says must be flagged.

    The hop count stays exact under composition because a terminal
    node maps to itself with hop 0: once a walk lands, further rounds
    add zero.

    Lineage is truncated per round (``checkpoint_mode`` — see
    ``llmdata.checkpointing``): a self-join whose input is a live plan
    re-embeds the whole subtree on BOTH sides, doubling plan size per
    round (2^rounds copies of the base scan by round r — the
    exponential-plan trap, same class the catalog batch hit).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    if max_hops < 2 or max_hops & (max_hops - 1) != 0:
        raise ValueError("max_hops must be a power of two >= 2")
    nodes = (
        edges.select(F.col(src).alias("u"))
        .unionByName(edges.select(F.col(dst).alias("u")))
        .distinct()
    )
    step = edges.select(F.col(src).alias("u"), F.col(dst).alias("nxt"))
    jump = nodes.join(step, "u", "left").select(
        "u",
        F.coalesce(F.col("nxt"), F.col("u")).alias("v"),
        F.when(F.col("nxt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("h"),
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        jump = materialize(jump, checkpoint_mode)
        b = jump.select(
            F.col("u").alias("bu"),
            F.col("v").alias("bv"),
            F.col("h").alias("bh"),
        )
        jump = jump.join(b, jump["v"] == b["bu"]).select(
            "u",
            F.col("bv").alias("v"),
            (F.col("h") + F.col("bh")).alias("h"),
        )
    terminal = edges.select(F.col(src).alias("v")).distinct().withColumn(
        "_redirects", F.lit(True)
    )
    return jump.join(terminal, "v", "left").select(
        F.col("u").alias("url"),
        F.col("v").alias("final_url"),
        F.col("h").alias("hops"),
        F.col("_redirects").isNull().alias("resolved"),
    )
