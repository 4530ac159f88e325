"""Line-level (CCNet-style) boilerplate removal.

Web-scale training corpora are full of per-site boilerplate (nav bars,
cookie banners, footers) that repeats across thousands of pages while
each page's body is unique.  Document-level dedup (exact_dedup /
minhash LSH) keeps those pages, so the boilerplate survives into the
training mix.  The published fix (CCNet, Wenzek et al. 2019; also the
Gopher/MassiveText pipeline) is *line-level* dedup: hash every line,
count how many distinct documents each line appears in, and strip
lines that recur in too many documents.

Scale shape (the whole point — nothing here is pairwise):

* one explode to lines (linear in corpus bytes),
* one map-side-combinable count-distinct per line key,
* one equi-join line→count (both sides hash-partitioned by the line
  key; boilerplate keys are high-count but the *count frame* is one
  row per key, so no skewed build side),
* one per-document re-assembly groupBy.

At 100 TB this is exactly three shuffles, each on a key with bounded
per-key payload — contrast with pair-generation dedup where a hot
shingle explodes quadratically.

Reference scope note: the factfinder reference has no text pipeline;
this module is part of the LLM-data extension surface (SURVEY.md §2.10
extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def line_key(line: Column | str) -> Column:
    """Dedup key of one line: md5 of the lowercased, trimmed content.
    Near-identical boilerplate that differs only in case/indentation
    collapses to one key; the *original* line text is what's kept or
    dropped, never rewritten."""
    c = F.col(line) if isinstance(line, str) else line
    return F.md5(F.lower(F.trim(c)))


def line_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (doc, line): ``id, pos, line`` with ``pos`` the
    1-based line ordinal.  NULL-text documents contribute no rows (they
    are re-attached by :func:`line_dedup`)."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos0", "line"),
        )
        .select("id", (F.col("pos0") + 1).alias("pos"), "line")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 2,
) -> DataFrame:
    """Strip lines that occur in ``>= max_docs`` distinct documents;
    re-assemble each document from its surviving lines in order.

    Rules (chosen to be engine-portable and oracle-checkable):

    * a line is *blank* when it trims to ''; blank lines are never
      dropped (they are structure, not content, and would otherwise be
      "duplicated" across every document);
    * a non-blank line is dropped iff its :func:`line_key` appears in
      at least ``max_docs`` distinct documents (a line repeated many
      times *within* one document is kept — that is q62's repetition
      signal, a different axis);
    * output is one row per input document: ``doc_id, n_lines,
      n_dropped, clean_text`` where ``clean_text`` joins kept lines
      with ``\\n`` ('' when every line was dropped, NULL only for
      NULL-text input).

    Plan: explode → count-distinct per key (partial aggregation
    upstream of the shuffle) → broadcast-free equi-join on the key →
    per-document ``max(struct)``-free ordered re-assembly via
    ``sort_array(collect_list(struct(pos, line)))`` (partition-order
    independent by construction).
    """
    lines = line_frame(df, text_col, id_col)
    nonblank = F.trim(F.col("line")) != ""
    keyed = lines.withColumn(
        "k", F.when(nonblank, line_key("line"))
    )
    counts = (
        keyed.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= max_docs)
    )
    # Left join against the *filtered* count frame: only boilerplate
    # keys ship, so the join build stays proportional to the amount of
    # boilerplate, not the corpus.
    flagged = keyed.join(counts, "k", "left").withColumn(
        "dropped", F.col("n_docs").isNotNull()
    )
    rebuilt = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("dropped").cast("bigint")).alias("n_dropped"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("dropped"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    # Re-attach NULL-text documents (no line rows) with NULL clean_text.
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    return (
        base.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.when(F.col("__t").isNotNull(), F.coalesce("clean_text", F.lit("")))
            .alias("clean_text"),
        )
    )


def boilerplate_density(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
) -> DataFrame:
    """Per-document boilerplate fraction: a line is BOILERPLATE when
    its normalized fingerprint appears in ≥ ``min_df`` documents
    (nav chrome, cookie banners, license footers — the lines CCNet
    drops corpus-wide).  Where :func:`line_dedup` rewrites documents,
    this SCORES them, feeding quality filters that drop documents
    which are mostly template.

    Two keyed shuffles: line-key document frequency (count DISTINCT
    docs per key — a line repeated within one doc is repetition, not
    boilerplate), then the per-doc rollup.  Returns
    ``{id_col}, n_lines, n_boiler, boiler_frac``.
    """
    lines = line_frame(df, text_col, id_col).select(
        "id", "pos", line_key("line").alias("k")
    )
    dfreq = lines.select("id", "k").distinct().groupBy("k").agg(
        F.count(F.lit(1)).alias("line_df")
    )
    scored = lines.join(dfreq, "k")
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("line_df") >= min_df, 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac",
            F.col("n_boiler").cast("double") / F.col("n_lines").cast("double"),
        )
    )


def dedup_lines_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document line dedup — the page-repair transform for
    scraped documents whose template repeats blocks inside one page
    (cookie banners between sections, duplicated nav footers):
    keep each line's FIRST occurrence in document order, where
    occurrence identity is the normalized ``line_key``; whitespace-
    blank lines (``trim(raw) == ''``) always survive — they are
    layout, not content.  (Punctuation-only separators like a
    repeated ``---`` rule are NOT exempt: they share a ``line_key``
    and dedup like content — deliberate, since a template repeating
    its rule is exactly the boilerplate this removes.)  Complements
    ``line_dedup`` (corpus-level
    CCNet dedup): this one never crosses documents, so it is a pure
    per-row array computation — zero shuffles, zero joins, runs at
    scan speed on 100 TB.

    Returns ``(id_col, clean_text, n_lines, n_dropped)``.  Per-row
    cost is O(lines²) on the bounded per-page line count; the
    first-occurrence scan slices a let-bound MATERIALIZED array (the
    shingles() inlining trap)."""
    from db_factfinder_spark.functions.expr import let

    def over_lines(lines: Column) -> Column:
        keys = F.transform(lines, lambda x: line_key(x))

        def keep(i: Column) -> Column:
            k = F.get(keys, i - 1)
            raw = F.get(lines, i - 1)
            return (F.trim(raw) == "") | ~F.exists(
                F.slice(keys, 1, i - 1), lambda p: p == k
            )

        idx = F.sequence(F.lit(1), F.size(lines))
        kept = F.filter(idx, keep)
        return F.struct(
            F.array_join(
                F.transform(kept, lambda i: F.get(lines, i - 1)), sep
            ).alias("clean_text"),
            F.size(lines).cast("long").alias("n_lines"),
            (F.size(lines) - F.size(kept)).cast("long").alias("n_dropped"),
        )

    out = let(F.split(F.col(text_col), sep), over_lines)
    return df.select(
        F.col(id_col),
        out["clean_text"].alias("clean_text"),
        out["n_lines"].alias("n_lines"),
        out["n_dropped"].alias("n_dropped"),
    )
