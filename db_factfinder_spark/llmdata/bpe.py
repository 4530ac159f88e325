"""Distributed BPE tokenizer training — the merge-table learner.

The standard cluster formulation (and the reason BPE training is
feasible at 100 TB at all): the corpus collapses ONCE into a word
frequency table (one corpus-sized shuffle — the only pass that touches
the data), and every merge round after that runs over the vocab-sized
word table: explode adjacent symbol pairs weighted by word frequency,
pick the argmax pair (ONE collected row — bounded, never data-sized),
and apply the merge to every word's symbol array with a per-row fold.
k rounds = k vocab-sized shuffles + k bounded collects.

Merge-application semantics match the reference BPE algorithm
(Sennrich et al. 2016; HuggingFace tokenizers): a left-to-right
non-overlapping scan — "aaaa" under merge (a,a) becomes [aa, aa], not
[aa, a, a].  The scan is expressed as ``F.aggregate`` over the symbol
array with a (done, pending) struct accumulator: the merged token
becomes the new pending symbol, which can never re-merge within the
same round (left||right == left is impossible), so the fold equals the
classic scan.

Tie-breaking is pinned: the best pair is max count, then lexicographic
(left, right) ascending — byte-order comparison agrees across engines
on the normalized (ASCII) symbol alphabet, so the whole merge table is
deterministic and DuckDB can replay it round for round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.checkpointing import materialize
from db_factfinder_spark.llmdata.textstats import normalize_text

__all__ = ["word_freq_table", "bpe_train", "bpe_encode"]


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus → (word, freq) — the one corpus-sized pass.  Words are
    whitespace tokens of the normalized text; symbols start as single
    characters."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    return (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent
    symbol pair (left, right) with their concatenation."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, x: Column) -> Column:
        take = (acc["pend"] == F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(take, acc["done"])
            .when(acc["pend"].isNull(), acc["done"])
            .otherwise(F.concat(acc["done"], F.array(acc["pend"])))
            .alias("done"),
            F.when(take, F.lit(merged)).otherwise(x).alias("pend"),
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pend"].isNull(), acc["done"]
        ).otherwise(F.concat(acc["done"], F.array(acc["pend"])))

    return F.aggregate(syms, init, step, finish)


def bpe_train(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    checkpoint_mode: str = "local",
) -> list[dict]:
    """Learn ``k`` BPE merges over the corpus; returns the merge table
    as a list of ``{step, left, right, merged, pair_count}`` dicts —
    the trained artifact a tokenizer ships (k rows, driver-sized by
    construction).

    Each round materializes the re-segmented word table (checkpoint
    policy — without truncation round r's plan embeds all r−1 folds
    and Catalyst analysis grows superlinearly, the measured let-chain
    failure mode).  Stops early when no adjacent pair remains."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    words = materialize(
        word_freq_table(df, text_col).select(
            chars.alias("syms"), "freq"
        ),
        checkpoint_mode,
    )
    merges: list[dict] = []
    for step_no in range(1, k + 1):
        best = (
            words.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        left, right, cnt = row["p"]["l"], row["p"]["r"], int(row["cnt"])
        merges.append(
            {
                "step": step_no,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": cnt,
            }
        )
        words = materialize(
            words.select(
                _apply_merge(F.col("syms"), left, right).alias("syms"),
                "freq",
            ),
            checkpoint_mode,
        )
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Tokenizer INFERENCE with a trained merge table: segment every
    document under the merges, applied in training order.

    The production shape: the merges apply to the DISTINCT-WORD
    vocabulary (vocab-sized, not corpus-sized — one fold pass per
    merge, materialized so k folds never stack in one Catalyst plan),
    then documents join the segmented vocab on the word and re-sum —
    so a 100 TB corpus pays one word explode + one keyed join, and the
    per-merge work is proportional to the vocabulary.

    Returns ``(id_col, n_words, n_tokens)`` — n_tokens under the
    trained tokenizer, the number every packing / budget stage
    downstream consumes.  Documents with no words are absent (no
    tokens — same floor as the dedup shinglers)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    doc_words = (
        df.select(F.col(id_col), F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    vocab = doc_words.select("word").distinct().select(
        "word", chars.alias("syms")
    )
    for m in merges:
        vocab = materialize(
            vocab.select(
                "word",
                _apply_merge(F.col("syms"), m["left"], m["right"]).alias(
                    "syms"
                ),
            ),
            checkpoint_mode,
        )
    seg = vocab.select("word", F.size("syms").alias("n_tok"))
    return (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_tok")).cast("long").alias(
                "n_tokens"
            ),
        )
    )
