"""Blocked fuzzy matching (entity resolution) on string columns.

A training-data pipeline constantly reconciles near-identical entity
strings -- author names, product titles, source URLs -- where exact and
fingerprint dedup (``operators/dedup.py``) miss single-character typos.
Edit distance catches those, but an all-pairs ``levenshtein`` over n
rows is O(n^2) comparisons: a cartesian non-starter at 100 TB.

The classic fix is BLOCKING: derive a cheap deterministic key (first
token, prefix, phonetic code), shuffle once on that key so candidate
rows are co-located, and compare only within blocks.  Recall is bounded
by the blocking key (two strings differing in their first token never
meet) -- that is the documented, standard trade-off; add a second
blocking pass with a different key to raise recall.

Everything stays JVM-side: ``F.levenshtein`` is a codegen'd Catalyst
expression, the block join is a plain shuffle join on the key, and the
``a.id < b.id`` predicate halves the within-block comparisons.  A
``max_block_size`` guard (same posture as the ``max_df`` cap in
``ngram_jaccard_pairs`` and ``max_bucket_size`` in the banded LSH)
drops degenerate blocks -- one boilerplate token shared by millions of
rows would otherwise expand quadratically inside a single task.

The reference has no fuzzy matching (its only string ops are equality
filters, ``/root/reference/project-co2.py:190-226``); this is part of
the engine's 100 TB data-cleaning extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(col: Column | str) -> Column:
    """Default blocking key: the first whitespace-delimited token,
    lowercased.  Cheap, deterministic, and language-agnostic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.split_part(c, F.lit(" "), F.lit(1)))


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    block: Column | None = None,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """All within-block pairs with ``levenshtein <= max_distance``.

    Returns ``(<id>_a, <id>_b, <text>_a, <text>_b, distance)`` with
    ``id_a < id_b``.  One shuffle (on the block key); comparisons are
    confined to blocks, so cost is sum-of-squares of block sizes, not
    n^2.  Blocks larger than ``max_block_size`` are dropped entirely
    (deterministic; count them via :func:`fuzzy_block_stats` before
    raising the cap) -- at 100 TB a single degenerate block is an
    executor-killing hot key, and silently comparing a sampled subset
    would be worse than an explicit, observable drop.
    """
    key = block if block is not None else first_token_block(text_col)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text"), key.alias("_block")
    ).filter(F.col("_block") != "")
    if max_block_size is not None:
        sizes = base.groupBy("_block").agg(F.count(F.lit(1)).alias("_bn"))
        base = base.join(
            sizes.filter(F.col("_bn") <= max_block_size).select("_block"), "_block"
        )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a._block") == F.col("b._block")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            F.col("a._text").alias(f"{text_col}_a"),
            F.col("b._text").alias(f"{text_col}_b"),
            F.levenshtein(F.col("a._text"), F.col("b._text")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def fuzzy_block_stats(
    df: DataFrame, text_col: str, block: Column | None = None
) -> DataFrame:
    """Block-size distribution -- the observability companion to
    ``max_block_size`` (mirrors ``minhash_banded_bucket_stats``): run it
    to see what a given cap would drop before committing to one."""
    key = block if block is not None else first_token_block(text_col)
    return (
        df.select(key.alias("block"))
        .filter(F.col("block") != "")
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), "block")
    )
