"""Substring-level duplication analysis: find repeated token windows
ACROSS the corpus and measure how much of each document they cover --
the distributed approximation of suffix-array substring dedup (Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better":
remove substrings repeated verbatim elsewhere; a suffix array is
single-machine, a fixed-length window hash join is the scalable
stand-in).

Shape:

1. token windows are a PURE MAP -- the k-gram array is built with the
   zip_with chain (operators/dedup.word_shingles' trick, positions
   kept, duplicates kept), then posexplode'd to (doc, pos, window).
2. duplicated windows = groupBy(window md5) HAVING count >= 2 -- one
   map-side-combined shuffle, output bounded by distinct-window count.
3. marking = the posting stream joins the duplicate set on the hash --
   one shuffle join, each posting matches at most once (NO pair
   expansion anywhere, so no hot-key cap is needed: a million-way
   repeated boilerplate window costs a million 1:1 join hits, linear).
4. coverage = per-doc interval union of the hit windows [pos, pos+k-1]
   via a lead() sweep (sorted fixed-length intervals: each window
   covers min(k, next_pos - pos) new tokens) -- a per-doc window
   function, one more shuffle on doc id.

Everything is native expressions; md5 keeps the window hash
cross-engine (xxhash64 exists only Spark-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def token_windows(text_col: Column | str, k: int) -> Column:
    """Array of ALL k-token windows (order kept, duplicates kept) of
    the normalized token stream; empty array when the document has
    fewer than k tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tokens = F.filter(F.split(normalize_text(c), " "), lambda x: x != "")
    n_win = F.greatest(F.size(tokens) - (k - 1), F.lit(0))
    acc = tokens
    for j in range(1, k):
        shifted = F.slice(tokens, j + 1, F.greatest(F.size(tokens) - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(acc, 1, n_win)


def window_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, pos, wh): 1-based window start position + md5 window hash
    for every k-token window of every document."""
    return docs.select(
        F.col(id_col),
        F.posexplode(token_windows(text_col, k)).alias("__p", "__w"),
    ).select(
        id_col,
        (F.col("__p") + 1).alias("pos"),
        F.md5(F.col("__w")).alias("wh"),
    )


def duplicated_windows(postings: DataFrame) -> DataFrame:
    """(wh, n_occurrences) for window hashes seen >= 2 times corpus-wide
    (same-document repetition counts, per the substring-dedup paper)."""
    return (
        postings.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document substring-duplication report:

    (id, n_tokens, n_windows, n_dup_windows, covered_tokens,
    dup_token_frac) where ``covered_tokens`` is the exact size of the
    union of all duplicated windows' [pos, pos+k-1] intervals and
    ``dup_token_frac`` = covered / n_tokens (the fraction a
    substring-dedup pass would cut).  Documents with fewer than k
    tokens report zero windows.  ``dup_token_frac`` is a ratio of two
    integers -- one IEEE division, exactly reproducible.
    """
    from pyspark.sql import Window as W

    post = window_postings(docs, id_col, text_col, k)
    dup = duplicated_windows(post)
    hits = post.join(dup, "wh").select(id_col, "pos")

    # interval-union sweep: windows sorted by pos; each contributes
    # min(k, next_pos - pos) tokens (the last contributes k)
    w = W.partitionBy(id_col).orderBy("pos")
    covered = (
        hits.withColumn("__next", F.lead("pos").over(w))
        .select(
            F.col(id_col),
            F.when(
                F.col("__next").isNull(), F.lit(k)
            ).otherwise(F.least(F.lit(k), F.col("__next") - F.col("pos"))).alias("__c"),
        )
        .groupBy(id_col)
        .agg(F.sum("__c").alias("covered_tokens"), F.count(F.lit(1)).alias("n_dup_windows"))
    )

    tokens = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
    base = docs.select(
        F.col(id_col),
        F.size(tokens).cast("long").alias("n_tokens"),
        F.greatest(F.size(tokens) - (k - 1), F.lit(0)).cast("long").alias("n_windows"),
    )
    return base.join(covered, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("double")
               / F.col("n_tokens").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )
