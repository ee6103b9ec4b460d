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
cross-engine (xxhash64 exists only Spark-side).  The posting key is
the 16-byte ``unhex(md5(...))`` BINARY, not the 32-char hex string --
the posting stream is the engine's single largest shuffle (~25M rows
at sf10) and the key is most of each row's width, so halving it cuts
shuffle bytes on the two heaviest suite queries; DuckDB's
``unhex(md5(...))`` replays the exact same bytes, and lowercase-hex
lexicographic order equals unsigned byte order, so sort semantics are
unchanged wherever the hex form is re-derived for output.
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
    """(id, pos, wh): 1-based window start position + 16-byte binary
    md5 window hash for every k-token window of every document.

    The trailing not-null filters are semantic no-ops on real corpora
    (md5 of a posexploded window is never null; a null document id is
    meaningless to dedup and excluded by contract) with a real plan
    effect: the downstream consumers infer isnotnull constraints into
    THEIR branches of the posting stream (the mark-join pushes
    isnotnull(wh); the keep-first chain pushes isnotnull(id)), and
    without identical filters on every branch the subtrees canonicalize
    differently -- ReuseExchange misses, and the corpus-sized posting
    shuffle (the engine's largest) is paid TWICE.  With them, all
    consumers share one exchange (asserted in tests/test_plans.py)."""
    return docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(token_windows(text_col, k)).alias("__p", "__w"),
    ).select(
        id_col,
        (F.col("__p") + 1).alias("pos"),
        F.unhex(F.md5(F.col("__w"))).alias("wh"),
    ).filter(F.col("wh").isNotNull())


def duplicated_windows(postings: DataFrame) -> DataFrame:
    """(wh, n_occurrences) for window hashes seen >= 2 times corpus-wide
    (same-document repetition counts, per the substring-dedup paper).

    The count is ``plans.pinning.pinned_count`` over every non-key
    posting column -- exactly ``count(*)``, but the columns stay
    REFERENCED so column pruning cannot narrow this branch's scan and
    exchange to just ``wh``: that would make the posting-exchange
    subtree canonically different from the mark-join's sibling subtree,
    AQE stage reuse would miss, and the corpus-sized posting shuffle
    (the engine's largest) plus the window-extraction scan would be
    paid twice (measured at sf10: the reuse is worth ~25% of
    substring_dedup_rewrite's wall-clock)."""
    from ..plans.pinning import pinned_count

    others = [c for c in postings.columns if c != "wh"]
    cnt = pinned_count(others) if others else F.count(F.lit(1))
    return (
        postings.groupBy("wh")
        .agg(cnt.alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    agg_partitions: int | None = None,
) -> DataFrame:
    """Per-document substring-duplication report:

    (id, n_tokens, n_windows, n_dup_windows, covered_tokens,
    dup_token_frac) where ``covered_tokens`` is the exact size of the
    union of all duplicated windows' [pos, pos+k-1] intervals and
    ``dup_token_frac`` = covered / n_tokens (the fraction a
    substring-dedup pass would cut).  Documents with fewer than k
    tokens report zero windows.  ``dup_token_frac`` is a ratio of two
    integers -- one IEEE division, exactly reproducible.

    ``agg_partitions`` sizes the posting-keyed exchanges (the window
    groupBy and the mark-join) exactly as in :func:`removal_intervals`
    -- at the 32-partition session default the posting sort state
    spills at sf10 (measured 2.7 GB pre-sizing, 0 after); None keeps
    the stock plan (spill-free through sf1).
    """
    from pyspark.sql import Window as W

    post = window_postings(docs, id_col, text_col, k)
    if agg_partitions is not None:
        post = post.repartition(agg_partitions, "wh")
    dup = duplicated_windows(post)
    # shuffle_hash: both sides already sit on the shared wh exchange, so
    # a sort-merge join would SORT the corpus-sized posting stream for a
    # 1:1 probe -- pure waste.  The hash build side is the per-partition
    # slice of the duplicate set, bounded by the same agg_partitions
    # sizing that keeps the posting sort state in memory (measured at
    # sf10: ~1 s off the removed-count chain, value-identical).
    hits = post.join(dup.hint("shuffle_hash"), "wh").select(id_col, "pos")

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


def removal_intervals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    agg_partitions: int | None = None,
) -> DataFrame:
    """Merged token-position intervals [start, end] (1-based, inclusive)
    that a keep-first substring-dedup pass removes from each document.

    Keep-first is the paper's policy (Lee et al. 2022 keep one copy of
    each repeated substring): for every corpus-wide duplicated window
    hash, the lexicographically first occurrence (min (doc, pos)) is
    RETAINED; every other occurrence becomes a removal hit, and a
    document's removal set is the interval union of its hits'
    [pos, pos+k-1] spans.

    Scale shape: the first occurrence rides the SAME map-side-combined
    groupBy that finds duplicated windows (``min(struct(doc, pos))`` is
    an agg, NOT a per-hash window sort -- a million-way boilerplate
    window costs one combiner cell, no single-partition key sort); the
    mark-join is 1:1 per posting (no pair expansion); interval merging
    is the classic running-max sweep, two window passes keyed by doc.

    ``agg_partitions`` sizes the posting-keyed exchanges (the window
    groupBy and the mark-join) for the corpus instead of inheriting
    ``spark.sql.shuffle.partitions`` -- the posting stream is
    ~n_tokens rows of ~64 B (25M rows / 1.6 GB at sf10), and at the
    32-partition session default the sort-merge join's per-task sort
    state thrashes into spill (measured 3.2 GiB at sf10; 0 after
    sizing).  Same knob and sizing rule as
    ``dedup.ngram_jaccard_pairs``; None keeps the stock plan (correct
    and spill-free through sf1).
    """
    post = window_postings(docs, id_col, text_col, k)
    if agg_partitions is not None:
        post = post.repartition(agg_partitions, "wh")
    dup_first = (
        post.groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"),
        )
        .filter(F.col("__n") >= 2)
        .select("wh", "__first")
    )
    # shuffle_hash: see duplicated_span_stats -- skip the probe-side
    # sort of the corpus-sized posting stream; build side is the
    # per-partition duplicate slice
    removals = post.join(dup_first.hint("shuffle_hash"), "wh").filter(
        ~(
            (F.col(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("pos") == F.col("__first.pos"))
        )
    ).select(id_col, "pos")

    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    swept = (
        removals.withColumn("__end", F.col("pos") + (k - 1))
        .withColumn("__cummax", F.max("__end").over(wrun))
        .withColumn("__prev_max", F.lag("__cummax").over(w))
        .withColumn(
            "__new_grp",
            F.when(
                F.col("__prev_max").isNull() | (F.col("pos") > F.col("__prev_max") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__grp", F.sum("__new_grp").over(wrun))
    )
    return swept.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("start"), F.max("__end").alias("end")
    ).select(id_col, "start", "end")


def removed_token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    agg_partitions: int | None = None,
) -> DataFrame:
    """(id, removed): the TOTAL token count a keep-first substring-dedup
    pass removes from each document -- exactly
    ``removal_intervals(...).groupBy(id).agg(sum(end - start + 1))``,
    but computed with ONE window pass instead of three.

    The merged-interval total is the union size of the removal hits'
    fixed-length [pos, pos+k-1] spans, and for same-length intervals
    sorted by start the union size is a single ``lead()`` sweep: each
    hit contributes ``min(k, next_pos - pos)`` tokens (the last
    contributes ``k``) -- the ``duplicated_span_stats`` coverage trick
    applied to the removal stream.  Callers that need the intervals
    themselves (the rewrite) still use :func:`removal_intervals`;
    callers that only price the cut (curated_corpus_v4's manifest)
    skip the cummax/lag/group-sum merge entirely.  Value-identical by
    construction (overlap -> ``next - pos``; adjacency or gap -> ``k``
    either way), so oracles replaying the interval formulation match
    bit-for-bit.  Documents with no removals are absent (join left and
    coalesce at the call site, as with removal_intervals)."""
    from pyspark.sql import Window as W

    post = window_postings(docs, id_col, text_col, k)
    if agg_partitions is not None:
        post = post.repartition(agg_partitions, "wh")
    dup_first = (
        post.groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"),
        )
        .filter(F.col("__n") >= 2)
        .select("wh", "__first")
    )
    # shuffle_hash: see duplicated_span_stats -- skip the probe-side
    # sort of the corpus-sized posting stream; build side is the
    # per-partition duplicate slice
    removals = post.join(dup_first.hint("shuffle_hash"), "wh").filter(
        ~(
            (F.col(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("pos") == F.col("__first.pos"))
        )
    ).select(id_col, "pos")

    w = W.partitionBy(id_col).orderBy("pos")
    return (
        removals.withColumn("__next", F.lead("pos").over(w))
        .select(
            F.col(id_col),
            F.when(F.col("__next").isNull(), F.lit(k))
            .otherwise(F.least(F.lit(k), F.col("__next") - F.col("pos")))
            .alias("__c"),
        )
        .groupBy(id_col)
        .agg(F.sum("__c").cast("long").alias("removed"))
    )


def substring_dedup_rewrite(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    agg_partitions: int | None = None,
) -> DataFrame:
    """The REWRITE step of exact substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    remove every token covered by a non-first occurrence of a
    corpus-wide duplicated k-token window and emit the cleaned text.

    Returns (id, n_tokens, n_removed, clean_text), one row per input
    document (documents with nothing removed pass through verbatim,
    normalized).  ``duplicated_span_stats`` is the report; this is the
    pass that actually cuts the corpus.

    The rebuild is native expressions end-to-end: merged removal
    intervals are collected per document (bounded by n_tokens/2 after
    merging, in practice a handful) and tokens are dropped with an
    indexed ``F.filter`` + ``F.exists`` membership test --
    O(n_tokens x n_intervals) per document, fine for document-sized
    texts; no Python UDF, no token-level join, no pair expansion.
    ``agg_partitions`` passes through to :func:`removal_intervals`.
    """
    iv = removal_intervals(docs, id_col, text_col, k, agg_partitions)
    per_doc = iv.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("__ivs")
    )
    tokens = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
    joined = docs.select(F.col(id_col), tokens.alias("__toks")).join(
        per_doc, id_col, "left"
    )
    ivs = F.coalesce(F.col("__ivs"), F.array())
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.exists(
            ivs, lambda v: (i + 1 >= v["start"]) & (i + 1 <= v["end"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
