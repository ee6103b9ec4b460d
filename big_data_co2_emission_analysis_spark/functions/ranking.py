"""BM25 relevance scoring over a document corpus -- the retrieval-side
text operator (quality-weighted corpus selection / dedup-cluster
ranking both want a lexical relevance score next to the embedding
path in operators/similarity.py).

Everything is native Catalyst expressions: tokenize = split+explode,
stats = two tiny aggregates, score = codegen'd arithmetic.  No Python
boundary.

Scale shape: doc length is a pure map (size(split(...))), the term
frequencies shuffle once on (doc, term) AFTER filtering to the query's
terms (so the shuffled volume scales with matches, not corpus), the
per-term document frequencies reduce to |query| rows and broadcast,
and the final per-doc sum shuffles only matched docs.  The full-corpus
N / avgdl statistics are one scalar row broadcast into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(text_col) -> "F.Column":
    """Lower + whitespace split + drop empties; the shared tokenizer
    for BM25 and the text-analysis token counts."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score, n_matched_terms) for every document matching at
    least one query term; score = sum over matched terms of

        ln(1 + (N - df + 0.5)/(df + 0.5))          -- BM25+ IDF
        * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))

    with N = corpus size, df = docs containing the term, len = doc
    token count, avgdl = mean token count (exact integer-sum / count).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    base = docs.select(
        F.col(id_col).alias("__id"), tokenize(F.col(text_col)).alias("__toks")
    )
    dl = base.select("__id", F.size("__toks").alias("__len"))

    # corpus scalars: exact integer sum / count division
    stats = dl.agg(
        F.count("*").alias("__n"),
        (F.sum("__len").cast("double") / F.count("*")).alias("__avgdl"),
    )

    toks = base.select("__id", F.explode("__toks").alias("__term")).filter(
        F.col("__term").isin(terms)
    )
    tf = toks.groupBy("__id", "__term").agg(F.count("*").alias("__tf"))
    dfreq = toks.groupBy("__term").agg(F.count_distinct("__id").alias("__df"))

    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .join(dl, "__id")
        .join(F.broadcast(stats))
        .select(
            "__id",
            "__term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__n") - F.col("__df") + F.lit(0.5))
                    / (F.col("__df") + F.lit(0.5))
                )
                * (F.col("__tf") * F.lit(k1 + 1.0))
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("__len") / F.col("__avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    return scored.groupBy("__id").agg(
        F.sum("__s").alias("score"), F.count("*").alias("n_matched_terms")
    ).select(F.col("__id").alias(id_col), "score", "n_matched_terms")
