"""Vector / similarity-search queries over the `embeddings` fixture
(array<float> column).  Dot products and norms are computed JVM-side
with higher-order array functions (F.aggregate / F.transform) -- no
Python boundary -- folding left-to-right in array order so the float
accumulation order matches DuckDB's list functions element-for-element.

The LSH / IVF approximate variants live in mlops.py (rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._exact import sql_davg
from .registry import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _sq_norm(col: Column) -> Column:
    """Sum of squares in double, sequential array-order fold."""
    return F.aggregate(
        F.transform(col, lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )


def _dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + ordered fold (JVM-side, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --------------------------------------------------------------------------
# Norms: per-vector dimensionality + L2 norm.
# --------------------------------------------------------------------------
@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("vector",),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.round(F.sqrt(_sq_norm(F.col("embedding"))), 6).alias("l2_norm"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k against one query vector: the exactness
# baseline every ANN index is judged against.  The single query row is
# broadcast, so the "cross join" is a map-side operation over the corpus
# -- this is the shape that scales to 100 TB (corpus partitioned, query
# set broadcast).  Cosines are rounded to 6 dp so last-ULP float noise
# cannot reorder the oracle comparison.
# --------------------------------------------------------------------------
@register(
    "knn_cosine_top10",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(LIST_SUM(LIST_TRANSFORM(
                    LIST_ZIP(CAST(e.embedding AS DOUBLE[]), q.qv),
                    p -> p[1] * p[2]))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> x * x)))), 6) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
    tags=("vector", "similarity"),
)
def knn_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0)
    cosine = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_sq_norm(F.col("embedding"))) * F.sqrt(_sq_norm(F.col("qv")))
    )
    return (
        corpus.crossJoin(F.broadcast(query))
        .select("vec_id", F.round(cosine, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Per-label rollup of vector norms (group-wise vector stats).
# --------------------------------------------------------------------------
@register(
    "label_norm_stats",
    oracle=f"""
    WITH norms AS (
      SELECT label,
             ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n, {sql_davg('l2', scale=6)} AS avg_norm
    FROM norms
    GROUP BY label
    ORDER BY label
    """,
    tags=("vector", "agg"),
)
def label_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._exact import davg

    norms = _emb(spark, sf_dir).select(
        "label", F.round(F.sqrt(_sq_norm(F.col("embedding"))), 6).alias("l2")
    )
    return (
        norms.groupBy("label")
        .agg(F.count("*").alias("n"), davg("l2", scale=6).alias("avg_norm"))
        .orderBy("label")
    )
