"""Deterministic embedding stage: the "embed" step of a RAG /
similarity pipeline (chunk -> embed -> index -> retrieve).

A real deployment calls a model here; this container has no model, so
per the stub policy (operators/multimodal.py precedent) the EMBEDDING
FUNCTION is a deterministic fake -- an md5-derived pseudo-random
projection -- while all the Spark-side plumbing is real and tested in
both of its production shapes:

- :func:`hash_embedding` -- the embedding as a NATIVE codegen'd
  expression (dim md5 calls + arithmetic per row).  Cross-engine
  reproducible, so retrieval built on it is fully oracle-checkable.
- :func:`embed_map_in_pandas` -- the SAME embedding computed through
  ``mapInPandas`` with the exact schema/batching shape a model
  embedder uses (Arrow batches in, appended vector column out).
  Parity with the native expression is asserted in tests, so swapping
  the fake for a model call changes one function body, not the plan.

Component j of the embedding of text t:

    v_j = int(md5(t + ':' + j)[:12 hex], 16)   in [0, 2^48)
    e_j = v_j / 2^47 - 1.0                     in [-1, 1)

Integer-to-double then one divide and one subtract -- every engine
computes the identical IEEE doubles.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = float(2**47)


def hash_embedding(text_col: Column | str, dim: int = 8) -> Column:
    """array<double> deterministic embedding (see module docstring)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    comps = []
    for j in range(dim):
        h12 = F.substring(F.md5(F.concat(c, F.lit(f":{j}"))), 1, 12)
        v = F.conv(h12, 16, 10).cast("long").cast("double")
        comps.append(v / F.lit(_SCALE) - F.lit(1.0))
    return F.array(*comps)


def hash_embedding_py(text: str, dim: int = 8) -> list[float]:
    """Pure-Python twin of :func:`hash_embedding` (used by the
    mapInPandas path and by tests/oracles)."""
    return [
        int(hashlib.md5(f"{text}:{j}".encode()).hexdigest()[:12], 16) / _SCALE - 1.0
        for j in range(dim)
    ]


def embed_map_in_pandas(
    df: DataFrame, text_col: str, out_col: str = "embedding", dim: int = 8
) -> DataFrame:
    """Append an embedding column via ``mapInPandas`` -- the
    model-embedder plumbing shape: Arrow batches stream through a
    Python worker that would hold the model; here it applies the
    deterministic fake so the pipeline is testable end-to-end.

    ``text_col`` must be non-null (filter first): the native path
    yields NULL components for NULL text while pandas stringifies it,
    so parity is only defined over non-null rows."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # StructType.add mutates the receiver -- never call it on df.schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def embed(batches):
        for pdf in batches:
            pdf[out_col] = [
                hash_embedding_py(t, dim) for t in pdf[text_col].astype(str)
            ]
            yield pdf

    return df.mapInPandas(embed, out_schema)
