"""Python UDTFs (user-defined TABLE functions, Spark 4): the sanctioned
row-to-many-rows Python extension point, complementing the scalar
pandas_udf (functions/text.py) and the iterator mapInPandas
(operators/multimodal.py) surfaces.

A UDTF is the SLOW path -- a Python process call per partition with
row-at-a-time eval -- so production chunking uses the native
codegen'd ``functions.text.token_chunks``.  This module exists to
cover the API surface; the registry query ``udtf_chunks`` checks it
against the SAME DuckDB oracle as the native path, proving the two
implementations agree.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_start: bigint, chunk_text: string, n_tokens: bigint")
class ChunkTokensUDTF:
    """Token-window chunking as a table function: one output row per
    (chunk_size, stride) window over the whitespace tokens; mirrors
    ``functions.text.token_chunks`` exactly."""

    def eval(self, text: str, chunk_size: int, stride: int):
        toks = [t for t in (text or "").split() if t]
        n = max(len(toks), 1)
        for start in range(1, n + 1, stride):
            window = toks[start - 1 : start - 1 + chunk_size]
            yield start, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register the module's UDTFs for SQL (LATERAL) use."""
    spark.udtf.register("chunk_tokens", ChunkTokensUDTF)
