"""Byte-pair-encoding tokenizer: train on a bounded driver-side sample,
encode distributed -- the same division of labor as the PQ codebooks
(operators/similarity.py): the merge table is O(vocab) and learns from
a bounded sample exactly like sentencepiece/GPT-2 training pipelines
bound their corpus; the ENCODE pass is the 100 TB side and runs as an
Arrow-batched pandas_udf with per-batch word memoization (natural text
repeats words, so each distinct word BPE-encodes once per batch).

This replaces the regex "BPE-ish" token ESTIMATE in functions/text.py
with real merge semantics: deterministic merge order (frequency desc,
pair lexicographic asc on ties), classic end-of-word marker, encode by
merge rank -- hand-checkable against the textbook algorithm.
"""

from __future__ import annotations

# module-level: @pandas_udf resolves its postponed string hints against
# MODULE globals (verify-notes gotcha) -- a function-local import would
# raise UNSUPPORTED_SIGNATURE at query build
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_docs: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from (at most) ``sample_docs``
    documents collected to the driver.  Deterministic: the most
    frequent adjacent symbol pair wins each round, ties break on the
    lexicographically smallest pair.  Returns the ordered merge list
    (the entire model -- O(num_merges) strings)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if sample_docs > 1_000_000:
        raise ValueError("sample_docs must stay driver-bounded (<=1e6)")
    rows = docs.select(F.col(text_col).alias("t")).limit(sample_docs).collect()

    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in (r["t"] or "").lower().split():
            sym = tuple(w) + (EOW,)
            word_freq[sym] = word_freq.get(sym, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for sym, n in word_freq.items():
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + n
        if not pair_freq:
            break
        best = min(pair_freq, key=lambda p: (-pair_freq[p], p))
        if pair_freq[best] < 2:
            break  # nothing left that actually repeats
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: dict[tuple[str, ...], int] = {}
        for sym, n in word_freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_freq[t] = new_freq.get(t, 0) + n
        word_freq = new_freq
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        cands = [(r, i) for r, i in pairs if r is not None]
        if not cands:
            break
        _, i = min(cands)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) for every document --
    distributed encode, merge table broadcast, per-batch word
    memoization."""
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    branks = spark.sparkContext.broadcast({tuple(m): i for i, m in enumerate(merges)})

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks = branks.value
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col), encode(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))
