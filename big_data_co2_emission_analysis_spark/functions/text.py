"""Text-analysis scalar functions for training-data pipelines:
language ID, quality scoring, token counting, document fingerprints.

Everything is built from native pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) -- no Python UDFs in any hot path.  The one
Pandas UDF here (`bpe_ish_token_count_udf`) exists to demonstrate the
sanctioned Arrow-batched extension point (SURVEY.md section 2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID.  Deliberately small: at 100 TB the score is a
# fixed-size expression per language, evaluated in one codegen stage.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty input -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate with a BPE-flavored regex: splits on
    whitespace AND at letter/digit/punctuation boundaries, so
    "don't-stop2023" counts 6 pieces like a byte-pair tokenizer's
    pre-tokenizer would.  Native regexp path."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.trim(c), r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])")
    return F.size(F.filter(pieces, lambda t: t != ""))


def stopword_score(col: Column | str, markers: list[str]) -> Column:
    """Fraction of tokens that appear in the marker set."""
    toks = tokens(col)
    lowered = F.transform(toks, lambda t: F.lower(t))
    hits = F.size(F.filter(lowered, lambda t: t.isin(markers)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(col: Column | str, langs: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword scores,
    'und' (undetermined) when nothing scores > 0.

    Implemented as a fold over a literal score array -- a single
    codegen'd expression, no shuffle, no UDF.
    """
    langs = langs or LANG_MARKERS
    scored = F.array(
        *[
            F.struct(stopword_score(col, m).alias("score"), F.lit(code).alias("lang"))
            for code, m in langs.items()
        ]
    )
    best = F.array_max(scored)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: penalizes extreme length,
    high punctuation/digit density, and single-token texts -- the
    standard cheap pre-filter in front of expensive pipeline stages."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_toks = token_count(c)
    punct_ratio = (n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / F.greatest(n_chars, F.lit(1))
    digit_ratio = (n_chars - F.length(F.regexp_replace(c, "[0-9]", ""))) / F.greatest(n_chars, F.lit(1))
    length_ok = F.when((n_chars >= 20) & (n_chars <= 100000), F.lit(1.0)).otherwise(F.lit(0.3))
    multi_token = F.when(n_toks >= 3, F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round(
        length_ok * multi_token * (1 - F.least(punct_ratio * 2, F.lit(1.0))) * (1 - F.least(digit_ratio * 2, F.lit(1.0))),
        6,
    )
    # when/otherwise would route null text through the otherwise arms;
    # keep null in -> null out
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(score)


def rolling_fingerprint(col: Column | str, window: int = 8) -> Column:
    """Deterministic document fingerprint: xxhash64 of each
    ``window``-token rolling shingle, folded with XOR.  Equal texts get
    equal fingerprints; a single changed token flips ~``window``
    shingle hashes, so it doubles as a cheap content-drift signal."""
    toks = tokens(col)
    n = F.size(toks)
    k = F.greatest(n - (window - 1), F.lit(1))
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return F.aggregate(shingle_hashes, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h))


def ngram_list(col: Column | str, n: int = 3) -> Column:
    """NON-distinct word n-gram list (vs operators.dedup.word_shingles'
    set): position i -> tokens[i..i+n-1] joined by spaces.  Keeping
    duplicates is the point -- the repeated-n-gram ratio needs them."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    # guard: sequence(1, 0) would count DOWN; CaseWhen evaluates the
    # sequence only on rows where k > 0
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repeated_ngram_ratio(col: Column | str, n: int = 3) -> Column:
    """Fraction of duplicated n-grams: 1 - distinct/total.  The
    standard repetition-loop quality signal for LLM training corpora
    (degenerate generations and boilerplate score high).  Null for
    texts shorter than n tokens."""
    grams = ngram_list(col, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(1 - F.size(F.array_distinct(grams)) / total, 6),
    )


def token_chunks(col: Column | str, chunk_size: int, stride: int) -> Column:
    """Token-window chunking: array of (chunk_start, chunk_text,
    n_tokens) structs covering the doc with windows of ``chunk_size``
    tokens every ``stride`` tokens (stride < chunk_size = overlap).
    The context-window segmentation step of an LLM data pipeline,
    as a single codegen'd expression -- explode the result to get one
    row per chunk."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)),
        lambda p: F.struct(
            p.cast("long").alias("chunk_start"),
            F.concat_ws(" ", F.slice(toks, p, chunk_size)).alias("chunk_text"),
            F.size(F.slice(toks, p, chunk_size)).cast("long").alias("n_tokens"),
        ),
    )


def bpe_ish_token_count_udf():
    """Arrow-batched Pandas UDF variant of :func:`bpe_ish_token_count`
    -- the demo of the sanctioned Python extension point (SURVEY.md
    section 2.10).  Prefer the native version in production."""
    import re

    import pandas as pd
    from pyspark.sql.types import IntegerType

    pattern = re.compile(r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])")

    def _count(texts):
        return texts.fillna("").map(lambda t: sum(1 for p in pattern.split(t.strip()) if p))

    # set real annotations: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf can't resolve here
    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_count, IntegerType())
