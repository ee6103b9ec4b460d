"""Materialize expected outputs for the hash-based / heuristic text
queries (simhash_signatures, quality_scores, lang_id_heuristic) as
parquet keyed by md5(text), via an INDEPENDENT pure-Python replication
of each expression (including xxHash64 reimplemented from the public
spec -- tools/pyxxh64.py -- validated bit-for-bit against Spark's
xxhash64).

Unlike the multimodal expected tables (pure functions of doc_id),
these are functions of the TEXT, so rows are keyed by md5(text) and
the oracle joins ``md5(d.text) = e.text_md5`` -- sf-agnostic across
any fixture whose documents are covered here (sf0.001/0.01/0.1 texts
are all included, deduped).

Replication notes (each mirrors the exact Spark expression):
- regexes run with re.ASCII so \\w and \\s match Java's ASCII classes;
- rounding uses Decimal(repr(x)) + ROUND_HALF_UP, the BigDecimal
  half-up semantics of Spark's ``round`` (Python's round() is
  half-even and would diverge);
- simhash: normalize -> 2-shingles -> distinct -> xxh64 votes -> sign
  bits (operators/dedup.py simhash64);
- rolling fingerprint: 8-token shingles -> xxh64 -> XOR fold
  (functions/text.py rolling_fingerprint);
- bpe-ish token count: the same lookaround split regex (functions/
  text.py bpe_ish_token_count; Python re supports these lookarounds
  and splits on zero-width matches like Java Pattern.split).

Usage: python tools/gen_text_expected.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyxxh64 import xxh64_signed  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "expected_text",
)
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

_WS = re.compile(r"\s+", re.ASCII)
_BPE_SPLIT = re.compile(
    r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])|(?<=[^\w\s])",
    re.ASCII,
)
_NON_WORD = re.compile(r"[^\w\s]", re.ASCII)
_DIGIT = re.compile(r"[0-9]")


def tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text.strip()) if t != ""]


def round_half_up6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def simhash64(text: str) -> int:
    norm = _WS.sub(" ", text.strip().lower())
    toks = [t for t in norm.split(" ") if t != ""]
    shingles = list(dict.fromkeys(
        " ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 0))
    ))
    votes = [0] * 64
    for s in shingles:
        h = xxh64_signed(s.encode("utf-8")) & ((1 << 64) - 1)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    u = 0
    for b in range(64):
        if votes[b] > 0:
            u |= 1 << b
    return u - (1 << 64) if u >= 1 << 63 else u


def rolling_fingerprint(text: str, window: int = 8) -> int:
    toks = tokens(text)
    k = max(len(toks) - (window - 1), 1)
    acc = 0
    for i in range(k):
        s = " ".join(toks[i : i + window])
        acc ^= xxh64_signed(s.encode("utf-8")) & ((1 << 64) - 1)
    return acc - (1 << 64) if acc >= 1 << 63 else acc


def bpe_ish_token_count(text: str) -> int:
    return sum(1 for p in _BPE_SPLIT.split(text.strip()) if p != "")


def quality_score(text: str) -> float:
    n_chars = len(text)
    n_toks = len(tokens(text))
    punct_ratio = (n_chars - len(_NON_WORD.sub("", text))) / max(n_chars, 1)
    digit_ratio = (n_chars - len(_DIGIT.sub("", text))) / max(n_chars, 1)
    length_ok = 1.0 if 20 <= n_chars <= 100000 else 0.3
    multi_token = 1.0 if n_toks >= 3 else 0.5
    score = (
        length_ok
        * multi_token
        * (1 - min(punct_ratio * 2, 1.0))
        * (1 - min(digit_ratio * 2, 1.0))
    )
    return round_half_up6(score)


def lang_id(text: str) -> str:
    toks = tokens(text)
    lowered = [t.lower() for t in toks]
    best = None  # (score, lang) -- max by score then lang string
    for code, markers in LANG_MARKERS.items():
        hits = sum(1 for t in lowered if t in markers)
        score = hits / max(len(toks), 1)
        cand = (score, code)
        if best is None or cand > best:
            best = cand
    return best[1] if best and best[0] > 0 else "und"


def main() -> None:
    import duckdb

    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    os.makedirs(OUT_DIR, exist_ok=True)
    texts: dict[str, str] = {}
    con = duckdb.connect()
    for d in sf_dirs:
        for (t,) in con.sql(
            f"SELECT text FROM read_parquet('{d}/documents.parquet')"
        ).fetchall():
            texts[hashlib.md5(t.encode("utf-8")).hexdigest()] = t
    print(f"{len(texts)} distinct texts from {len(sf_dirs)} fixture dirs")

    sim_rows, qual_rows, lang_rows = [], [], []
    for md5, t in texts.items():
        sim_rows.append((md5, simhash64(t)))
        qual_rows.append((md5, quality_score(t), bpe_ish_token_count(t), rolling_fingerprint(t)))
        lang_rows.append((md5, lang_id(t)))

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(sim_rows, columns=["text_md5", "simhash"]),
            schema=pa.schema([("text_md5", pa.string()), ("simhash", pa.int64())]),
            preserve_index=False,
        ),
        os.path.join(OUT_DIR, "simhash.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(qual_rows, columns=["text_md5", "quality", "n_bpe_tokens", "fingerprint64"]),
            schema=pa.schema([
                ("text_md5", pa.string()), ("quality", pa.float64()),
                ("n_bpe_tokens", pa.int64()), ("fingerprint64", pa.int64()),
            ]),
            preserve_index=False,
        ),
        os.path.join(OUT_DIR, "quality.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(lang_rows, columns=["text_md5", "predicted_lang"]),
            schema=pa.schema([("text_md5", pa.string()), ("predicted_lang", pa.string())]),
            preserve_index=False,
        ),
        os.path.join(OUT_DIR, "lang_id.parquet"),
    )

    # synthetic_corpus source (sources/pydatasource.py): per-doc rows
    # from the SAME pure row function the source declares, so the
    # oracle verifies the partition-planning/read plumbing delivers
    # exactly synth_doc(i) for every id at any partitioning
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from big_data_co2_emission_analysis_spark.sources.pydatasource import synth_doc

    synth_rows = []
    for i in range(2000):
        doc_id, text, n_tokens = synth_doc(i)
        synth_rows.append((doc_id, hashlib.md5(text.encode("utf-8")).hexdigest(), n_tokens))
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(synth_rows, columns=["doc_id", "text_md5", "n_tokens"]),
            schema=pa.schema([("doc_id", pa.int64()), ("text_md5", pa.string()), ("n_tokens", pa.int64())]),
            preserve_index=False,
        ),
        os.path.join(OUT_DIR, "synth_corpus.parquet"),
    )
    print("done:", OUT_DIR)


if __name__ == "__main__":
    main()
