"""Materialize expected per-document BPE token stats for
bpe_token_stats via an INDEPENDENT reimplementation of the textbook
byte-pair-encoding algorithm (Sennrich et al. 2016, as published).

Determinism contract being checked (operators/bpe.py):
- training corpus = the ENTIRE fixture document table (the query's
  sample_docs bound exceeds every fixture corpus), so word frequencies
  are scan-order-insensitive;
- merge selection = highest pair frequency, ties broken on the
  lexicographically smallest pair; stop when the best pair repeats < 2;
- encode = repeatedly apply the LOWEST-RANK applicable merge, leftmost
  occurrence first, classic ``</w>`` end-of-word marker;
- n_words = size(split(trim(lower(text)), '\\s+')) with Java ASCII
  regex semantics (re.ASCII here).

This file deliberately shares no code with operators/bpe.py: training
uses a collections.Counter pipeline and encode applies one merge at a
time across the whole word, so agreement is evidence about the
ALGORITHM, not about one implementation compared with itself.

Usage: python tools/gen_bpe_expected.py [sf_dir ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_minhash_expected import CORPUS_MD5_SQL, OUT_DIR  # noqa: E402

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

NUM_MERGES = 200
EOW = "</w>"
_WS = re.compile(r"\s+", re.ASCII)


def train(texts: list[str], num_merges: int = NUM_MERGES) -> list[tuple[str, str]]:
    word_freq: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            word_freq[tuple(w) + (EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_freq: Counter = Counter()
        for sym, n in word_freq.items():
            for pair in zip(sym, sym[1:]):
                pair_freq[pair] += n
        if not pair_freq:
            break
        top = max(pair_freq.values())
        if top < 2:
            break
        best = min(p for p, n in pair_freq.items() if n == top)
        merges.append(best)
        glued = best[0] + best[1]
        rewritten: Counter = Counter()
        for sym, n in word_freq.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(glued)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            rewritten[tuple(out)] += n
        word_freq = rewritten
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or (r, i) < (best_rank, best_i)):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def doc_stats(docs: list[tuple[int, str]]):
    merges = train([t for _, t in docs])
    ranks = {m: i for i, m in enumerate(merges)}
    cache: dict[str, int] = {}
    out = []
    for doc_id, text in docs:
        n_tokens = 0
        for w in (text or "").lower().split():
            n = cache.get(w)
            if n is None:
                n = cache[w] = len(encode_word(w, ranks))
            n_tokens += n
        # size(split(trim(lower(text)), '\s+')): Java regex on the
        # trimmed text; empty text -> [''] -> size 1
        trimmed = (text or "").lower().strip()
        n_words = len(_WS.split(trimmed))
        out.append((doc_id, n_words, n_tokens, n_tokens / n_words))
    return out


def main(sf_dirs: list[str]) -> None:
    frames = []
    for d in sf_dirs:
        src = os.path.join(d, "documents.parquet")
        if not os.path.exists(src):
            continue
        (corpus_md5,) = duckdb.sql(CORPUS_MD5_SQL.format(src=f"'{src}'")).fetchone()
        docs = [
            (int(i), t)
            for i, t in duckdb.sql(f"SELECT doc_id, text FROM '{src}'").fetchall()
        ]
        stats = doc_stats(docs)
        frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "doc_id": [s[0] for s in stats],
                    "n_words": [s[1] for s in stats],
                    "n_tokens": [s[2] for s in stats],
                    "tokens_per_word": [s[3] for s in stats],
                }
            )
        )
        print(f"{d}: {len(stats)} docs  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "bpe_token_stats.parquet")
    df = pd.concat(frames, ignore_index=True).astype(
        {
            "doc_id": "int64",
            "n_words": "int32",
            "n_tokens": "int32",
            "tokens_per_word": "float64",
        }
    )
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
