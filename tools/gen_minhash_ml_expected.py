"""Materialize expected pairs for minhash_near_dups (the pyspark.ml
MinHashLSH + HashingTF path) via an INDEPENDENT pure-Python
replication -- every stage is deterministic for seed 42:

- HashingTF: index = nonNegativeMod(murmur3_x86_32(utf8(term), 42),
  numFeatures) over the distinct word-3-shingles (tools/pymurmur3.py,
  written from the published spec; validated bit-for-bit in
  tests/test_minhash_ml_expected.py).
- MinHashLSH.fit: per table, (a, b) = (1 + nextInt(P-1), nextInt(P-1))
  from java.util.Random(42) (tools/javarandom.py), P = 2038074743.
- per-table hash = min over active indices of ((1+i)*a + b) % P.
- approxSimilarityJoin: candidates share >= 1 (table, hash value);
  jaccard distance = 1 - |A n B| / |A u B| over the index SETS;
  the filter is STRICT (distance < threshold -- probed empirically:
  a constructed pair at exactly 0.7 is excluded at threshold 0.7).

Replicated parameters mirror the registry query minhash_near_dups:
numHashTables=8, numFeatures=2^18, shingle_n=3,
max_jaccard_distance=0.7.

Usage: python tools/gen_minhash_ml_expected.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_minhash_expected import CORPUS_MD5_SQL, OUT_DIR, shingle_set  # noqa: E402
from javarandom import JavaRandom  # noqa: E402
from pymurmur3 import murmur3_x86_32, non_negative_mod  # noqa: E402

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

NUM_TABLES = 8
NUM_FEATURES = 1 << 18
SHINGLE_N = 3
MAX_DISTANCE = 0.7
HASH_PRIME = 2038074743


def ml_pairs(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    rng = JavaRandom(42)
    coefs = [
        (1 + rng.next_int(HASH_PRIME - 1), rng.next_int(HASH_PRIME - 1))
        for _ in range(NUM_TABLES)
    ]
    idx_cache: dict[str, int] = {}
    features: dict[int, frozenset[int]] = {}
    hashes: dict[int, tuple[int, ...]] = {}
    for doc_id, text in docs:
        sh = shingle_set(text, SHINGLE_N)
        if not sh:
            continue
        idx = frozenset(
            idx_cache.setdefault(
                s, non_negative_mod(murmur3_x86_32(s.encode("utf-8"), 42), NUM_FEATURES)
            )
            for s in sh
        )
        features[doc_id] = idx
        hashes[doc_id] = tuple(
            min(((1 + i) * a + b) % HASH_PRIME for i in idx) for a, b in coefs
        )

    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, hs in hashes.items():
        for t, h in enumerate(hs):
            buckets[(t, h)].append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1 :]:
                cand.add((x, y))

    out = []
    for id_a, id_b in sorted(cand):
        fa, fb = features[id_a], features[id_b]
        inter = len(fa & fb)
        union = len(fa) + len(fb) - inter
        dist = 1 - inter / union
        if dist < MAX_DISTANCE:
            out.append((id_a, id_b, dist))
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
        pairs = ml_pairs(docs)
        frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "id_a": [p[0] for p in pairs],
                    "id_b": [p[1] for p in pairs],
                    "jaccard_distance": [p[2] for p in pairs],
                }
            )
        )
        print(f"{d}: {len(docs)} docs -> {len(pairs)} pairs  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "minhash_ml_pairs.parquet")
    df = pd.concat(frames, ignore_index=True).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard_distance": "float64"}
    )
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
