"""Materialize expected near-duplicate pairs for the hand-rolled banded
MinHash operator (operators/dedup.py minhash_banded_pairs) via an
INDEPENDENT pure-Python/numpy replication.

Everything in the operator is deterministic: shingle hashes are Spark
``xxhash64`` (replicated from the public spec in tools/pyxxh64.py,
validated bit-for-bit), the k=32 affine minhash constants come from
``random.Random(42)``, banding is a pure slice, and the exact-Jaccard
verification is set arithmetic.  So the full pair set (id_a, id_b,
est_jaccard, jaccard) is a pure function of the corpus and can be
precomputed here and joined in the DuckDB oracle.

One deliberate simplification: Spark buckets postings on
``xxhash64(slice(sig, b*r+1, r))`` while this replication groups on the
band-slice TUPLE itself.  The two agree unless Spark's 64-bit bucket
hash collides across distinct slices (probability ~2^-64 per posting
pair; a collision could only ADD candidates, which the exact-Jaccard
filter then rejects unless the pair genuinely clears min_jaccard --
and any such divergence would surface as an oracle FAIL, which is the
point of the check).

Replicated parameters mirror the registry query minhash_banded_near_dups:
num_hashes=32, num_bands=8, shingle_n=3, min_jaccard=0.3,
max_bucket_size=256.

Corpora are keyed by ``corpus_md5 = md5(string_agg(md5(text), ''
ORDER BY doc_id))`` -- computable verbatim in the DuckDB oracle -- so
one parquet covers every fixture (sf0.001 and sf0.01 share a row count
but not content; a count discriminator would be ambiguous).

Usage: python tools/gen_minhash_expected.py [sf_dir ...]
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import defaultdict

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyxxh64 import xxh64  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "expected_dedup",
)
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

NUM_HASHES = 32
NUM_BANDS = 8
SHINGLE_N = 3
MIN_JACCARD = 0.3
MAX_BUCKET = 256
PRIME_MOD = (1 << 32) + 15

CORPUS_MD5_SQL = "SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) FROM {src}"

_WS = re.compile(r"\s+", re.ASCII)


def shingle_set(text: str, n: int = SHINGLE_N) -> set[str]:
    """normalize -> word n-grams, distinct (operators/dedup.py
    word_shingles: lower/trim/collapse-ws, drop empty tokens)."""
    norm = _WS.sub(" ", text.strip().lower())
    toks = [t for t in norm.split(" ") if t != ""]
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - (n - 1), 0))}


def _constants() -> tuple[list[int], list[int]]:
    rng = random.Random(42)
    a = [rng.randrange(1, 1 << 31) | 1 for _ in range(NUM_HASHES)]
    b = [rng.randrange(0, 1 << 31) for _ in range(NUM_HASHES)]
    return a, b


def banded_pairs(docs: list[tuple[int, str]]) -> list[tuple[int, int, float, float]]:
    a_consts, b_consts = _constants()
    a = np.array(a_consts, dtype=np.uint64)
    b = np.array(b_consts, dtype=np.uint64)
    r = NUM_HASHES // NUM_BANDS

    shingles: dict[int, set[str]] = {}
    sigs: dict[int, tuple[int, ...]] = {}
    hash_cache: dict[str, int] = {}
    for doc_id, text in docs:
        sh = shingle_set(text)
        if not sh:
            continue  # MinHash undefined on empty sets (operator drops them)
        shingles[doc_id] = sh
        hs = np.array(
            [
                hash_cache.setdefault(s, xxh64(s.encode("utf-8")) & 0xFFFFFFFF)
                for s in sh
            ],
            dtype=np.uint64,
        )
        # (h*a + b) % prime: h < 2^32, a < 2^31 -> product < 2^63, no wrap
        v = (hs[:, None] * a[None, :] + b[None, :]) % np.uint64(PRIME_MOD)
        sigs[doc_id] = tuple(int(x) for x in v.min(axis=0))

    buckets: dict[tuple[int, tuple[int, ...]], list[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for band in range(NUM_BANDS):
            buckets[(band, sig[band * r : (band + 1) * r])].append(doc_id)

    prefilter = max(0.0, MIN_JACCARD - 3.0 / (NUM_HASHES ** 0.5))
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2 or len(members) > MAX_BUCKET:
            continue
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1 :]:
                cand.add((x, y))

    out = []
    for id_a, id_b in sorted(cand):
        sa, sb = sigs[id_a], sigs[id_b]
        est = sum(1 for u, v in zip(sa, sb) if u == v) / NUM_HASHES
        if est < prefilter:
            continue
        xa, xb = shingles[id_a], shingles[id_b]
        inter = len(xa & xb)
        union = len(xa) + len(xb) - inter
        jac = inter / union
        if jac >= MIN_JACCARD:
            out.append((id_a, id_b, est, jac))
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
        pairs = banded_pairs(docs)
        frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "id_a": [p[0] for p in pairs],
                    "id_b": [p[1] for p in pairs],
                    "est_jaccard": [p[2] for p in pairs],
                    "jaccard": [p[3] for p in pairs],
                }
            )
        )
        print(f"{d}: {len(docs)} docs -> {len(pairs)} pairs  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "minhash_banded_pairs.parquet")
    all_rows = pd.concat(frames, ignore_index=True)
    all_rows = all_rows.astype(
        {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64", "jaccard": "float64"}
    )
    all_rows.to_parquet(out, index=False)
    print(f"wrote {out}: {len(all_rows)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
