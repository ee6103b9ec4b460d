"""Materialize expected codes/codebooks for the deterministic product
quantizer (ml/deterministic.py deterministic_pq) via an independent
pure-Python re-run -- the gen_kmeans_expected.py pattern applied per
sub-space.

Replication points, each mirroring the Spark operator verbatim:

- normalization: norm = sqrt(sequential left-to-right IEEE fold of
  x*x over the double-cast coordinates), nv[i] = x[i] / norm -- the
  exact op sequence of the hoisted-norm column in deterministic_pq;
- per sub-space j: slice nv[j*dsub : (j+1)*dsub] and run the SAME
  deterministic k-means (md5(f"{seed+j}:{id}") init, sequential d2
  fold with ties to the smaller index, DECIMAL(38,15) centroid sums
  quantized exactly the way Spark casts double -> decimal, centroid =
  float(decimal_sum)/count) for the same fixed iteration count;
- the code of a vector in sub-space j IS its final assignment there.

Usage: python tools/gen_pq_expected.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_kmeans_expected import _dec15  # noqa: E402
from gen_lsh_expected import EMB_MD5_SQL  # noqa: E402
from gen_minhash_expected import OUT_DIR  # noqa: E402

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

M = 4
KS = 16
N_ITER = 5
SEED = 42


def _assign(v: list[float], centroids: list[list[float]]) -> int:
    best = None
    for i, c in enumerate(centroids):
        d = 0.0
        for x, y in zip(v, c):
            t = x - y
            d += t * t
        if best is None or (d, i) < best:
            best = (d, i)
    return best[1]


def kmeans(vecs: dict[int, list[float]], k: int, n_iter: int, seed: int):
    keyed = sorted(
        (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i) for i in vecs
    )
    centroids = [list(vecs[i]) for _, i in keyed[:k]]
    dim = len(next(iter(vecs.values())))
    for _ in range(n_iter):
        sums = [[Decimal(0)] * dim for _ in range(k)]
        counts = [0] * k
        for i, v in vecs.items():
            c = _assign(v, centroids)
            counts[c] += 1
            row = sums[c]
            for p, x in enumerate(v):
                row[p] += _dec15(x)
        for c in range(k):
            if counts[c]:
                centroids[c] = [float(sums[c][p]) / counts[c] for p in range(dim)]
    assignments = {i: _assign(v, centroids) for i, v in vecs.items()}
    return assignments, centroids


def normalize(v: list[float]) -> list[float]:
    acc = 0.0
    for x in v:  # sequential IEEE fold, exactly F.aggregate's order
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in v]


def main(sf_dirs: list[str]) -> None:
    code_frames, book_frames = [], []
    for d in sf_dirs:
        src = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(src):
            continue
        (corpus_md5,) = duckdb.sql(EMB_MD5_SQL.format(src=f"'{src}'")).fetchone()
        rows = duckdb.sql(f"SELECT vec_id, embedding FROM '{src}'").fetchall()
        normed = {int(i): normalize([float(x) for x in v]) for i, v in rows}
        dim = len(next(iter(normed.values())))
        assert dim % M == 0, f"dim {dim} not divisible by M={M}"
        dsub = dim // M
        for j in range(M):
            sub = {i: v[j * dsub : (j + 1) * dsub] for i, v in normed.items()}
            assignments, centroids = kmeans(sub, KS, N_ITER, SEED + j)
            code_frames.append(
                pd.DataFrame(
                    {
                        "corpus_md5": corpus_md5,
                        "vec_id": sorted(assignments),
                        "sub": j,
                        "cid": [assignments[i] for i in sorted(assignments)],
                    }
                )
            )
            book_frames.append(
                pd.DataFrame(
                    {
                        "corpus_md5": corpus_md5,
                        "sub": j,
                        "cid": [c for c in range(KS) for _ in centroids[c]],
                        "pos": [p for c in range(KS) for p in range(len(centroids[c]))],
                        "value": [x for c in range(KS) for x in centroids[c]],
                    }
                )
            )
        print(f"{d}: {len(normed)} vectors x {M} sub-spaces  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    cdf = pd.concat(code_frames, ignore_index=True).astype(
        {"vec_id": "int64", "sub": "int32", "cid": "int32"}
    )
    cdf.to_parquet(os.path.join(OUT_DIR, "pq_det_codes.parquet"), index=False)
    bdf = pd.concat(book_frames, ignore_index=True).astype(
        {"sub": "int32", "cid": "int32", "pos": "int32", "value": "float64"}
    )
    bdf.to_parquet(os.path.join(OUT_DIR, "pq_det_codebooks.parquet"), index=False)
    print(f"wrote {len(cdf)} code rows, {len(bdf)} codebook rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
