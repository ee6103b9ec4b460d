"""Materialize expected assignments/centroids for the deterministic
k-means (ml/deterministic.py) via an independent pure-Python re-run.

The operator is reproducible by construction, so this replication is a
genuine cross-implementation check of every stage:

- init: k smallest (md5(f"42:{id}"), id) -- hex md5 sorts the same
  lexicographically in Python, Spark, and DuckDB;
- assignment: sequential IEEE double fold of (x - c)^2 per centroid,
  ties to the smaller cluster index;
- update: each coordinate cast to DECIMAL(38,15) the way Spark casts
  double -> decimal -- via the SHORTEST decimal representation
  (BigDecimal.valueOf/Double.toString, i.e. Python ``repr``), then
  HALF_UP to 15 frac digits -- summed exactly, and the new centroid is
  ``float(decimal_sum) / count`` exactly as the driver computes it.

Usage: python tools/gen_kmeans_expected.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_lsh_expected import EMB_MD5_SQL  # noqa: E402
from gen_minhash_expected import OUT_DIR  # noqa: E402

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

K = 8
N_ITER = 5
SEED = 42
_Q15 = Decimal("1e-15")


def _dec15(x: float) -> Decimal:
    # Spark cast(double as decimal(38,15)): BigDecimal.valueOf ==
    # shortest repr, then HALF_UP to scale 15
    return Decimal(repr(x)).quantize(_Q15, rounding=ROUND_HALF_UP)


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


def kmeans(vecs: dict[int, list[float]]):
    keyed = sorted(
        (hashlib.md5(f"{SEED}:{i}".encode()).hexdigest(), i) for i in vecs
    )
    centroids = [list(vecs[i]) for _, i in keyed[:K]]
    dim = len(next(iter(vecs.values())))
    for _ in range(N_ITER):
        sums = [[Decimal(0)] * dim for _ in range(K)]
        counts = [0] * K
        for i, v in vecs.items():
            c = _assign(v, centroids)
            counts[c] += 1
            row = sums[c]
            for p, x in enumerate(v):
                row[p] += _dec15(x)
        for c in range(K):
            if counts[c]:
                centroids[c] = [float(sums[c][p]) / counts[c] for p in range(dim)]
    assignments = {i: _assign(v, centroids) for i, v in vecs.items()}
    return assignments, centroids


def main(sf_dirs: list[str]) -> None:
    a_frames, c_frames = [], []
    for d in sf_dirs:
        src = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(src):
            continue
        (corpus_md5,) = duckdb.sql(EMB_MD5_SQL.format(src=f"'{src}'")).fetchone()
        rows = duckdb.sql(f"SELECT vec_id, embedding FROM '{src}'").fetchall()
        vecs = {int(i): [float(x) for x in v] for i, v in rows}
        assignments, centroids = kmeans(vecs)
        a_frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "vec_id": sorted(assignments),
                    "cluster": [assignments[i] for i in sorted(assignments)],
                }
            )
        )
        c_frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "cluster": [ci for ci in range(K) for _ in centroids[ci]],
                    "pos": [p for ci in range(K) for p in range(len(centroids[ci]))],
                    "value": [v for ci in range(K) for v in centroids[ci]],
                }
            )
        )
        sizes = pd.Series(list(assignments.values())).value_counts().sort_index()
        print(f"{d}: {len(assignments)} rows, cluster sizes {sizes.tolist()}  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    adf = pd.concat(a_frames, ignore_index=True).astype({"vec_id": "int64", "cluster": "int32"})
    adf.to_parquet(os.path.join(OUT_DIR, "kmeans_deterministic.parquet"), index=False)
    cdf = pd.concat(c_frames, ignore_index=True).astype(
        {"cluster": "int32", "pos": "int32", "value": "float64"}
    )
    cdf.to_parquet(os.path.join(OUT_DIR, "kmeans_deterministic_centroids.parquet"), index=False)
    print(f"wrote {len(adf)} assignment rows, {len(cdf)} centroid rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
