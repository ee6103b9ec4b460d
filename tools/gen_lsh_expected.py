"""Materialize expected outputs for the BucketedRandomProjectionLSH
queries (embedding_near_dups, ann_lsh_top10, ann_lsh_recall) via an
INDEPENDENT pure-Python replication.

Spark's BRP-LSH is deterministic for a fixed seed: the random unit
vectors come from ``new Random(seed)`` (java.util.Random -- a published
LCG, replicated from the Javadoc spec in tools/javarandom.py and
validated bit-for-bit against a live Spark model), each hash is
``floor(dot(v, unit) / bucketLength)``, and ``approxSimilarityJoin``
joins on (table-index, hash value) then filters
``euclidean(a, b) < threshold``.  Every float op (norms, dots, sqdist)
is a SEQUENTIAL IEEE-double accumulation in both engines, so results
agree bit-for-bit -- asserted by the oracle, not assumed.

Corpora are keyed by a DuckDB-computed fingerprint (both the generator
and the oracle run the SAME SQL on the same engine):

    md5(string_agg(md5(CAST(embedding AS VARCHAR)), '' ORDER BY vec_id))

Replicated parameters mirror the registry queries:
- embedding_near_dups: fit on all normalized vectors, 4 tables,
  bucketLength=2.0, seed=42, threshold sqrt(2*(1-0.4)).
- ann_lsh_top10: fit on corpus (vec_id >= 5), 4 tables,
  bucketLength=1.0, seed=42, threshold 1.2, exact re-rank to top-10
  per query (ties on vec_id).
- ann_lsh_recall: hits of ann_lsh_top10 in the exact brute-force
  top-10 (cosine rounded half-up to 6 dp BEFORE ranking, the
  brute_force_topk round_dp convention).

Usage: python tools/gen_lsh_expected.py [sf_dir ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from javarandom import JavaRandom  # noqa: E402

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

EMB_MD5_SQL = (
    "SELECT md5(string_agg(md5(CAST(embedding AS VARCHAR)), '' ORDER BY vec_id)) "
    "FROM {src}"
)


def seq_norm(v: list[float]) -> float:
    s = 0.0
    for x in v:
        s += x * x
    return math.sqrt(s)


def seq_dot(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def seq_euclid(a: list[float], b: list[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        d = x - y
        s += d * d
    return math.sqrt(s)


def round_half_up6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def unit_vectors(seed: int, num_tables: int, dim: int) -> list[list[float]]:
    """fit(): numTables x dim gaussians from java.util.Random(seed),
    each vector L2-normalized (breeze normalize -- sequential norm)."""
    rng = JavaRandom(seed)
    units = []
    for _ in range(num_tables):
        arr = [rng.next_gaussian() for _ in range(dim)]
        n = seq_norm(arr)
        units.append([x / n for x in arr])
    return units


def hashes_of(nvec: list[float], units: list[list[float]], bucket_length: float) -> tuple:
    return tuple(math.floor(seq_dot(nvec, u) / bucket_length) for u in units)


def lsh_candidates(
    a_items: dict[int, tuple],
    b_items: dict[int, tuple],
) -> set[tuple[int, int]]:
    """approxSimilarityJoin candidate pairs: share >= 1 (table, hash)."""
    index: dict[tuple[int, int], list[int]] = defaultdict(list)
    for bid, hs in b_items.items():
        for t, h in enumerate(hs):
            index[(t, h)].append(bid)
    out: set[tuple[int, int]] = set()
    for aid, hs in a_items.items():
        for t, h in enumerate(hs):
            for bid in index.get((t, h), ()):
                out.add((aid, bid))
    return out


def load(sf_dir: str):
    src = os.path.join(sf_dir, "embeddings.parquet")
    (corpus_md5,) = duckdb.sql(EMB_MD5_SQL.format(src=f"'{src}'")).fetchone()
    rows = duckdb.sql(f"SELECT vec_id, embedding FROM '{src}'").fetchall()
    # float32 -> Python float is exact; cast-to-double replicates the
    # engine's x.cast('double')
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    return corpus_md5, vecs


def gen_near_dups(vecs: dict[int, list[float]]):
    """embedding_near_dup_pairs(min_cosine=0.4, tables=4, bucket=2.0)."""
    normed = {}
    for i, v in vecs.items():
        n = seq_norm(v)
        if n > 0:
            normed[i] = [x / n for x in v]
    dim = len(next(iter(normed.values())))
    units = unit_vectors(42, 4, dim)
    hs = {i: hashes_of(nv, units, 2.0) for i, nv in normed.items()}
    threshold = math.sqrt(2.0 * (1.0 - 0.4))
    out = []
    for ia, ib in lsh_candidates(hs, hs):
        if ia >= ib:
            continue
        e = seq_euclid(normed[ia], normed[ib])
        if e < threshold:
            out.append((ia, ib, 1 - e * e / 2))
    return sorted(out)


def gen_ann_top10(vecs: dict[int, list[float]]):
    """lsh_topk(k=10, tables=4, bucket=1.0, max_euclid=1.2): fit on
    corpus, join corpus x queries, exact re-rank."""
    queries = {i: v for i, v in vecs.items() if i < 5}
    corpus = {i: v for i, v in vecs.items() if i >= 5}
    cn = {i: [x / seq_norm(v) for x in v] for i, v in corpus.items() if seq_norm(v) > 0}
    qn = {i: [x / seq_norm(v) for x in v] for i, v in queries.items() if seq_norm(v) > 0}
    dim = len(next(iter(cn.values())))
    units = unit_vectors(42, 4, dim)
    ch = {i: hashes_of(nv, units, 1.0) for i, nv in cn.items()}
    qh = {i: hashes_of(nv, units, 1.0) for i, nv in qn.items()}
    cand = lsh_candidates(ch, qh)  # (corpus_id, query_id)
    scored: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for cid, qid in cand:
        e = seq_euclid(cn[cid], qn[qid])
        if e < 1.2:
            scored[qid].append((1 - e * e / 2, cid))
    out = []
    for qid, items in scored.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, cid) in enumerate(items[:10], start=1):
            out.append((qid, cid, cos, rank))
    return sorted(out)


def gen_recall(vecs: dict[int, list[float]], approx_rows) -> list[tuple[int, float]]:
    """_ann_recall vs brute_force_topk(round_dp=6): per query,
    sum(approx hit in exact top-10) / 10."""
    queries = {i: v for i, v in vecs.items() if i < 5}
    corpus = {i: v for i, v in vecs.items() if i >= 5}
    cnorm = {i: seq_norm(v) for i, v in corpus.items()}
    exact: dict[int, list[int]] = {}
    for qid, qv in queries.items():
        qn = seq_norm(qv)
        scored = [
            (round_half_up6(seq_dot(cv, qv) / (cnorm[cid] * qn)), cid)
            for cid, cv in corpus.items()
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        exact[qid] = [cid for _, cid in scored[:10]]
    approx: dict[int, set[int]] = defaultdict(set)
    for qid, cid, _cos, _rank in approx_rows:
        approx[qid].add(cid)
    out = []
    for qid in sorted(exact):
        hits = sum(1 for cid in exact[qid] if cid in approx[qid])
        out.append((qid, hits / len(exact[qid])))
    return out


def main(sf_dirs: list[str]) -> None:
    nd_frames, top_frames, rec_frames = [], [], []
    for d in sf_dirs:
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            continue
        corpus_md5, vecs = load(d)
        nd = gen_near_dups(vecs)
        top = gen_ann_top10(vecs)
        rec = gen_recall(vecs, top)
        nd_frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "id_a": [p[0] for p in nd],
                    "id_b": [p[1] for p in nd],
                    "cosine": [p[2] for p in nd],
                }
            )
        )
        top_frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "query_id": [p[0] for p in top],
                    "vec_id": [p[1] for p in top],
                    "cosine": [p[2] for p in top],
                    "rank": [p[3] for p in top],
                }
            )
        )
        rec_frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "query_id": [p[0] for p in rec],
                    "recall_at_10": [p[1] for p in rec],
                }
            )
        )
        print(f"{d}: near_dups={len(nd)} top10={len(top)} recall={len(rec)} ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, frames, casts in (
        ("embedding_near_dups", nd_frames, {"id_a": "int64", "id_b": "int64"}),
        ("ann_lsh_top10", top_frames, {"query_id": "int64", "vec_id": "int64", "rank": "int32"}),
        ("ann_lsh_recall", rec_frames, {"query_id": "int64", "recall_at_10": "float64"}),
    ):
        df = pd.concat(frames, ignore_index=True).astype(casts)
        out = os.path.join(OUT_DIR, f"{name}.parquet")
        df.to_parquet(out, index=False)
        print(f"wrote {out}: {len(df)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
