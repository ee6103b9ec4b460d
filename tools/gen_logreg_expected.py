"""Materialize expected weights for the deterministic logistic
regression (ml/deterministic.py deterministic_logreg) via an
independent pure-Python re-run of the published full-batch GD
algorithm.

Replication contract (must mirror the Spark operator op-for-op):

- margin: left-to-right IEEE fold of w_j * double(x_j), then + b;
- probability: the algebraic sigmoid 0.5*(1 + (m/2)/(1+|m/2|)) --
  only +,*,/,abs, so every engine produces the identical double
  (the reason the operator does NOT use exp());
- gradient terms (err, err*x_j) cast to DECIMAL(38,15) the way Spark
  casts double -> decimal (shortest repr, HALF_UP to 15 frac digits),
  summed exactly (order-free), then w -= lr * float(sum) / n.

Target y = (label < 5), the balanced binary split of the fixture's
10-way label.

Usage: python tools/gen_logreg_expected.py [sf_dir ...]
"""

from __future__ import annotations

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

N_ITER = 5
LR = 0.5
_Q15 = Decimal("1e-15")


def _dec15(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(_Q15, rounding=ROUND_HALF_UP)


def _sigmoid(m: float) -> float:
    h = m * 0.5
    return 0.5 * (1.0 + h / (1.0 + abs(h)))


def _margin(v: list[float], w: list[float], b: float) -> float:
    d = 0.0
    for x, wj in zip(v, w):
        d += x * wj
    return d + b


def logreg(rows: list[tuple[list[float], float]]):
    """rows = [(vector_as_doubles, y)] in any order (sums are exact
    decimals, so order cannot matter)."""
    n = len(rows)
    dim = len(rows[0][0])
    w = [0.0] * dim
    b = 0.0
    for _ in range(N_ITER):
        sums = [Decimal(0)] * (dim + 1)
        for v, y in rows:
            err = _sigmoid(_margin(v, w, b)) - y
            sums[0] += _dec15(err)
            for j, x in enumerate(v):
                sums[j + 1] += _dec15(err * x)
        b -= LR * (float(sums[0]) / n)
        w = [wj - LR * (float(sums[j + 1]) / n) for j, wj in enumerate(w)]
    return w, b


def main(sf_dirs: list[str]) -> None:
    frames = []
    for d in sf_dirs:
        src = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(src):
            continue
        (corpus_md5,) = duckdb.sql(EMB_MD5_SQL.format(src=f"'{src}'")).fetchone()
        rows = duckdb.sql(f"SELECT embedding, label FROM '{src}'").fetchall()
        data = [([float(x) for x in v], 1.0 if lbl < 5 else 0.0) for v, lbl in rows]
        w, b = logreg(data)
        acc = sum(
            1
            for v, y in data
            if (1 if _round6(_sigmoid(_margin(v, w, b))) >= 0.5 else 0) == int(y)
        ) / len(data)
        frames.append(
            pd.DataFrame(
                {
                    "corpus_md5": corpus_md5,
                    "pos": list(range(len(w) + 1)),
                    "weight": [b] + w,
                }
            )
        )
        print(f"{d}: n={len(data)} dim={len(w)} train-acc={acc:.3f}  ({corpus_md5[:8]})")
    os.makedirs(OUT_DIR, exist_ok=True)
    out = pd.concat(frames, ignore_index=True).astype({"pos": "int32", "weight": "float64"})
    out.to_parquet(os.path.join(OUT_DIR, "logreg_weights.parquet"), index=False)
    print(f"wrote {len(out)} weight rows")


def _round6(x: float) -> float:
    # Spark F.round on double: HALF_UP on the shortest repr
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
