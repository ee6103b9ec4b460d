"""Materialize the expected side assignment for the keyed train/test
split (operators/sampling.py train_test_split with key_col) via the
INDEPENDENT pure-Python xxHash64 replication (tools/pyxxh64.py, written
from the public spec).

The engine computes, per row,

    bucket = pmod(xxhash64(o_custkey, lit(seed)), 1e6) / 1e6
    side   = 'test' if bucket < test_fraction else 'train'

Spark's multi-arg ``xxhash64`` folds left-to-right: the first column is
hashed with seed 42, and each later column is hashed with the running
hash as its seed.  ``o_custkey`` is a LONG (8 LE bytes); the ``lit(7)``
seed literal is an INT (4 LE bytes).  Both folds are validated
bit-for-bit against Spark (see tests/test_sampling_expected.py).

The side is a pure function of the custkey VALUE -- that is the whole
point of the keyed split (partitioning/engine-independent) -- so one
expected table keyed by custkey covers every scale factor whose
custkeys are included here (sf0.001/0.01/0.1 orders are unioned).

Usage: python tools/gen_sampling_expected.py [sf_dir ...]
"""

from __future__ import annotations

import os
import struct
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyxxh64 import xxh64_signed  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "expected_sampling",
)
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# parameters of the registry query train_test_split_summary
SEED = 7
TEST_FRACTION = 0.25
MOD = 1_000_000


def side_of(custkey: int) -> str:
    """Replicates bucket = pmod(xxhash64(custkey, 7), 1e6)/1e6 < 0.25."""
    h_key = xxh64_signed(struct.pack("<q", custkey), 42)
    h = xxh64_signed(struct.pack("<i", SEED), h_key % (1 << 64))
    bucket = (h % MOD) / float(MOD)  # pmod of ints == Python % for positive mod
    return "test" if bucket < TEST_FRACTION else "train"


def main(sf_dirs: list[str]) -> None:
    con = duckdb.connect()
    keys: set[int] = set()
    for d in sf_dirs:
        path = os.path.join(d, "orders.parquet")
        if not os.path.exists(path):
            continue
        for (k,) in con.sql(
            f"SELECT DISTINCT o_custkey FROM '{path}'"
        ).fetchall():
            keys.add(int(k))
    rows = pd.DataFrame(
        {"custkey": sorted(keys)},
    )
    rows["side"] = [side_of(k) for k in rows["custkey"]]
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "custkey_side.parquet")
    rows.to_parquet(out, index=False)
    n_test = int((rows["side"] == "test").sum())
    print(f"wrote {out}: {len(rows)} custkeys, {n_test} test ({n_test/len(rows):.3f})")


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_SF_DIRS)
