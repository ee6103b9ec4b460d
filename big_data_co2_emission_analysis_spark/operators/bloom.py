"""From-scratch distributed Bloom filter: build over a key column as a
DataFrame aggregate, probe as a broadcast bitmap lookup.

Why it exists: the exact contamination check (queries/text_queries.py
`contamination_check`) broadcasts the probe-set grams -- right for a
benchmark-sized probe, impossible when the probe side outgrows the
broadcast threshold (decontaminating against another 100 TB corpus).
The classic fix is a Bloom prefilter: the corpus side drops every gram
that can't be in the probe set BEFORE the shuffle join, cutting the
shuffled volume by roughly the true-negative rate; the surviving
candidates then exact-confirm through the ordinary shuffle join, so
false positives are removed and the OUTPUT IS BIT-IDENTICAL to the
exact query -- which is what keeps the bloom path oracle-checkable.

Spark's own BloomFilter (``df.stat.bloomFilter``) returns a JVM object
unusable inside Python executors, so this is built from public
primitives instead:

- positions: ``pmod(xxhash64(key, seed_i), m)`` for k seeds -- computed
  JVM-side (codegen) on BOTH build and probe sides, so Python never
  needs to reimplement the hash;
- build: explode the k positions -> ``(pos >> 3)`` byte index ->
  ``bit_or`` aggregate of the bit masks -> collect the sparse byte map
  (bounded by m/8 rows, guarded) -> a numpy bitmap broadcast to
  executors;
- probe: a Pandas UDF that does k vectorized numpy bitmap lookups per
  row -- no hashing in Python, just ``bitmap[idx] & mask``.

Sizing: m defaults to the next power of two >= bits_per_key * n_keys
(n_keys measured with one cheap count-distinct job), k hash functions.
bits_per_key=10, k=6 gives ~1% false positives -- only wasted shuffle
bytes, never wrong output.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves string hints in module globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hard cap on the driver-side bitmap (2^30 bits = 128 MiB): beyond
#: this the bitmap itself should be built/kept distributed (IVF-style
#: partitioned bitmap), not collected
MAX_BITS = 1 << 30


def _positions(key_col, m: int, k: int) -> list:
    # xxhash64 over (key, seed literal) -- distinct streams per seed,
    # identical JVM-side arithmetic on build and probe sides
    return [F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m)) for i in range(k)]


def build_bloom_bitmap(
    df: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    k: int = 6,
    max_bits: int = MAX_BITS,
    m: int | None = None,
) -> tuple[bytes, int, int]:
    """Aggregate ``df[key_col]`` into a Bloom bitmap; returns
    ``(bitmap_bytes, m, k)``.

    One count-distinct job sizes m (unless an explicit ``m`` is given
    -- required when bitmaps must OR together across builds, e.g. the
    incrementally-maintained manifest filter, where every snapshot must
    share the same geometry); one explode + bit_or aggregate builds the
    byte map (<= m/8 rows to the driver, raising past ``max_bits``
    instead of collecting an oversized bitmap)."""
    if m is None:
        n = df.select(F.approx_count_distinct(key_col).alias("n")).first()["n"] or 1
        m = 1 << max(10, math.ceil(math.log2(bits_per_key * n)))
    if m > max_bits:
        raise ValueError(
            f"bloom bitmap would need {m} bits (> max_bits={max_bits}) for "
            f"the requested capacity; keep the filter distributed "
            "(partitioned bitmap) instead of collecting it, or raise "
            "max_bits explicitly"
        )
    pos = F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("pos")
    byte_rows = (
        df.select(pos)
        # python-side shiftLeft only takes a literal shift, so the
        # variable shift goes through SQL text
        .selectExpr(
            "CAST(pos DIV 8 AS LONG) AS byte_idx",
            "CAST(shiftleft(1, CAST(pos % 8 AS INT)) AS LONG) AS mask",
        )
        .groupBy("byte_idx")
        .agg(F.expr("bit_or(mask)").alias("byte_val"))
        .collect()
    )
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    for r in byte_rows:
        bitmap[r["byte_idx"]] = r["byte_val"]
    return bitmap.tobytes(), m, k


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    m: int,
    k: int,
) -> DataFrame:
    """Keep only rows whose ``key_col`` MIGHT be in the filter (no
    false negatives; ~fpp false positives survive for the exact-confirm
    stage).  Hash positions are computed JVM-side; the Pandas UDF is a
    pure vectorized bitmap lookup."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.frombuffer(bitmap, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def _hit(pos_arrays: pd.Series) -> pd.Series:
        bm = bc.value
        if len(pos_arrays) == 0:
            return pd.Series([], dtype=bool)
        P = np.asarray(pos_arrays.tolist(), dtype=np.int64)  # (n, k)
        hits = np.ones(len(P), dtype=bool)
        for i in range(P.shape[1]):
            p = P[:, i]
            hits &= (bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hits)

    pos_arr = F.array(*_positions(F.col(key_col), m, k))
    return (
        df.withColumn("__bloom_hit", _hit(pos_arr))
        .filter(F.col("__bloom_hit"))
        .drop("__bloom_hit")
    )


def bloom_prefilter_jvm(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    m: int,
    k: int,
) -> DataFrame:
    """JVM-only twin of :func:`bloom_prefilter`: the bitmap rides as a
    single broadcast row holding an ``array<long>`` (little-endian
    64-bit words of the same bitmap), and each membership probe is a
    codegen'd ``element_at`` + variable ``shiftright`` -- the row never
    crosses into Python.

    Measured at 500k docs / 20M grams: the Pandas-UDF variant spends
    ~100 s shipping the gram stream through Arrow to do a trivial numpy
    lookup; this variant keeps the probe at scan speed, which is the
    difference between a prefilter that pays for itself and one that
    costs more than the shuffle it saves.  Identical survivors to the
    UDF variant (same positions, same bitmap -- parity-tested)."""
    import numpy as np

    padded = np.frombuffer(bitmap, dtype=np.uint8)
    if len(padded) % 8:
        padded = np.pad(padded, (0, 8 - len(padded) % 8))
    # little-endian words make bit p live at word p>>6, offset p&63
    words = [int(w) for w in padded.view("<u8").view(np.int64)]
    spark = df.sparkSession
    bm_df = spark.createDataFrame([(words,)], "__bm array<long>")

    out = df.crossJoin(F.broadcast(bm_df))
    cond = F.lit(True)
    for i, pos in enumerate(_positions(F.col(key_col), m, k)):
        p = f"__bpos{i}"
        out = out.withColumn(p, pos)
        bit = F.expr(
            f"shiftright(element_at(__bm, CAST(shiftright({p}, 6) AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1"
        )
        cond = cond & (bit == 1)
    return (
        out.filter(cond)
        .drop("__bm", *[f"__bpos{i}" for i in range(k)])
    )


def with_bloom_hit_jvm(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    m: int,
    k: int,
    hit_col: str = "__bloom_hit",
) -> DataFrame:
    """Annotate rather than filter: ``hit_col`` is true iff ``key_col``
    MIGHT be in the filter (no false negatives).  Same codegen'd
    element_at/shiftright probe as :func:`bloom_prefilter_jvm`, but the
    caller keeps both sides of the split -- the shape needed when
    misses take a cheap path and hits take an exact-confirm path
    (manifest dedup: definitely-new rows skip the join entirely)."""
    padded = np.frombuffer(bitmap, dtype=np.uint8)
    if len(padded) % 8:
        padded = np.pad(padded, (0, 8 - len(padded) % 8))
    words = [int(w) for w in padded.view("<u8").view(np.int64)]
    spark = df.sparkSession
    bm_df = spark.createDataFrame([(words,)], "__bm array<long>")

    out = df.crossJoin(F.broadcast(bm_df))
    cond = F.lit(True)
    pos_cols = []
    for i, pos in enumerate(_positions(F.col(key_col), m, k)):
        p = f"__bpos{i}"
        pos_cols.append(p)
        out = out.withColumn(p, pos)
        bit = F.expr(
            f"shiftright(element_at(__bm, CAST(shiftright({p}, 6) AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1"
        )
        cond = cond & (bit == 1)
    return out.withColumn(hit_col, cond).drop("__bm", *pos_cols)
