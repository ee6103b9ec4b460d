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
    if m % 64:
        # the dense build aggregates and scatters at 64-bit-word
        # granularity and the snapshot geometry check compares
        # len(bitmap)*8 == m; a non-word-aligned m would silently
        # truncate the last partial word (auto-sized m is always a
        # power of two >= 1024, so only explicit m can trip this)
        raise ValueError(
            f"bloom bitmap m must be a multiple of 64 (word-granular "
            f"build and snapshot geometry), got m={m}"
        )
    pos = F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("pos")
    word_rows = (
        df.select(pos)
        # aggregate at 64-bit-WORD granularity, not bytes: a DENSE
        # bitmap (a 2^29-bit manifest bootstrap) would yield m/8 ~ 67M
        # byte rows whose row overhead alone blows
        # spark.driver.maxResultSize; words cut the row count 8x and
        # the Arrow transfer + vectorized scatter keep the driver side
        # sub-second.  Little-endian word layout == the byte layout
        # (bit p -> word p>>6 offset p&63 -> byte p>>3 bit p&7), so
        # the bitmap is bit-identical to the sparse builder's.
        # python-side shiftLeft only takes a literal shift, so the
        # variable shift goes through SQL text
        .selectExpr(
            "CAST(pos DIV 64 AS LONG) AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word_val"))
    )
    from ..session import arrow_transfer

    with arrow_transfer(df.sparkSession):
        word_rows = word_rows.toPandas()
    words = np.zeros(m >> 6, dtype=np.int64)
    words[word_rows["word_idx"].to_numpy()] = word_rows["word_val"].to_numpy()
    return words.tobytes(), m, k


def _bitmap_row_df(spark, bitmap: bytes) -> DataFrame:
    """The bitmap as a one-row ``__bm array<long>`` DataFrame
    (little-endian 64-bit words, so bit p lives at word ``p >> 6``
    offset ``p & 63``) for the JVM-side ``element_at`` probes.

    Shipped through Arrow when available: a py4j/pickle
    ``createDataFrame`` of a million-element Python list costs ~6 s
    per call at a 2^26-bit manifest filter (measured), which lands on
    every micro-batch of the streaming dedup; the Arrow path moves the
    same words as one buffer in ~0.6 s.  Fallback keeps the plain list
    path (identical values) when the Arrow conversion is unavailable."""
    import pandas as pd

    from ..session import arrow_transfer

    padded = np.frombuffer(bitmap, dtype=np.uint8)
    if len(padded) % 8:
        padded = np.pad(padded, (0, 8 - len(padded) % 8))
    words = padded.view("<u8").view(np.int64)
    try:
        with arrow_transfer(spark):
            return spark.createDataFrame(
                pd.DataFrame({"__bm": [words]}),
                schema="__bm array<long>",
            )
    except Exception:
        return spark.createDataFrame(
            [([int(w) for w in words],)], "__bm array<long>"
        )


def build_bloom_bitmap_sparse(
    df: DataFrame,
    key_col: str,
    m: int,
    k: int = 6,
    max_bits: int = MAX_BITS,
) -> tuple[bytes, int, int]:
    """Shuffle-free twin of :func:`build_bloom_bitmap` for SMALL key
    sets (the per-batch snapshot delta of the streaming manifest
    dedup, where the build runs every micro-batch and the explode +
    ``groupBy(byte_idx)`` exchange is pure fixed overhead).

    Positions are the identical JVM-side xxhash64 expressions
    (:func:`_positions`), so the bitmap is BIT-IDENTICAL to the
    aggregate build at the same (m, k) -- tested.  Instead of
    exchanging exploded positions, each Arrow batch ORs its masks into
    sparse ``(byte_idx, byte_val)`` rows inside ``mapInPandas`` (numpy,
    no per-row Python) and the driver ORs the sparse partials: ONE
    narrow job, no shuffle, transfer bounded by ``k * n_keys`` set
    bytes rather than the m/8 dense rows.  Use the aggregate build for
    dense bitmaps (bootstrap over a whole manifest); use this for
    per-batch deltas."""
    if m > max_bits:
        raise ValueError(
            f"bloom bitmap would need {m} bits (> max_bits={max_bits}); "
            "use the distributed aggregate build or raise max_bits"
        )
    if m % 64:
        raise ValueError(
            f"bloom bitmap m must be a multiple of 64 (word-granular "
            f"geometry shared with the aggregate build), got m={m}"
        )

    def _partials(batches):
        for pdf in batches:
            pos = pdf["pos"].to_numpy()  # flattened k positions per key
            if len(pos) == 0:
                continue
            flat = np.concatenate(pos) if pos.dtype == object else pos
            byte_idx = (flat >> 3).astype(np.int64)
            mask = np.left_shift(1, (flat & 7).astype(np.int64))
            order = np.argsort(byte_idx, kind="stable")
            byte_idx, mask = byte_idx[order], mask[order]
            starts = np.flatnonzero(
                np.r_[True, byte_idx[1:] != byte_idx[:-1]]
            )
            ored = np.bitwise_or.reduceat(mask, starts)
            yield pd.DataFrame(
                {"byte_idx": byte_idx[starts], "byte_val": ored}
            )

    from ..session import arrow_transfer

    rows = df.select(
        F.array(*_positions(F.col(key_col), m, k)).alias("pos")
    ).mapInPandas(_partials, "byte_idx long, byte_val long")
    with arrow_transfer(df.sparkSession):
        rows = rows.toPandas()
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    np.bitwise_or.at(
        bitmap,
        rows["byte_idx"].to_numpy(),
        rows["byte_val"].to_numpy().astype(np.uint8),
    )
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

    out = df.crossJoin(F.broadcast(_bitmap_row_df(df.sparkSession, bitmap)))
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
    out = df.crossJoin(F.broadcast(_bitmap_row_df(df.sparkSession, bitmap)))
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
