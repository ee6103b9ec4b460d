"""Sampling operators for training-data pipelines.

The reference's one sampling call is a plain Bernoulli sample feeding
the k-means fit (reference project-co2.py:48, SURVEY.md R1).  A
training-data pipeline additionally needs stratified sampling (class
rebalancing) and reproducible train/test splits -- both map-side,
shuffle-free, and seed-deterministic for a FIXED partitioning (Spark's
per-partition RNG streams make the exact row set partitioning-
dependent; SURVEY.md section 7 "hard parts" documents the same hazard
for the reference's sample call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): keep fraction
    ``fractions[v]`` of rows with ``strata_col == v`` (strata absent
    from the dict drop entirely).  The class-rebalancing primitive:
    downsample the majority class, keep the rest."""
    return df.sampleBy(strata_col, fractions, seed)


def train_test_split(
    df: DataFrame, test_fraction: float = 0.2, key_col: str | None = None, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Reproducible train/test split.

    With ``key_col``: HASH-BASED -- a row's side depends only on its
    key value, so the split is stable across partitionings, re-runs,
    and growing data (new rows of an old key stay on that key's side;
    the right choice when leakage matters, e.g. all of a user's rows
    must land together).  Without: ``randomSplit`` (partitioning-
    dependent, documented hazard).
    """
    if key_col is None:
        train, test = df.randomSplit([1 - test_fraction, test_fraction], seed=seed)
        return train, test
    # xxhash64 -> uniform bucket in [0, 1); seed keeps splits refreshable
    bucket = (F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(1_000_000))) / 1_000_000.0
    test = df.filter(bucket < test_fraction)
    train = df.filter(bucket >= test_fraction)
    return train, test


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, key_col: str = "shuffle_key"
) -> DataFrame:
    """Deterministic per-epoch global reshuffle for training loops.

    Each epoch needs a DIFFERENT but REPRODUCIBLE permutation of the
    corpus; materializing explicit permutation tables at 100 TB is a
    non-starter.  Instead the permutation is implicit: sort by
    ``md5(epoch ':' id)`` -- a keyed hash that reorders completely
    between epochs yet is a pure function of (epoch, id), so any
    worker, retry, or resumed run sees the identical order.

    The sort is Spark's scalable global sort (range-partition exchange
    on the key + partition-local sort -- no single-reducer stage), and
    downstream per-partition consumers inherit contiguous, disjoint,
    reproducible slices of the permutation.  md5 rather than xxhash64
    keeps the key portable across engines (exact cross-checkable).
    """
    key = F.md5(F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string")))
    return df.withColumn(key_col, key).orderBy(key_col)


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict,
    total_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Resample a multi-domain corpus toward target mixture WEIGHTS --
    the pretraining-mix primitive ("books 30%, web 60%, code 10%").

    Converts weights to per-domain keep-fractions against the observed
    domain counts: the binding domain is the one whose share must grow
    the most relative to its supply; it is kept in full (fraction 1.0
    -- upsampling/replication is out of scope) and every other domain
    is downsampled so realized proportions match ``target_weights``.
    ``total_rows`` caps the output by scaling all fractions down
    further.  The count pass is one map-side-combined aggregate over
    the domain column; the sample itself is ``sampleBy`` (per-row
    Bernoulli, no shuffle, no sort -- scales to any corpus).

    Sampling is per-row Bernoulli, so realized counts fluctuate
    ~sqrt(n) around the target -- exact at corpus scale, noisy under a
    few thousand rows.
    """
    weights = {k: float(w) for k, w in target_weights.items()}
    norm = sum(weights.values())
    if norm <= 0:
        raise ValueError("target_weights must sum to a positive value")
    weights = {k: w / norm for k, w in weights.items()}
    counts = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[domain_col] in weights
    }
    missing = [d for d in weights if d not in counts]
    if missing:
        raise ValueError(f"domains absent from corpus: {missing}")
    # scale chosen so the tightest domain is kept in full
    scale = min(counts[d] / weights[d] for d in weights if weights[d] > 0)
    if total_rows is not None:
        scale = min(scale, float(total_rows))
    fractions = {
        d: min(1.0, (weights[d] * scale) / counts[d]) for d in weights
    }
    return df.sampleBy(domain_col, fractions, seed)


def deterministic_group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen by a keyed
    hash order -- the exact-count companion to the Bernoulli samplers
    (whose realized counts fluctuate ~sqrt(n)).

    The selection key is ``md5(seed:id)``: a pure function of the row's
    identity, so the sample is reproducible across partitionings,
    cluster sizes, and engines (no rand(), whose draws depend on row
    order within partitions), and changing ``seed`` draws an
    independent sample.  Within a group the k smallest hashes win --
    i.e. a uniform k-subset under the random-oracle view of md5.

    Scale shape: one hash-partition window per group (the same shuffle
    any per-group top-k pays); rows beyond rank k are dropped
    map-side... strictly: filtered right after the window rank, so
    only the rank column is ever added.  Groups far larger than k
    suffer no buffering beyond the window sort.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# -- weighted sampling (Efraimidis-Spirakis exponential keys) --------------

_LCG_M = 2147483647  # 2^31 - 1 (Lehmer/Park-Miller modulus)
_LCG_A = 48271
_LCG_C = 12820163


def _portable_uniform(id_col, seed: int):
    """Deterministic uniform in (0, 1] from an integer id: two Lehmer
    LCG rounds in exact BIGINT arithmetic (every term < 2^63, so ANSI
    mode never overflows).  The SAME formula runs verbatim in any SQL
    engine -- that portability is the point; Spark's per-partition RNG
    streams would make the sample partitioning-dependent and
    un-oracle-able.  ``pmod`` (not ``%``) folds the id into [0, M):
    Spark's ``%`` keeps the dividend's sign, so a negative id would
    yield u <= 0, NULL ``log(u)``, and a NULL sample key that sorts
    NULLS FIRST -- deterministically winning the sample regardless of
    weight.  The SQL twin is ``((id % M) + M) % M``."""
    h1 = (F.lit(_LCG_A) * F.pmod(id_col, F.lit(_LCG_M)) + F.lit(int(seed) % _LCG_M)) % _LCG_M
    h2 = (F.lit(_LCG_A) * h1 + F.lit(_LCG_C)) % _LCG_M
    return (h2.cast("double") + 1.0) / float(_LCG_M + 1)


def sql_portable_uniform(key_sql: str, seed: int) -> str:
    """The ANSI-SQL twin of :func:`_portable_uniform`, kept NEXT TO the
    Python so the two cannot drift: paste into any oracle that replays
    a hash-threshold sample.  ``key_sql`` must be a BIGINT expression;
    the sign-fold is the documented ``((k % M) + M) % M`` expansion of
    pmod."""
    m, a, c = _LCG_M, _LCG_A, _LCG_C
    s = int(seed) % m
    # explicit BIGINT on the key: engines that type small literals or
    # narrow columns as INT32 would otherwise overflow in the +M fold
    k = f"CAST(({key_sql}) AS BIGINT)"
    h1 = f"(({a} * (({k} % {m} + {m}) % {m}) + {s}) % {m})"
    h2 = f"(({a} * {h1} + {c}) % {m})"
    return f"((CAST({h2} AS DOUBLE) + 1.0) / {float(m + 1)!r})"


def hash_threshold_sample(
    df: DataFrame, fraction: float, key: Column, seed: int = 42
) -> DataFrame:
    """Reproducible Bernoulli sample: keep a row iff its portable
    keyed uniform is <= ``fraction``.

    The deterministic twin of ``df.sample()`` (SURVEY.md R1): Spark's
    Bernoulli sampler draws from per-partition RNG streams, so the
    exact row set depends on the partitioning -- correct statistically,
    but unreproducible across cluster sizes and un-replayable by any
    oracle.  Here the draw is :func:`_portable_uniform` on an integer
    row key: a pure function of (key, seed), identical on any
    partitioning, any engine (the LCG is exact BIGINT arithmetic, the
    final division is by 2^31 -- exact in ieee754 doubles), and
    replayable verbatim in SQL.  Keep probability is exactly
    ``floor(fraction * 2^31) / 2^31`` -- within 5e-10 of ``fraction``.

    Pure map: no shuffle, no state; scales to any corpus.  ``key``
    must be an integral column unique per row (composite keys: pack,
    e.g. ``l_orderkey * 8 + l_linenumber``) -- reusing a key across
    rows correlates their draws (sometimes wanted: all of a user's
    rows sample together, the train_test_split leakage contract)."""
    return df.filter(_portable_uniform(key.cast("long"), seed) <= F.lit(float(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key: Column,
    seed: int = 42,
) -> DataFrame:
    """Reproducible per-stratum Bernoulli: the deterministic twin of
    ``sampleBy`` (same fractions contract: strata absent from the dict
    drop entirely), built on the :func:`hash_threshold_sample` keyed
    uniform so the exact row set is partitioning-independent and
    SQL-replayable.  The per-stratum threshold is a literal CASE over
    ``strata_col`` -- still a pure map, no shuffle."""
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    frac = None
    for v, p in fractions.items():
        frac = (
            F.when(F.col(strata_col) == F.lit(v), F.lit(float(p)))
            if frac is None
            else frac.when(F.col(strata_col) == F.lit(v), F.lit(float(p)))
        )
    frac = frac.otherwise(F.lit(-1.0))  # unlisted strata never pass
    return df.filter(_portable_uniform(key.cast("long"), seed) <= frac)


def mixture_hash_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict,
    key: Column,
    seed: int = 42,
) -> DataFrame:
    """Reproducible mixture resampling: the deterministic twin of
    :func:`mixture_sample`.  Same semantics -- target weights against
    observed domain supply, binding domain kept in full, others
    downsampled -- but BOTH differences that make the stock form
    unreplayable are removed:

    - the per-domain keep fractions are computed IN THE PLAN (counts
      aggregate -> broadcast weight table -> one-row min scale ->
      per-domain ``round(frac, 6)``), not collected to the driver, so
      there is no control-plane job and the whole computation replays
      as SQL CTEs;
    - selection is the keyed-hash threshold, not per-partition RNG.

    The 6-dp rounding of the fraction mirrors temperature_mixture's
    budget rounding: the division chain is identical IEEE work in both
    engines, and the rounding keeps a ULP wobble from ever flipping a
    row's keep decision.  Scale shape: one map-side-combined counts
    aggregate (|domains| rows), everything else broadcast; the sample
    itself is a pure map."""
    weights = {k: float(w) for k, w in target_weights.items()}
    norm = sum(weights.values())
    if norm <= 0:
        raise ValueError("target_weights must sum to a positive value")
    weights = {k: w / norm for k, w in weights.items()}
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()), f"{domain_col} string, __w double"
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    joined = counts.join(F.broadcast(wdf), domain_col)
    scale = joined.filter(F.col("__w") > 0).agg(
        F.min(F.col("__n").cast("double") / F.col("__w")).alias("__scale")
    )
    fracs = (
        joined.join(F.broadcast(scale))
        .select(
            domain_col,
            F.round(
                F.least(F.lit(1.0), F.col("__w") * F.col("__scale") / F.col("__n")), 6
            ).alias("__frac"),
        )
    )
    return (
        df.join(F.broadcast(fracs), domain_col)
        .filter(_portable_uniform(key.cast("long"), seed) <= F.col("__frac"))
        .drop("__frac")
    )


def weighted_sample_k(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of (up to) ``k`` rows
    per group: Efraimidis-Spirakis A-ES -- each row draws exponential
    key ``-ln(u) / w`` and the k smallest keys win, which makes
    P(selected) proportional to weight without ever materializing
    cumulative weight tables.  One window per group, no self-joins,
    deterministic for a given seed on ANY partitioning (portable LCG
    uniform, not Spark RNG).  Non-positive / NULL weights are excluded
    (they carry no sampling mass).  Adds ``sample_key`` for
    auditability."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = _portable_uniform(F.col(id_col).cast("long"), seed)
    keyed = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_key", -F.log(u) / F.col(weight_col).cast("double"))
    )
    w = Window.partitionBy(*group_cols).orderBy("sample_key", id_col)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budget_tokens: float,
    temperature: float = 2.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled corpus mixing under a TOKEN budget -- the
    pretraining data-recipe primitive (T5 / multilingual-LM style):
    per-domain token shares are flattened by ``share^(1/T)`` (T > 1
    upweights tail domains, T = 1 keeps natural proportions), the
    normalized weights split ``budget_tokens`` into per-domain budgets,
    and each domain greedily fills its budget in a DETERMINISTIC
    seeded pseudo-random document order (md5(seed:id) -- the portable
    "shuffle" any engine replays, same device as weighted_sample_k's
    A-ES keys).  The last selected document may overshoot its domain
    budget by at most one document (greedy prefix, documented).

    Returns the selected manifest (domain, id, tokens) -- feed it to a
    join to materialize the mixed corpus.

    Scale shape: one map-side-combined aggregate for domain token
    totals (|domains| rows, broadcast back); selection is a per-domain
    running-sum window in the seeded order -- the one domain-keyed
    sort, the same skew posture as any per-domain window (salting does
    not apply: the running sum is inherently sequential per domain;
    a single mega-domain sorts in one task and should be pre-split
    upstream if that bites).  Per-domain budgets round to 6 dp before
    the cumulative comparison so the pow() ULP wobble between engines
    cannot flip a boundary document.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    from pyspark.sql import Window as W

    dom = F.col(domain_col)
    toks = F.col(token_col).cast("long")

    totals = df.groupBy(domain_col).agg(F.sum(toks).alias("__dom_toks"))
    grand = totals.agg(F.sum("__dom_toks").alias("__tot"))
    weighted = (
        totals.join(F.broadcast(grand))
        .withColumn(
            "__w_raw",
            F.pow(F.col("__dom_toks").cast("double") / F.col("__tot"),
                  F.lit(1.0 / temperature)),
        )
    )
    wsum = weighted.agg(F.sum("__w_raw").alias("__wsum"))
    budgets = (
        weighted.join(F.broadcast(wsum))
        .select(
            domain_col,
            F.round(
                F.col("__w_raw") / F.col("__wsum") * F.lit(float(budget_tokens)), 6
            ).alias("__budget"),
        )
    )

    order_key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = W.partitionBy(domain_col).orderBy(order_key, F.col(id_col)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = df.select(dom.alias(domain_col), F.col(id_col), toks.alias("tokens"))
    ranked = ranked.withColumn("__cum_prev", F.sum("tokens").over(w) - F.col("tokens"))
    return (
        ranked.join(F.broadcast(budgets), domain_col)
        .filter(F.col("__cum_prev") < F.col("__budget"))
        .select(domain_col, id_col, "tokens")
    )
