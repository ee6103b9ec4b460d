"""Deterministic, partitioning-independent distributed k-means.

MLlib's KMeans (ml/clustering.py, reference parity M3-M4) is seeded but
NOT reproducible across partitionings: k-means|| init draws from
per-partition RNG streams, and the double-precision centroid sums
depend on task completion order (float addition is not associative).
That makes every MLlib-clustering query rows-only under the driver's
oracle contract -- correct, but unverifiable bit-for-bit.

This variant is reproducible BY CONSTRUCTION, which is what a training
pipeline that must re-run identically (audits, incremental refreshes,
cross-cluster reproduction) actually needs:

- init: the k rows with the smallest ``md5(seed ':' id)`` -- a uniform
  random k-subset under the random-oracle view of md5, a pure function
  of row identity (the deterministic_group_sample convention,
  operators/sampling.py:120).
- assignment: squared-euclidean to each centroid via sequential
  JVM-side fold (``F.aggregate``); ties break on the smaller cluster
  index.  Centroids ride as literals -- no shuffle, no Python.
- update: per-(cluster, dim) sums in DECIMAL(38,15) -- exact integer
  arithmetic, so the sum is identical under ANY partitioning or task
  order -- collected as a k x dim control plane (bounded: raises above
  ``max_control_rows``), and the new centroid doubles are computed on
  the driver as ``float(decimal_sum) / count``.
- iteration count is FIXED (``n_iter``), not convergence-thresholded,
  so runs cannot diverge by one iteration on float noise.

Scale shape: each iteration is one scan + one map-side-combined
groupBy of k*dim cells; everything heavy stays in whole-stage codegen.
The oracle replication (tools/gen_kmeans_expected.py) re-runs the same
algorithm in pure Python/Decimal and matches assignments and centroids
bit-for-bit.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal cast applied to every coordinate before summing: 15 frac
#: digits (floats in the fixture range [-100, 100] keep full intent),
#: 23 integer digits of headroom -- sums of ~1e20 rows fit
_DEC = "decimal(38,15)"


def _init_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int, seed: int
) -> list[list[float]]:
    """k seed rows by smallest md5(seed:id); cluster i = i-th smallest."""
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))).alias(
                "__h"
            ),
        )
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the number of rows ({len(rows)})")
    return [list(r.v) for r in rows]


def _assign_expr(vec_col: str, centroids: list[list[float]]):
    """Column: index of the nearest centroid (squared euclidean,
    sequential fold per centroid; ties -> smaller index via struct
    ordering)."""
    dists = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(F.struct(d2.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*dists))["i"]


def deterministic_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 5,
    seed: int = 42,
    max_control_rows: int = 100_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignments, centroids): assignments = (id, cluster int)
    for every input row, centroids = the final k x dim doubles.

    ``max_control_rows`` bounds the per-iteration driver collect
    (k * dim rows) the same way pq_search bounds its LUT
    (operators/similarity.py): raise loudly instead of OOMing the
    driver when someone passes a huge k * dim."""
    from pyspark import StorageLevel

    dim_row = df.select(F.size(vec_col).alias("d")).head()
    if dim_row is None:
        raise ValueError("empty input")
    dim = dim_row["d"]
    if k * dim > max_control_rows:
        raise ValueError(
            f"k*dim = {k * dim} exceeds max_control_rows={max_control_rows}: "
            "the per-iteration centroid control plane would not be "
            "driver-bounded; reduce k or raise the cap explicitly"
        )

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        centroids = _init_centroids(base, "id", "v", k, seed)
        for _ in range(n_iter):
            assigned = base.withColumn("__c", _assign_expr("v", centroids))
            sums = (
                assigned.select(
                    "__c", F.posexplode(F.transform("v", lambda x: x.cast("double")))
                )
                .groupBy("__c", "pos")
                .agg(
                    F.sum(F.col("col").cast(_DEC)).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new = [list(c) for c in centroids]  # empty clusters keep position
            per_cluster: dict[int, list] = {}
            for r in sums:
                per_cluster.setdefault(r["__c"], []).append(r)
            for ci, rows in per_cluster.items():
                for r in rows:
                    # float(exact decimal sum) / count: one well-defined
                    # rounding, replicated verbatim by the oracle generator
                    new[ci][r["pos"]] = float(Decimal(r["s"])) / r["n"]
            centroids = new
        out = base.withColumn("cluster", _assign_expr("v", centroids)).select(
            F.col("id").alias(id_col), "cluster"
        )
        out = out.localCheckpoint(eager=True)  # release the persist safely
        return out, centroids
    finally:
        base.unpersist()


# -- deterministic logistic regression --------------------------------------


def _algebraic_sigmoid(m):
    """sigma_hat(m) = 0.5 * (1 + (m/2) / (1 + |m/2|)): a rational
    sigmoid surrogate built ONLY from IEEE +,*,/,abs -- bit-identical
    on every engine, unlike exp(), whose last ULP differs between
    Java's Math.exp and libm and would break bit-exact replication.
    Monotone, symmetric, range (0, 1), sigma_hat(0) = 0.5."""
    h = m * F.lit(0.5)
    return F.lit(0.5) * (F.lit(1.0) + h / (F.lit(1.0) + F.abs(h)))


def _margin_expr(vec_col: str, weights: list[float], intercept: float):
    """b + <w, x> as a sequential JVM-side fold (left-to-right over
    array order, the replication-exact accumulation)."""
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), w_lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot + F.lit(float(intercept))


def deterministic_logreg(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    y_col: str,
    n_iter: int = 5,
    lr: float = 0.5,
    max_control_rows: int = 100_000,
) -> tuple[DataFrame, list[float], float]:
    """Full-batch gradient-descent logistic regression that is
    partitioning-independent and bit-exactly replicable -- the
    trainable quality-classifier stage of a data pipeline, made
    verifiable the same way ``deterministic_kmeans`` makes clustering
    verifiable:

    - fixed iteration count, weights start at exact zero;
    - the per-row probability uses the algebraic (rational) sigmoid,
      IEEE-exact on any engine;
    - gradient sums accumulate in DECIMAL(38,15) (order-independent),
      one (dim+1)-row control plane per iteration (bounded by
      ``max_control_rows``), and the driver applies
      ``w -= lr * float(decimal_sum) / n`` -- one well-defined
      rounding per coordinate per iteration.

    ``y_col`` must be a 0/1 integer column.  Returns
    (scores, weights, intercept): scores = (id, y, score, pred) with
    ``score`` = sigma_hat(margin) rounded to 6 dp and ``pred`` =
    (rounded score >= 0.5) as int -- thresholding on the ROUNDED value
    so the cut is cross-engine reproducible.

    Scale shape: each iteration is one scan + one map-side-combined
    (dim+1)-cell aggregate; nothing per-row ever reaches the driver.
    """
    from pyspark import StorageLevel

    dim_row = df.select(F.size(vec_col).alias("d")).head()
    if dim_row is None:
        raise ValueError("empty input")
    dim = dim_row["d"]
    if dim + 1 > max_control_rows:
        raise ValueError(
            f"dim+1 = {dim + 1} exceeds max_control_rows={max_control_rows}: "
            "the per-iteration gradient control plane would not be "
            "driver-bounded; reduce the vector width or raise the cap"
        )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.col(y_col).cast("double").alias("y"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = base.count()
        if n == 0:
            raise ValueError("empty input")
        weights = [0.0] * dim
        intercept = 0.0
        for _ in range(n_iter):
            err = _algebraic_sigmoid(_margin_expr("v", weights, intercept)) - F.col("y")
            # hoist err to a concrete column BEFORE the transform lambda:
            # referencing the un-materialized expression inside the lambda
            # would re-evaluate the O(dim) margin per element (O(dim^2)/row)
            with_err = base.withColumn("__err", err)
            terms = F.concat(
                F.array(F.col("__err")),
                F.transform("v", lambda x: F.col("__err") * x.cast("double")),
            )
            sums = (
                with_err.select(F.posexplode(terms))
                .groupBy("pos")
                .agg(F.sum(F.col("col").cast(_DEC)).alias("s"))
                .collect()
            )
            grad = {r["pos"]: float(Decimal(r["s"])) / n for r in sums}
            intercept -= lr * grad[0]
            weights = [w - lr * grad[p + 1] for p, w in enumerate(weights)]
        score = F.round(
            _algebraic_sigmoid(_margin_expr("v", weights, intercept)), 6
        )
        out = base.select(
            F.col("id").alias(id_col),
            F.col("y").cast("int").alias("y"),
            score.alias("score"),
            (score >= F.lit(0.5)).cast("int").alias("pred"),
        )
        out = out.localCheckpoint(eager=True)  # release the persist safely
        return out, weights, intercept
    finally:
        base.unpersist()


# -- deterministic product quantization --------------------------------------


def deterministic_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    ks: int = 16,
    n_iter: int = 5,
    seed: int = 42,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product-quantization training whose codebooks AND codes are
    bit-exactly replicable -- the deterministic twin of the numpy PQ
    build (operators/similarity.py pq_build_index, whose SIMD
    float-sum order makes it rows-only by contract).

    Vectors are L2-normalized (the PQ-for-cosine convention the numpy
    path uses), split into ``m`` equal sub-spaces, and each sub-space
    is clustered with ``deterministic_kmeans`` (DECIMAL(38,15) centroid
    sums, md5 init, fixed iterations) under seed ``seed + j`` -- so the
    code of a vector in sub-space j is simply its deterministic cluster
    assignment there, and the whole build replays in pure Python
    (tools/gen_pq_expected.py).

    Returns ``(codes, codebooks)``:

    - ``codes``: long-form DataFrame ``(id_col, sub int, cid int)``,
      one row per (vector, sub-space) -- the exploded shape the ADC
      scan joins against directly;
    - ``codebooks``: ``m x ks x (dim/m)`` Python doubles.

    Scale shape: the build is a scheduled one-off (m * n_iter bounded
    scans, each a map-side-combined ks*dsub-cell aggregate); encoding
    IS the final assignment pass of each sub-space k-means, so no
    separate encode job exists to get out of sync with the codebooks.
    """
    dim_row = df.select(F.size(vec_col).alias("d")).head()
    if dim_row is None:
        raise ValueError("empty input")
    dim = dim_row["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    # normalize ONCE as a column (norm hoisted out of the transform
    # lambda -- referencing the un-materialized aggregate inside it
    # would re-run the O(d) fold per element), mirrored verbatim by
    # the pure-Python generator
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"), norm.alias("__n"))
    normed = base.select(
        "id", F.transform(F.col("__v"), lambda x: x.cast("double") / F.col("__n")).alias("nv")
    )

    codes_parts = []
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub = normed.select("id", F.slice("nv", j * dsub + 1, dsub).alias("sv"))
        asg, cents = deterministic_kmeans(
            sub, "id", "sv", k=ks, n_iter=n_iter, seed=seed + j
        )
        codes_parts.append(
            asg.select(
                F.col("id").alias(id_col),
                F.lit(j).alias("sub"),
                F.col("cluster").alias("cid"),
            )
        )
        codebooks.append(cents)

    codes = codes_parts[0]
    for part in codes_parts[1:]:
        codes = codes.unionByName(part)
    return codes, codebooks
