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
