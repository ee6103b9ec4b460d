"""SemDeDup-style semantic deduplication: cluster the embedding space,
then search for near-duplicate pairs ONLY within clusters (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" -- cluster-then-prune is the published recipe
for making embedding dedup sub-quadratic).

Composition over invention, per the brief: clustering comes from
``ml.deterministic.deterministic_kmeans`` (partitioning-independent,
bit-exact oracle), so the whole SemDeDup pipeline -- assignments,
within-cluster cosines, survivor set -- is value-verifiable, which the
published (GPU/faiss) implementations are not.

Scale shape: the pair search is an equi-join on ``cluster`` -- pair
expansion is quadratic PER CLUSTER, never global.  With k clusters of
~N/k rows the candidate volume is N^2/k; pick k ~ sqrt(N) (SemDeDup
uses 50k clusters at web scale) and it's N^1.5 spread over one
shuffle.  ``max_cluster_size`` caps the damage when clustering
collapses (the minhash ``max_bucket_size`` convention: skip + monitor,
never OOM); ``semantic_cluster_stats`` is the monitoring companion.

Approximation note (inherent to SemDeDup, not this implementation):
pairs split across cluster boundaries are missed; recall vs exact
all-pairs is what the planted-pair test pins.

Quantizer-size note: ``deterministic_kmeans`` rides its centroids as
plan literals, which is exact and shuffle-free but caps practical k at
a few hundred (k*dim literals in one projection).  At the 50k-cell
scale SemDeDup uses on web corpora, swap the assignment step for a
broadcast centroid JOIN (the ``ivf_topk`` probe shape) -- the rest of
this module is agnostic to where ``assignments`` came from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the sequential-fold dot/norm expressions are shared with the ANN
# module -- a single definition keeps cross-module bit-exactness
from .similarity import dot as _dot
from .similarity import l2_norm as _l2_norm


def spark_round6(x: float) -> float:
    """Spark ``F.round(col, 6)`` on a double, replicated exactly:
    HALF_UP at 6 dp on the SHORTEST decimal repr
    (``BigDecimal.valueOf`` == Python ``repr``)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def spark_round6_vec(vals):
    """Vectorized :func:`spark_round6` over a float64 array (r6: the
    per-element Decimal generator made GEMM pair scoring PYTHON-RATE in
    the candidate count -- 31 s at sf1's ~10M candidates vs ~6 s before
    the r5 blocking change introduced it).

    Bit-equality argument, valid for |x| <~ 1e3 (cosines are <= 1):
    the scaled ``y = x*1e6`` carries < ~1e-7 absolute float error and
    ``repr(x)`` differs from x by < half an ulp (~1e-10 scaled), so
    whenever y sits farther than 1e-6 from a half-integer both rounding
    rules pick the SAME nearest 6-dp decimal d -- and ``rint(y)/1e6``
    (an exact integer divided by an exact power of ten, correctly
    rounded by IEEE division) is bit-identical to ``float(d)``.  Only
    the boundary sliver ``|frac(|y|) - 0.5| < 1e-6`` (~2e-6 of uniform
    inputs) takes the exact per-element Decimal path, where the
    HALF_UP-vs-half-even and shortest-repr effects actually live.
    Property-tested against the scalar on uniform, boundary-adjacent,
    and exact-tie inputs."""
    import numpy as np

    vals = np.asarray(vals, dtype=np.float64)
    y = vals * 1e6
    r = np.rint(y) / 1e6
    near = np.abs((np.abs(y) % 1.0) - 0.5) < 1e-6
    if near.any():
        r[near] = np.fromiter(
            (spark_round6(x) for x in vals[near]),
            dtype=np.float64,
            count=int(near.sum()),
        )
    return r


def _members(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
) -> DataFrame:
    """(id, v, cluster) for every assigned row -- no cap, no filters."""
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(
        assignments.select(
            F.col(id_col).alias("id"), F.col(cluster_col).alias("cluster")
        ),
        "id",
    )


def _pair_search_input(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    max_cluster_size: int | None,
) -> DataFrame:
    """(id, v, cluster) restricted to the rows the PAIR SEARCH may
    touch: over-cap clusters are dropped (skip + monitor -- their rows
    stay in the survivor set unexamined), and zero-norm vectors are
    excluded because cosine is undefined for them (both backends and
    the SQL oracle apply the identical rule, so no NaN-comparison
    semantics can diverge)."""
    joined = _members(emb, assignments, id_col, vec_col, cluster_col)
    if max_cluster_size is not None:
        sizes = joined.groupBy("cluster").agg(F.count(F.lit(1)).alias("__n"))
        joined = joined.join(
            F.broadcast(sizes.filter(F.col("__n") <= max_cluster_size)), "cluster"
        ).drop("__n")
    return joined.filter(_l2_norm(F.col("v")) > 0)


def semantic_dedup_pairs(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    min_cosine: float = 0.95,
    max_cluster_size: int | None = 10_000,
    backend: str = "gemm",
    gemm_block_rows: int = 1024,
) -> DataFrame:
    """(id_a, id_b, cluster, cosine) for within-cluster pairs with
    cosine >= ``min_cosine`` (id_a < id_b; cosine rounded to 6 dp
    BEFORE the threshold so float last-bits cannot flip membership
    across engines).  Over-cap clusters and zero-norm vectors are
    excluded from the search (see :func:`_pair_search_input`).

    ``assignments`` is (id_col, cluster_col) -- typically the output of
    ``ml.deterministic.deterministic_kmeans``.

    ``backend='gemm'`` (default) scores each cluster with BLOCKED numpy
    matrix products inside ``applyInPandas`` -- the vectorized Arrow
    path; per-pair higher-order-function folds are interpreted, and at
    ~250-row clusters the GEMM is ~4x faster end-to-end (measured at
    sf0.1).  The GEMM is chunked into ``gemm_block_rows``-row blocks so
    the full NxN cosine matrix is NEVER materialized: with N rows of
    dim d, peak per-task memory is ~ N*d*8 (the stacked vectors) +
    B*N*9 bytes for the block scores + mask (B=1024 default; ~90 MB of
    block state at the default N=10_000 cap) + the post-threshold
    candidates, which are output-bound.  ``backend='native'`` keeps the pure-Catalyst
    expression pipeline (the semantics twin; parity-tested).  The gemm
    path replays Spark's exact HALF_UP-on-shortest-repr rounding on
    the boundary candidates (np.round is half-to-even and WOULD
    diverge on values like 0.4000005), so both backends agree with the
    oracle bit-for-bit except on sub-1e-12 dot-order knife edges that
    6-dp rounding absorbs.

    Pair orientation (id_a < id_b): string ids are ordered by their
    UTF-8 bytes -- exactly Spark's default UTF8_BINARY comparison used
    by the native backend and the SQL oracle -- so non-ASCII ids cannot
    produce swapped pairs across backends.
    """
    left = _pair_search_input(
        emb, assignments, id_col, vec_col, cluster_col, max_cluster_size
    )
    if backend == "gemm":
        import numpy as np
        import pandas as pd

        id_type = emb.schema[id_col].dataType.simpleString()
        cl_type = assignments.schema[cluster_col].dataType.simpleString()
        out_schema = (
            f"id_a {id_type}, id_b {id_type}, cluster {cl_type}, cosine double"
        )
        _round6_vec = spark_round6_vec  # closure-captured for the UDF

        BLOCK = int(gemm_block_rows)  # rows per GEMM block; memory formula above

        def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"].values]
            )
            ids = pdf["id"].to_numpy()
            if len(ids) and isinstance(ids[0], str):
                # UTF-8 byte order == Spark UTF8_BINARY string comparison
                # (np.argsort on object strings uses Python code-point
                # order, which agrees for valid UTF-8 but byte-sorting
                # is the definitionally identical rule)
                order = np.asarray(
                    sorted(range(len(ids)), key=lambda i: ids[i].encode("utf-8"))
                )
            else:
                order = np.argsort(ids)
            ids, V = ids[order], V[order]
            n = np.sqrt((V * V).sum(axis=1))
            N = len(ids)
            cols = np.arange(N)[None, :]
            out_a, out_b, out_c = [], [], []
            for s in range(0, N, BLOCK):
                e = min(s + BLOCK, N)
                # (e-s, N) block of cosines -- never the full NxN
                blk = (V[s:e] @ V.T) / np.outer(n[s:e], n)
                # upper triangle (j > global row) + slack prefilter one
                # quantum below the cut, then exact Spark-rounding on
                # the candidates only
                mask = (cols > np.arange(s, e)[:, None]) & (
                    blk >= (min_cosine - 1e-6)
                )
                bi, bj = np.nonzero(mask)
                rounded = _round6_vec(blk[bi, bj])
                keep = rounded >= min_cosine
                out_a.append(ids[bi[keep] + s])
                out_b.append(ids[bj[keep]])
                out_c.append(rounded[keep])
            empty = np.array([], dtype=ids.dtype)
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else empty,
                    "id_b": np.concatenate(out_b) if out_b else empty,
                    "cluster": pdf["cluster"].iloc[0],
                    "cosine": np.concatenate(out_c)
                    if out_c
                    else np.array([], dtype=np.float64),
                }
            )

        return left.groupBy("cluster").applyInPandas(_pairs, out_schema)

    # norm hoisted only on the native path (the gemm path computes its
    # own in numpy): one multiply, not a fold, per pair side
    withn = left.withColumn("norm", _l2_norm(F.col("v")))
    a = withn.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    b = withn.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    cosine = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cluster", cosine.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(min_cosine))
    )


def semantic_dedup_survivors(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    min_cosine: float = 0.95,
    max_cluster_size: int | None = 10_000,
    backend: str = "gemm",
) -> DataFrame:
    """Keep-min SemDeDup: drop every row that has a within-cluster
    neighbor with a SMALLER id at cosine >= ``min_cosine``; survivors
    are (id, cluster).  On a chain a~b~c (a !~ c) both b and c drop --
    the deterministic one-survivor-per-duplicate-neighborhood rule.

    The survivor base is EVERY assigned row -- rows of over-cap
    (skipped) clusters and zero-norm rows are kept UNEXAMINED, never
    silently deleted; only the pair search is capped (skip + monitor).
    Implemented as an anti-join against the pair list's ``id_b`` side
    (one extra shuffle over the pair set, which is tiny
    post-threshold).
    """
    pairs = semantic_dedup_pairs(
        emb,
        assignments,
        id_col,
        vec_col,
        cluster_col,
        min_cosine,
        max_cluster_size,
        backend,
    )
    members = _members(emb, assignments, id_col, vec_col, cluster_col).select(
        "id", "cluster"
    )
    dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    return members.join(dropped, "id", "left_anti").select(
        F.col("id").alias(id_col), F.col("cluster").alias(cluster_col)
    )


def semantic_cluster_stats(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    max_cluster_size: int | None = 10_000,
) -> DataFrame:
    """Monitoring companion (the ``minhash_banded_bucket_stats``
    convention): one row of cluster-population stats --
    (n_clusters, n_skipped_clusters, n_skipped_rows, max_cluster,
    candidate_pairs).  ``candidate_pairs`` = sum over kept clusters of
    n*(n-1)/2, the pair-join volume about to be paid; alert on it
    before running the expensive step."""
    cap = max_cluster_size if max_cluster_size is not None else (1 << 62)
    sizes = (
        emb.select(F.col(id_col).alias("id"))
        .join(
            assignments.select(
                F.col(id_col).alias("id"), F.col(cluster_col).alias("cluster")
            ),
            "id",
        )
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("n_skipped_clusters"),
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias("n_skipped_rows"),
        F.max("n").alias("max_cluster"),
        F.sum(
            F.when(F.col("n") <= cap, F.col("n") * (F.col("n") - 1) / 2).otherwise(0)
        )
        .cast("long")
        .alias("candidate_pairs"),
    )


def train_sampled_quantizer(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 20_000,
    seed: int = 42,
    n_iter: int = 10,
) -> list[list[float]]:
    """Train the LARGE-k coarse quantizer (k ~ sqrt(N), SemDeDup's 50k
    cells at web scale) the way FAISS trains one: k-means in numpy on a
    BOUNDED driver sample, because the quantizer is a k x dim codebook
    whose quality only needs a representative sample, never the corpus
    (the ``_train_pq_codebooks`` division of labor,
    operators/similarity.py:288).  The returned centroid list feeds
    :func:`assign_by_broadcast_centroids`, which assigns the FULL
    corpus distributedly.

    Deterministic given (data, seed): the sample is the ``sample_rows``
    smallest ``md5(seed ':' id)`` rows (a uniform random subset under
    the random-oracle view of md5 -- the deterministic_kmeans init
    convention, ml/deterministic.py:49), init is the first k of that
    order, iteration count is fixed, and argmin ties break on the
    smaller cluster id (numpy argmin takes the first minimum).  NOT
    machine-independent, deliberately: numpy's SIMD-dispatched float
    sums may differ in last bits across CPUs, so this trainer must
    never back a committed expected table or SQL oracle -- oracle-bound
    queries assign through ``ml.deterministic.deterministic_kmeans``
    centroids instead (Decimal sums, bit-exact).  The scale path here
    is bench/scaling territory, where the pair sets are compared
    structurally, not by committed hash.

    The sample AUTO-SCALES with k: the effective sample is
    ``max(sample_rows, 40 * k)`` rows (FAISS warns below ~39 points
    per centroid; 40 keeps every cell trainable), so the registry's
    own k = sqrt(N) sizing rule never hits a ValueError cliff --
    k = 50_000 trains on a 2M-row sample (~7 GB of 450-dim doubles +
    the chunked distance block, still driver-bounded), and the default
    20k sample only governs k <= 500.  Driver memory is bounded by
    ``effective_sample x dim`` doubles plus an (n x k) distance block;
    distances use the |x|^2 - 2<x,c> + |c|^2 GEMM form, never the
    (n, k, dim) broadcast tensor.  If the corpus itself has fewer rows
    than k, that is still an error (k clusters need k points).
    """
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sample_rows = max(sample_rows, 40 * k)
    from ..session import arrow_transfer

    sample = (
        emb.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            F.md5(
                F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
            ).alias("__h"),
        )
        .orderBy("__h", "id")
        .limit(sample_rows)
    )
    # Arrow transfer (forced -- caller sessions may not enable it): the
    # sample lands as numpy arrays, not Python row objects -- the 40*k
    # auto-scaled sample stays ~8*dim bytes per row on the driver
    # instead of ~10x that in boxed floats
    with arrow_transfer(emb.sparkSession):
        pdf = sample.toPandas()
    X = np.stack(pdf["v"].to_numpy()).astype(np.float64) if len(pdf) else np.empty((0, 1))
    if len(X) < k:
        raise ValueError(
            f"k={k} exceeds the sample size ({len(X)}): the corpus has "
            f"fewer rows than k even after the 40*k sample auto-scale"
        )
    C = X[:k].copy()
    xx = (X * X).sum(axis=1)
    # distance blocks are CHUNKED to ~256 MB so the (n x k) matrix never
    # materializes whole -- at k=50k / n=2M that would be 800 GB
    chunk = max(1, (1 << 25) // max(k, 1))
    for _ in range(n_iter):
        cc = (C * C).sum(axis=1)[None, :]
        a = np.empty(len(X), dtype=np.int64)
        for s in range(0, len(X), chunk):
            e = min(s + chunk, len(X))
            d2 = xx[s:e, None] - 2.0 * (X[s:e] @ C.T) + cc
            a[s:e] = d2.argmin(axis=1)
        counts = np.bincount(a, minlength=k)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        # empty cells keep their previous centroid (deterministic_kmeans
        # convention: position is preserved, never re-seeded)
    return [[float(x) for x in c] for c in C]


def assign_by_broadcast_centroids(
    emb: DataFrame,
    centroids: list[list[float]] | DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "native",
) -> DataFrame:
    """(id_col, cluster) nearest-centroid assignment via a BROADCAST
    JOIN against a centroid table -- the large-k quantizer path the
    module docstring prescribes: ``deterministic_kmeans`` rides
    centroids as plan literals (exact, shuffle-free, but k*dim literals
    cap practical k at a few hundred), while this shape scales to the
    50k-cell quantizers SemDeDup uses on web corpora (the centroid
    table broadcasts; each row scores k cells in a 1:k expansion and
    keeps the min).

    Ties break on the smaller cluster id (the deterministic_kmeans
    convention), so for any centroid set both assignment paths agree
    row-for-row -- pinned by test.

    The min-selection is a ``min(struct(d2, cluster))`` AGGREGATE, not
    a window: struct ordering compares d2 first then cluster (the exact
    tie-break), min is associative so Spark map-side-combines the 1:k
    expansion inside each scan task and the Exchange carries ~N partial
    rows -- a row_number window here would shuffle all N*k scored rows
    (k=50k at SemDeDup web scale) before discarding k-1 of each.  A
    plan test pins partial aggregation below the Exchange and no Window.

    ``centroids`` is a list of vectors (cluster i = element i) or a
    (cluster int, cvec array<double>) DataFrame.

    ``backend`` mirrors the ``semantic_dedup_pairs`` convention:

    - ``'native'`` (default): the pure-Catalyst crossJoin + fold
      pipeline above -- d2 is the exact sequential ``sum((x-c)^2)``
      fold, bit-identical to ``deterministic_kmeans``'s literal
      expression, so this is the ORACLE/parity path.
    - ``'gemm'``: Arrow-batched numpy over ``mapInPandas`` -- each task
      scores its batch against the whole (k x dim) codebook with one
      matrix product (the FAISS assignment shape) using the
      ``|x|^2 - 2<x,c> + |c|^2`` expansion.  ~15x faster at the sf10
      shape (89M cell scores: the Catalyst fold is a CodegenFallback
      lambda per element, the GEMM a vectorized BLAS call), and the
      argmin takes the FIRST minimum = the smaller-cluster tie-break.
      Caveat: the expanded d2 differs from the fold's in last bits, so
      an argmin could flip only for centroids equidistant to the last
      ulp -- measure-zero on real embeddings (parity-tested on the
      fixture), but the reason the oracle path stays 'native'.
    """
    if backend not in ("native", "gemm"):
        raise ValueError(f"backend must be native|gemm, got {backend!r}")
    if backend == "gemm":
        import numpy as np
        import pandas as pd

        if isinstance(centroids, list):
            cmat = [[float(x) for x in v] for v in centroids]
        else:
            rows = centroids.select("cluster", "cvec").collect()
            cmat = [None] * len(rows)
            for r in rows:
                cmat[r["cluster"]] = [float(x) for x in r["cvec"]]
        C = np.asarray(cmat, dtype=np.float64)
        cc = (C * C).sum(axis=1)
        id_type = emb.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, cluster int"

        def _assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].values]
                )
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + cc[None, :]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values,
                        "cluster": d2.argmin(axis=1).astype("int32"),
                    }
                )

        return emb.select(id_col, vec_col).mapInPandas(_assign, out_schema)

    if isinstance(centroids, list):
        cent = emb.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(centroids)],
            "cluster int, cvec array<double>",
        )
    else:
        cent = centroids.select("cluster", "cvec")

    d2 = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.select(F.col(id_col), F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(cent))
        .select(id_col, "cluster", d2.alias("__d2"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct("__d2", "cluster")).alias("__m"))
        .select(id_col, F.col("__m.cluster").alias("cluster"))
    )
