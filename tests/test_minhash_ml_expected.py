"""Pins the pure-Python MinHashLSH replication (tools/pymurmur3.py +
tools/gen_minhash_ml_expected.py) against live pyspark.ml models, so a
Spark upgrade that changes HashingTF's hash version or the LSH
coefficient draw fails loudly before the oracle tables go stale."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from javarandom import JavaRandom  # noqa: E402
from pymurmur3 import murmur3_x86_32, non_negative_mod  # noqa: E402

HASH_PRIME = 2038074743


def test_hashingtf_indices_match_spark(spark):
    from pyspark.ml.feature import HashingTF

    terms = ["hello world", "a", "ab", "abc", "abcd", "café latte", "1234", "x y z"]
    df = spark.createDataFrame([(terms,)], ["terms"])
    tf = HashingTF(inputCol="terms", outputCol="features", numFeatures=1 << 18, binary=True)
    row = tf.transform(df).collect()[0]
    got = sorted(int(i) for i in row.features.indices)
    want = sorted(
        {non_negative_mod(murmur3_x86_32(t.encode("utf-8"), 42), 1 << 18) for t in terms}
    )
    assert got == want


def test_minhash_lsh_hashes_match_spark(spark):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    df = spark.createDataFrame([(["p", "q", "r", "s"],), (["p", "q", "zz"],)], ["terms"])
    tf = HashingTF(inputCol="terms", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(df)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    rows = model.transform(feats).collect()

    rng = JavaRandom(42)
    coefs = [
        (1 + rng.next_int(HASH_PRIME - 1), rng.next_int(HASH_PRIME - 1)) for _ in range(8)
    ]
    for row in rows:
        idx = [int(i) for i in row.features.indices]
        want = [float(min(((1 + i) * a + b) % HASH_PRIME for i in idx)) for a, b in coefs]
        got = [h[0] for h in row.hashes]
        assert got == want
