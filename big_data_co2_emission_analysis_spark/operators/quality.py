"""Rule-based data-quality validation with quarantine.

The ingest-side contract check a production pipeline runs before
letting rows near training or analytics: each rule is a named boolean
Column (True = pass), evaluated in ONE codegen'd projection -- no
Python, no shuffle, no second scan.  Rows annotate themselves with the
names of the rules they fail; splitting good/quarantined is then a
plain filter.

Scale notes (100 TB): `annotate` is a pure map fused into the scan
stage.  `validate` returns two lazily-filtered views of the annotated
frame -- consume both in one job via persist()/foreachBatch, or write
the annotated frame once and filter downstream; without a persist each
side re-scans (documented, deliberate: an implicit cache of a 100 TB
frame is worse than an explicit re-scan decision).  `rule_violation_
counts` aggregates with a single partial+final hash agg; rows failing
multiple rules count once per rule (explode AFTER the fail-filter, so
the exploded set is |violations|, not |rows| x |rules|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name of the annotation column
FAILED_COL = "failed_rules"


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add ``failed_rules: array<string>`` listing (in rule-dict
    order) every rule the row violates; empty array = clean row.

    A rule fails unless it is DEFINITIVELY true: under SQL
    three-valued logic a NULL input makes ``x > 0`` evaluate to NULL,
    and a bare ``~rule`` would let such rows slip through as clean --
    exactly the rows a DQ gate exists to catch."""
    tagged = F.array(
        *[
            F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
            for name, rule in rules.items()
        ]
    )
    return df.withColumn(
        FAILED_COL, F.filter(tagged, lambda x: x.isNotNull())
    )


def validate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, quarantined) views of the annotated frame.
    Quarantined rows keep their ``failed_rules`` annotation; good rows
    drop it.  See module docstring for the one-scan-per-side caveat."""
    annotated = annotate(df, rules)
    good = annotated.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    bad = annotated.filter(F.size(FAILED_COL) > 0)
    return good, bad


def rule_violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts (the audit summary a DQ job emits):
    one row per rule that has at least one violation."""
    annotated = annotate(df, rules)
    return (
        annotated.filter(F.size(FAILED_COL) > 0)
        .select(F.explode(FAILED_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n_violations"))
        .orderBy("rule")
    )


def distribution_psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index of each group's ``value_col``
    distribution against the whole-corpus distribution -- the standard
    drift monitor a training pipeline runs per source / per snapshot
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate).

    Values are histogrammed into ``bins`` FIXED-WIDTH buckets over
    [lo, hi] (fixed edges, not quantiles, so the binning is exact and
    cross-engine reproducible); each side is Laplace-smoothed with
    ``smoothing`` pseudo-counts per bin so empty bins contribute a
    finite term.  PSI_g = sum_b (p_gb - p_b) * ln(p_gb / p_b).

    Returns (group, n_docs, psi), psi rounded to 6 dp.

    Scale shape: the data is scanned ONCE -- a single map-side-combined
    groupBy(group, bin) -- and every other table (per-group totals,
    per-bin corpus totals, the grand total, the dense spine) derives
    from that |groups| x bins count table, so all remaining arithmetic
    is histogram-sized; the final per-group sum runs in 9-dp int64
    fixed-point (order-independent).  Nulls and out-of-range values are
    excluded (they belong in a quality gate, not a drift histogram).
    """
    from ..queries._exact import dsum

    v = F.col(value_col)
    width = (hi - lo) / bins
    bin_ = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(bins - 1)
    )
    base = df.filter(v.isNotNull() & (v >= lo) & (v <= hi)).select(
        F.col(group_col).alias("__g"), bin_.alias("__b")
    )

    # the ONE data-sized aggregate; localCheckpoint so the four derived
    # tables below read the histogram, not four re-scans of the corpus
    # (measured: 2.6 s -> ~0.9 s at sf0.1 on the quality-score query,
    # whose 4x regex re-evaluation dominated) -- histogram-sized state,
    # |groups| x bins rows
    counts = (
        base.groupBy("__g", "__b")
        .agg(F.count(F.lit(1)).alias("__n_gb"))
        .localCheckpoint(eager=True)
    )

    spark = df.sparkSession
    spine_b = spark.range(bins).select(F.col("id").cast("int").alias("__b"))
    groups = counts.groupBy("__g").agg(F.sum("__n_gb").alias("__n_g"))
    dense = groups.crossJoin(F.broadcast(spine_b))

    gcounts = counts.groupBy("__b").agg(F.sum("__n_gb").alias("__n_b"))
    total = counts.agg(F.sum("__n_gb").alias("__n"))

    s, sb = float(smoothing), float(smoothing) * bins
    joined = (
        dense.join(counts, ["__g", "__b"], "left")
        .join(F.broadcast(gcounts), "__b", "left")
        .join(F.broadcast(total))
        .select(
            "__g",
            "__n_g",
            (
                (F.coalesce(F.col("__n_gb"), F.lit(0)) + F.lit(s))
                / (F.col("__n_g") + F.lit(sb))
            ).alias("__p_g"),
            (
                (F.coalesce(F.col("__n_b"), F.lit(0)) + F.lit(s))
                / (F.col("__n") + F.lit(sb))
            ).alias("__p"),
        )
    )
    term = (F.col("__p_g") - F.col("__p")) * F.log(F.col("__p_g") / F.col("__p"))
    return (
        joined.groupBy("__g")
        .agg(
            F.max("__n_g").alias("n_docs"),  # constant within a group
            F.round(dsum(term, 9), 6).alias("psi"),
        )
        .select(F.col("__g").alias(group_col), "n_docs", "psi")
    )
