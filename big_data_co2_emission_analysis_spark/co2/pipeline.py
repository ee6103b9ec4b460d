"""Faithful re-implementation of the reference CO2 pipeline
(reference project-co2.py:79-228), Spark-first.

Same semantics, different engineering:

- Explicit schema instead of inferSchema (no second pass over the data;
  reference project-co2.py:87).
- The derived table is cached once before the ~10 downstream actions;
  the reference re-executes the full CSV lineage per action
  (reference project-co2.py:123-124,187-226 -- SURVEY.md section 4
  calls this out as the single biggest practical fix).
- The `num_increased` copy-paste bug (reference project-co2.py:211
  counts the *reduced* side) is implemented fixed, as the submission
  variant does.
- The cluster-label Python UDF (reference project-co2.py:130-132) is a
  native expression (ml.clustering.cluster_summary).

Golden invariants (SURVEY.md section 5.2, re-derived from the CSV) are
asserted in tests/test_co2_golden.py: 264 -> 244 rows; 87 reduced / 157
increased; sums -148.5387 / +126.4713 / -22.0674; fixed top-3 answers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.clustering import assemble_features, cluster_summary, fit_kmeans, silhouette
from ..sources.readers import read_co2_csv

REFERENCE_CSV = "/root/reference/co2-dataset-edited.csv"
BASE_YEAR, TARGET_YEAR = "2004", "2014"
COMPARISON_COUNTRIES = ["Germany", "United States", "France", "China", "Sweden"]


def preprocess(df: DataFrame) -> DataFrame:
    """Reference preprocessing() (project-co2.py:22-29): drop all-null
    rows, rows null in both years, then any-null rows on the 4-column
    projection.  264 -> 244 rows on the reference CSV.

    The two `na.drop("all")` calls are redundant before the any-drop
    (the submission variant comments them out) but kept for semantic
    parity; Catalyst folds the three filters into one scan predicate.
    """
    projected = df.select("Country Name", "Country Code", BASE_YEAR, TARGET_YEAR)
    return (
        projected.na.drop(how="all")
        .na.drop(how="all", subset=[BASE_YEAR, TARGET_YEAR])
        .na.drop(how="any")
    )


def derive(df: DataFrame) -> DataFrame:
    """Reference derive stage (project-co2.py:101,105): change =
    2014 - 2004; isReduced = change <= 0 (zero counts as reduced)."""
    return df.withColumn("change", F.col(TARGET_YEAR) - F.col(BASE_YEAR)).withColumn(
        "isReduced", F.col("change") <= 0
    )


def load_clean(spark: SparkSession, csv_path: str = REFERENCE_CSV) -> DataFrame:
    """CSV -> preprocess -> derive, cached (every analytic below reuses
    this lineage; the reference re-reads the CSV per action)."""
    return derive(preprocess(read_co2_csv(spark, csv_path))).cache()


# -- the six analytical queries (reference project-co2.py:184-226) --------


def top_emitters(df: DataFrame, year: str = TARGET_YEAR, n: int = 3, lowest: bool = False) -> DataFrame:
    """Top/bottom-n emitters in a year (project-co2.py:187-192)."""
    order = F.asc(year) if lowest else F.desc(year)
    return df.select("Country Name", year).orderBy(order, F.asc("Country Name")).limit(n)


def top_reducers(df: DataFrame, n: int = 3) -> DataFrame:
    """Countries with the biggest reduction (project-co2.py:191-192)."""
    return df.select("Country Name", "change").orderBy(F.asc("change"), F.asc("Country Name")).limit(n)


def top_increasers(df: DataFrame, n: int = 3) -> DataFrame:
    """Countries with the biggest increase (project-co2.py:196-200)."""
    return df.select("Country Name", "change").orderBy(F.desc("change"), F.asc("Country Name")).limit(n)


def reduced_increased_counts(df: DataFrame) -> tuple[int, int]:
    """Counts of reduced/increased countries (project-co2.py:204-211,
    with the submission fix: increased counts the increased side)."""
    counts = {r["isReduced"]: r["count"] for r in df.groupBy("isReduced").count().collect()}
    return int(counts.get(True, 0)), int(counts.get(False, 0))


def conditional_sums(df: DataFrame) -> tuple[float, float, float]:
    """(sum | reduced, sum | increased, total) in ONE aggregation pass
    (the reference runs three separate filter+agg jobs,
    project-co2.py:218-222)."""
    row = df.agg(
        F.sum(F.when(F.col("isReduced"), F.col("change")).otherwise(0.0)).alias("r"),
        F.sum(F.when(~F.col("isReduced"), F.col("change")).otherwise(0.0)).alias("i"),
        F.sum("change").alias("t"),
    ).collect()[0]
    return float(row["r"]), float(row["i"]), float(row["t"])


def selected_countries(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """The 5-country comparison (project-co2.py:226), expressed with
    isin instead of the reference's 5-way OR chain."""
    return (
        df.filter(F.col("Country Name").isin(names or COMPARISON_COUNTRIES))
        .select("Country Name", BASE_YEAR, TARGET_YEAR, "change", "isReduced")
        .orderBy("change")
    )


def world_join(
    df: DataFrame,
    spark: SparkSession | None = None,
    value_cols: tuple[str, ...] = ("change", "isReduced"),
) -> DataFrame:
    """Reference project-co2.py:137-147, entirely in Spark: patch the
    four '-99' ISO codes on the world dim, rename `Country Code` to
    `iso_a3`, LEFT-join from the dim so every world row survives --
    countries absent from the CO2 table carry null change/cluster
    (the reference renders them grey), and CO2 aggregates (`ARB`,
    `WLD`, ...) drop out because no world row matches them.  The
    reference does this join in pandas after a `.toPandas()`; here the
    CO2 side stays a DataFrame and is the broadcast (non-preserved)
    side of the join.
    """
    from .world_dim import apply_iso_patches, world_dim_df

    dim = apply_iso_patches(world_dim_df(spark or df.sparkSession))
    co2 = df.withColumnRenamed("Country Code", "iso_a3").select("iso_a3", *value_cols)
    return dim.join(F.broadcast(co2), on="iso_a3", how="left")


# -- the ML leg (reference project-co2.py:34-76) ---------------------------


@dataclass
class Co2PipelineResult:
    n_raw: int
    n_clean: int
    n_reduced: int
    n_increased: int
    sum_reduced: float
    sum_increased: float
    sum_total: float
    silhouette: float
    centroids: list[list[float]] = field(default_factory=list)
    cluster_ranges: DataFrame | None = None
    assigned: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    csv_path: str = REFERENCE_CSV,
    k: int = 5,
    seed: int = 1,
    train_fraction: float | None = 0.1,
) -> Co2PipelineResult:
    """End-to-end reproduction: ingest -> clean -> derive -> k-means ->
    analytics.  Fit on a 10% seed-42 sample like the reference
    (project-co2.py:62-65); pass train_fraction=None for a full fit."""
    raw = read_co2_csv(spark, csv_path)
    n_raw = raw.count()
    clean = derive(preprocess(raw)).cache()
    feats = assemble_features(clean, ["change", "isReduced"]).cache()

    model = fit_kmeans(feats, k=k, seed=seed, sample_fraction=train_fraction)
    assigned = model.transform(feats).cache()

    n_reduced, n_increased = reduced_increased_counts(clean)
    s_red, s_inc, s_tot = conditional_sums(clean)
    return Co2PipelineResult(
        n_raw=n_raw,
        n_clean=clean.count(),
        n_reduced=n_reduced,
        n_increased=n_increased,
        sum_reduced=s_red,
        sum_increased=s_inc,
        sum_total=s_tot,
        silhouette=silhouette(assigned),
        centroids=[[float(x) for x in c] for c in model.clusterCenters()],
        cluster_ranges=cluster_summary(assigned),
        assigned=assigned,
    )
