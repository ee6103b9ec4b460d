"""PySpark-native analytics engine with the query and data-processing
capabilities of Mayurwaghela1997/Big_Data_CO2_Emission_Analysis.

The reference (surveyed in /root/repo/SURVEY.md) is a batch PySpark
pipeline: CSV ingest -> null cleaning -> derived change columns ->
k-means clustering -> six analytical queries.  This package re-expresses
that surface Spark-first (DataFrame/SQL + Catalyst, pyspark.ml for the
clustering leg) and extends it with the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns, structured streaming) that a 100 TB deployment needs.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``sources``    : readers (CSV/Parquet/JSON, explicit schemas) and writers
- ``operators``  : relational operators (row ops, aggregates, joins, windows,
                   set ops, sampling, dedup, similarity, multimodal)
- ``functions``  : scalar expression helpers (labels, text analysis, vectors)
- ``plans``      : plan-inspection utilities (pushdown/broadcast assertions)
- ``ml``         : VectorAssembler + KMeans pipeline (reference M1-M6)
- ``co2``        : faithful re-implementation of the reference CO2 pipeline
- ``streaming``  : Structured Streaming surface (windows, watermarks, state)
- ``queries``    : the named query registry driving __spark_entry__.py
"""

__version__ = "0.1.0"
