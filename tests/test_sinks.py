"""Parquet sink: round-trip fidelity, partitioned layout, and
partition pruning on read-back (the property that makes partition_by
worth its write-side shuffle at 100 TB)."""

import os

from pyspark.sql import functions as F

from big_data_co2_emission_analysis_spark.plans.inspect import explain_formatted
from big_data_co2_emission_analysis_spark.sources.writers import write_parquet


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_rt")
    write_parquet(src, out)
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert back.schema == src.schema


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_by_prio")
    write_parquet(src, out, partition_by=["o_orderpriority"])
    # hive-style directory per partition value
    dirs = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(dirs) == 5
    back = spark.read.parquet(out).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = explain_formatted(back)
    # the partition predicate must prune directories, not filter rows
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    n_urgent = src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == n_urgent


def test_max_records_per_file_splits(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/region.parquet")  # 5 rows
    out = str(tmp_path / "region_split")
    write_parquet(src.coalesce(1), out, max_records_per_file=2)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 3  # ceil(5/2)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO shuffle exchanges -- the pay-once primitive for repeated joins
    on a 100 TB fact table."""
    import re

    from big_data_co2_emission_analysis_spark.sources.writers import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey", "o_totalprice")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    try:
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = explain_formatted(joined)
        n_shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
        assert n_shuffles == 0, f"bucketed join should not shuffle, saw {n_shuffles}:\n{plan[:800]}"
        # join result parity with the plain (shuffling) join
        plain = orders.join(li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_sorted_write_produces_selective_row_group_stats(spark, sf_dir, tmp_path):
    """A sorted single partition split across files must produce
    pairwise non-overlapping key ranges in the parquet footers -- the
    property that lets range predicates skip whole files/row groups."""
    import pyarrow.parquet as pq

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_sorted")
    write_parquet(
        src.coalesce(1), out,
        sort_within_partitions=["o_orderkey"], max_records_per_file=400,
    )
    ranges = []
    for fname in sorted(f for f in os.listdir(out) if f.endswith(".parquet")):
        meta = pq.ParquetFile(os.path.join(out, fname)).metadata
        idx = next(
            i for i in range(meta.num_columns)
            if meta.schema.column(i).name == "o_orderkey"
        )
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 3
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """40 tiny appended files -> a handful of target-sized files with
    identical content; the original survives a crash (rewrite lands in
    a sibling dir before the swap)."""
    import os

    from big_data_co2_emission_analysis_spark.sources.writers import compact_parquet

    out = str(tmp_path / "t")
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(400)
    # simulate a streaming sink's append litter: 40 single-row-group files
    for i in range(40):
        src.filter(F.col("o_orderkey") % 40 == i).coalesce(1).write.mode("append").parquet(out)
    before = spark.read.parquet(out)
    n_before = before.count()
    checksum_before = before.agg(F.sum(F.crc32(F.col("o_orderkey").cast("string")))).collect()[0][0]

    stats = compact_parquet(spark, out, target_file_bytes=1 << 20)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == n_before

    after = spark.read.parquet(out)
    assert after.count() == n_before
    checksum_after = after.agg(F.sum(F.crc32(F.col("o_orderkey").cast("string")))).collect()[0][0]
    assert checksum_after == checksum_before
    assert not os.path.exists(out + ".compacting") and not os.path.exists(out + ".old")


def test_orc_round_trip_and_pushdown(spark, sf_dir, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_orc
    from big_data_co2_emission_analysis_spark.sources.writers import write_orc

    src = spark.read.parquet(f"{sf_dir}/part.parquet")
    write_orc(src, str(tmp_path / "part_orc"), partition_by=["p_type"])
    back = read_orc(spark, str(tmp_path / "part_orc"))
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)
    # partition pruning: the p_type filter must reach the file listing
    plan = (
        back.filter("p_type = 'ECONOMY'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "p_type" in plan
    got = back.filter("p_type = 'ECONOMY'").count()
    expect = src.filter("p_type = 'ECONOMY'").count()
    assert got == expect


def test_text_source_lines_and_wholetext(spark, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\n")
    (d / "b.txt").write_text("gamma\n")
    lines = read_text(spark, str(d))
    assert sorted(r["value"] for r in lines.collect()) == ["alpha", "beta", "gamma"]
    whole = read_text(spark, str(d), whole_text=True)
    assert sorted(r["value"] for r in whole.collect()) == ["alpha\nbeta\n", "gamma\n"]


def test_csv_round_trip_with_escape(spark, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_csv
    from big_data_co2_emission_analysis_spark.sources.writers import write_csv

    df = spark.createDataFrame(
        [(1, 'plain'), (2, 'comma, inside'), (3, 'quote " and @at')],
        "id int, txt string",
    )
    path = str(tmp_path / "csv_out")
    write_csv(df, path, compression=None, escape="@")
    back = read_csv(spark, path, header=True, infer_schema=True, escape="@")
    assert sorted((r["id"], r["txt"]) for r in back.collect()) == sorted(
        (r["id"], r["txt"]) for r in df.collect()
    )


def test_jsonl_round_trip_nested(spark, tmp_path):
    from big_data_co2_emission_analysis_spark.sources.readers import read_jsonl
    from big_data_co2_emission_analysis_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": [1, 2]}), (2, {"a": 5, "b": []})],
        "id int, payload struct<a:int, b:array<int>>",
    )
    path = str(tmp_path / "jsonl_out")
    write_jsonl(df, path, compression=None)
    back = read_jsonl(spark, path)
    got = sorted((r["id"], r["payload"]["a"], list(r["payload"]["b"])) for r in back.collect())
    assert got == [(1, 1, [1, 2]), (2, 5, [])]


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML source/sink: values survive, explicit
    schema on re-read (XML carries no types)."""
    from big_data_co2_emission_analysis_spark.sources.readers import read_xml
    from big_data_co2_emission_analysis_spark.sources.writers import write_xml

    src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    path = str(tmp_path / "xml_out")
    write_xml(src, path, row_tag="part", root_tag="parts")
    back = read_xml(
        spark,
        path,
        row_tag="part",
        schema="p_partkey long, p_brand string, p_retailprice double",
    )
    a = sorted((r.p_partkey, r.p_brand, r.p_retailprice) for r in src.collect())
    b = sorted((r.p_partkey, r.p_brand, r.p_retailprice) for r in back.collect())
    assert a == b


def test_hidden_metadata_columns_expose_scan_provenance(spark, sf_dir):
    """Spark's _metadata struct (file_path/file_name/file_size/
    row_index) gives row-level scan provenance with no extra I/O --
    the debugging path for 'which input file produced this row' at
    100 TB.  (No registry oracle: the values are paths, inherently
    sf-dir-relative.)"""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prov = df.select(
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    per_file = prov.groupBy("fname").count().collect()
    assert sum(r["count"] for r in per_file) == df.count()
    assert all(r.fname.endswith(".parquet") for r in per_file)
    # row_index is a real per-file position: distinct within each file
    n_distinct = prov.distinct().count()
    assert n_distinct == df.count()


def test_merge_schema_reads_evolved_parquet(spark, tmp_path):
    """Schema evolution on read: files written before/after a column
    was added read as one table under mergeSchema, old rows NULL-filled
    -- the append-only table-evolution path without a table format."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
    # and the evolved column is filterable with pushdown semantics
    assert merged.filter(F.col("score") > 9).count() == 1
