"""Source/sink round-trips + plan-shape assertions for io/formats.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_memory_libsql_spark.io import formats
from mcp_memory_libsql_spark.io.tables import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir)["documents"]


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, path)
    back = formats.read_jsonl(spark, path, formats.DOCUMENTS_SCHEMA)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select(docs.columns).collect()}
    assert a == b


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    path = str(tmp_path / "docs_csv")
    formats.write_csv(docs, path)
    back = formats.read_csv(
        spark, path, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_part")
    formats.write_partitioned_parquet(docs, path, ["lang"])
    back = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan: only the lang=en directory read
    assert "PartitionFilters" in plan and "lang" in plan
    want = docs.where(F.col("lang") == "en").count()
    assert back.count() == want


def test_training_shards_deterministic_and_balanced(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    formats.export_training_shards(docs, p1, n_shards=4)
    formats.export_training_shards(docs, p2, n_shards=4)
    b1 = formats.read_training_shards(spark, p1)
    b2 = formats.read_training_shards(spark, p2)
    m1 = {(r.doc_id, r.shard) for r in b1.select("doc_id", "shard").collect()}
    m2 = {(r.doc_id, r.shard) for r in b2.select("doc_id", "shard").collect()}
    assert m1 == m2  # same corpus -> identical shard membership
    assert b1.count() == docs.count()
    sizes = dict(
        (r.shard, r.n)
        for r in b1.groupBy("shard").agg(F.count("*").alias("n")).collect()
    )
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) <= 2 * min(sizes.values())  # hash-balanced


def test_shard_scoped_read_prunes(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "s3")
    formats.export_training_shards(docs, path, n_shards=4)
    one = formats.read_training_shards(spark, path).where(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from mcp_memory_libsql_spark.io.formats import read_orc, write_orc
    from mcp_memory_libsql_spark.io.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    # partition pruning: a lang filter must reach PartitionFilters
    plan = (
        back.where(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingest → media schema → feature extraction: the
    crawl-to-parquet first hop of the multimodal pipeline, with
    pathGlobFilter pruning non-matching extensions at listing time."""
    from mcp_memory_libsql_spark.io import formats
    from mcp_memory_libsql_spark.multimodal import media as mm

    d = tmp_path / "raw"
    d.mkdir()
    (d / "a.img").write_bytes(b"payload-a" * 10)
    (d / "b.img").write_bytes(b"payload-b" * 20)
    (d / "skip.txt").write_bytes(b"not media")

    files = formats.read_binary_files(spark, str(d), glob="*.img")
    assert files.count() == 2
    assert set(files.columns) == {
        "path", "modificationTime", "length", "content"
    }
    m = formats.binary_files_to_media(files, "image")
    feats = mm.extract_features(m).collect()
    assert len(feats) == 2
    by_bytes = {r.n_bytes for r in feats}
    assert by_bytes == {90, 180}


def test_sql_views_surface(spark, sf_dir):
    """Raw spark.sql over registered views matches the DataFrame API
    (same plans, same data) — the notebook/BI entry point."""
    from mcp_memory_libsql_spark.sql import register_views

    names = register_views(spark, sf_dir)
    assert set(names) >= {"lineitem", "kg_entities", "kg_relations"}
    got = {
        (r.entity_type, r.n)
        for r in spark.sql(
            "SELECT entity_type, COUNT(*) AS n FROM kg_entities GROUP BY 1"
        ).collect()
    }
    from mcp_memory_libsql_spark.registry import QUERIES

    want = {
        (r.entity_type, r.n_entities)
        for r in QUERIES["kg_entity_type_counts"](spark, sf_dir).collect()
    }
    assert got == want
    # pushdown reaches the parquet scan through the view too
    plan = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate > '1997-01-01'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
