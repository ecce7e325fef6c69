"""CSV source/sink: round trip, corrupt tolerance (E1 contract),
hive-partitioned writes with pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.sources.csv import read_csv, write_csv
from shuttlestandalonedbcreator_spark.sources.jsonl import corrupt_stats
from shuttlestandalonedbcreator_spark.sources.registry import load_table

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_csv_round_trip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_csv")
    write_csv(docs, out, num_files=3)
    back = read_csv(spark, out, schema=SCHEMA)
    assert back.count() == docs.count()
    # values survive the text round trip (ids + char counts agree)
    a = docs.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    b = back.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    assert tuple(a) == tuple(b)
    assert len([f for f in os.listdir(out) if f.endswith(".csv")]) == 3


def test_csv_corrupt_rows_side_channel(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,web,5\n"
        "not_a_number,oops,en,web,4\n"  # doc_id fails the bigint cast
        "3,ok,de,web,2\n"
    )
    tolerant = read_csv(spark, str(p), schema=SCHEMA, keep_corrupt=True).cache()
    good, bad = corrupt_stats(tolerant)
    assert (good, bad) == (2, 1)
    # default path drops the bad row executor-side, never fails the job
    dropped = read_csv(spark, str(p), schema=SCHEMA)
    assert sorted(r["doc_id"] for r in dropped.select("doc_id").collect()) == [1, 3]


def test_csv_partitioned_write_prunes(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "by_lang")
    write_csv(docs, out, partition_by=("lang",))
    back = read_csv(spark, out, schema="doc_id bigint, text string, source string, n_chars bigint")
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter handled at scan time, not as a post-scan Filter
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one.count() == docs.filter(F.col("lang") == "en").count()
