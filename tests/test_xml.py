"""XML source/sink (Spark 4 native format("xml")): round trip, corrupt
tolerance (E1 contract), shard-count control."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.sources.jsonl import corrupt_stats
from shuttlestandalonedbcreator_spark.sources.registry import load_table
from shuttlestandalonedbcreator_spark.sources.xml import read_xml, write_xml

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_xml_round_trip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_xml")
    write_xml(docs, out, row_tag="doc", root_tag="docs", num_files=3)
    back = read_xml(spark, out, row_tag="doc", schema=SCHEMA)
    assert back.count() == docs.count()
    a = docs.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    b = back.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    assert tuple(a) == tuple(b)
    # shard count IS the downstream read parallelism (XML can't split)
    assert len([f for f in os.listdir(out) if f.endswith(".xml")]) == 3


def test_xml_corrupt_rows_side_channel(spark, tmp_path):
    p = tmp_path / "bad.xml"
    p.write_text(
        "<rows>"
        "<row><doc_id>1</doc_id><text>hello</text><lang>en</lang>"
        "<source>web</source><n_chars>5</n_chars></row>"
        "<row><doc_id>not_a_number</doc_id><text>oops</text><lang>en</lang>"
        "<source>web</source><n_chars>4</n_chars></row>"
        "<row><doc_id>3</doc_id><text>ok</text><lang>de</lang>"
        "<source>web</source><n_chars>2</n_chars></row>"
        "</rows>"
    )
    tolerant = read_xml(
        spark, str(p), row_tag="row", schema=SCHEMA, keep_corrupt=True
    ).cache()
    good, bad = corrupt_stats(tolerant)
    assert (good, bad) == (2, 1)
    dropped = read_xml(spark, str(p), row_tag="row", schema=SCHEMA)
    assert sorted(r["doc_id"] for r in dropped.select("doc_id").collect()) == [1, 3]


def test_xml_nested_elements_infer(spark, tmp_path):
    """Nested elements map to structs on the inference path — the shape a
    real feed (attributes + children) produces."""
    p = tmp_path / "n.xml"
    p.write_text(
        "<feed>"
        '<entry id="7"><meta><lang>en</lang><score>0.5</score></meta>'
        "<body>alpha</body></entry>"
        '<entry id="8"><meta><lang>de</lang><score>0.25</score></meta>'
        "<body>beta</body></entry>"
        "</feed>"
    )
    df = read_xml(spark, str(p), row_tag="entry")
    rows = {r["_id"]: r for r in df.collect()}
    assert rows[7]["meta"]["lang"] == "en" and rows[8]["body"] == "beta"
