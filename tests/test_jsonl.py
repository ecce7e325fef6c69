"""JSONL source/sink: tolerant reads (E1 side channel), round trips,
partitioned writes with pruning."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    corrupt_stats,
    read_jsonl,
    write_jsonl,
)
from shuttlestandalonedbcreator_spark.sources.registry import load_table


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_round_trip_documents(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, num_files=4)
    back = read_jsonl(spark, out, schema=DOCUMENTS_SCHEMA)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b
    # shard-count control (small-files management)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4


def test_jsonl_corrupt_lines_are_side_channel_not_fatal(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    _write_lines(
        p,
        [
            json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}),
            '{"doc_id": 2, "text": "unterminated',  # malformed JSON
            json.dumps({"doc_id": 3, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}),
            "not json at all",
        ],
    )
    kept = read_jsonl(spark, str(p), schema=DOCUMENTS_SCHEMA, keep_corrupt=True).cache()
    good, bad = corrupt_stats(kept)
    assert (good, bad) == (2, 2)
    # default read drops the bad rows and the side-channel column
    clean = read_jsonl(spark, str(p), schema=DOCUMENTS_SCHEMA)
    assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}


def test_jsonl_partitioned_write_prunes(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "by_lang")
    write_jsonl(docs.select("doc_id", "text", "lang"), out, partition_by=("lang",))
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("lang=")} == langs
    one = read_jsonl(spark, out, schema="doc_id bigint, text string").filter(
        F.col("lang") == sorted(langs)[0]
    )
    # partition pruning: only the one lang directory is scanned
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(lang" in plan
    expected = docs.filter(F.col("lang") == sorted(langs)[0]).count()
    assert one.count() == expected
