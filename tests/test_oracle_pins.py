"""Golden-fixture oracle pins (queries._pinned_oracle +
shuttlestandalonedbcreator_spark/oracle_pins/): structural integrity of
the pin artifacts. Value-level parity is covered by
tests/test_oracle_parity.py and tools/pin_fixture_oracles.py --check;
these tests pin the failure MODES — a missing artifact must be loud,
fingerprints must discriminate the SFs, and every referenced fixture
must exist."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from shuttlestandalonedbcreator_spark import queries as Q

PINNED = (
    "bpe_train_merges",
    "compression_ratio_gate",
    "embedding_ivf_topk",
    "approx_aggregates",
)


def test_fingerprints_json_present_and_discriminating():
    values = Q._pin_fingerprint_values()
    assert values is not None, "oracle_pins/fingerprints.json missing"
    assert set(values) == set(Q._PIN_FINGERPRINT_SQL)
    for table, fps in values.items():
        assert len(fps) == 3, f"{table}: expected one fingerprint per SF"
        assert len(set(fps.values())) == 3, (
            f"{table}: fingerprints do not discriminate the SFs: {fps} — "
            "a COUNT(*)-style fingerprint cannot tell sf0.001 from sf0.01 "
            "(both have 500 documents/embeddings rows)"
        )


def test_pinned_oracles_are_real_sql_and_fixtures_exist():
    for name in PINNED:
        oracle = Q.CATALOG[name].oracle
        assert oracle is not None, f"{name} lost its pin"
        assert "PIN_FINGERPRINTS_MISSING" not in oracle, (
            f"{name}: bootstrap sentinel shipped — run "
            "tools/pin_fixture_oracles.py"
        )
        for tag in ("sf0_001", "sf0_01", "sf0_1"):
            path = os.path.join(Q._PIN_DIR, f"{name}.{tag}.parquet")
            assert os.path.exists(path), f"missing fixture {path}"
            assert path in oracle, f"{name} oracle does not reference {path}"


@pytest.mark.parametrize("name", PINNED)
def test_foreign_data_yields_loud_empty_oracle(name):
    """The fingerprint guard's promised failure mode: on a dataset that
    is none of the three pinned SFs, the oracle must return ZERO rows
    (driver row-count mismatch) — never a wrong fixture's rows."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 'x' AS text, 1 AS doc_id")
    con.execute(
        "CREATE VIEW embeddings AS SELECT [0.5]::FLOAT[] AS embedding, 1 AS vec_id"
    )
    con.execute(
        "CREATE VIEW lineitem AS SELECT 1 AS l_orderkey, 1 AS l_partkey, "
        "1 AS l_linenumber"
    )
    assert len(con.execute(Q.CATALOG[name].oracle).df()) == 0
