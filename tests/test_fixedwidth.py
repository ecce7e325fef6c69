"""Fixed-width source/sink: layout parse, E1 tolerant modes, round trip."""

from __future__ import annotations

from shuttlestandalonedbcreator_spark.sources.fixedwidth import (
    read_fixed_width,
    write_fixed_width,
)
from shuttlestandalonedbcreator_spark.sources.jsonl import CORRUPT_COL

SPECS = [
    ("item_id", 0, 6, "long"),
    ("name", 6, 10, "string"),
    ("qty", 16, 5, "long"),
    ("price", 21, 8, "double"),
]


def _line(item_id: str, name: str, qty: str, price: str) -> str:
    return item_id.rjust(6, "0") + name.ljust(10) + qty.ljust(5) + price.ljust(8)


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_parse_layout_and_types(spark, tmp_path):
    f = tmp_path / "data.txt"
    _write(
        f,
        [
            _line("1", "widget", "42", "19.99"),
            _line("2", "gadget", "7", "0.50"),
            # empty numeric slice -> NULL, not malformed
            _line("3", "nut", "", "1.0"),
        ],
    )
    rows = {
        r["item_id"]: (r["name"], r["qty"], r["price"])
        for r in read_fixed_width(spark, str(f), SPECS).collect()
    }
    assert rows == {
        1: ("widget", 42, 19.99),
        2: ("gadget", 7, 0.5),
        3: ("nut", None, 1.0),
    }


def test_malformed_rows_drop_or_side_channel(spark, tmp_path):
    f = tmp_path / "bad.txt"
    good = _line("1", "widget", "42", "19.99")
    short = "000002gadg"  # shorter than the layout
    junk = _line("X", "widget", "42", "19.99")  # non-numeric id slice
    _write(f, [good, short, junk, ""])  # trailing blank line skipped

    dropped = read_fixed_width(spark, str(f), SPECS)
    assert [r["item_id"] for r in dropped.collect()] == [1]

    kept = read_fixed_width(spark, str(f), SPECS, keep_corrupt=True)
    out = kept.collect()
    assert len(out) == 3
    bad = [r for r in out if r[CORRUPT_COL] is not None]
    assert sorted(r[CORRUPT_COL] for r in bad) == sorted([short, junk])
    # corrupt rows carry NULL data columns; good rows carry NULL corrupt col
    assert all(r["item_id"] is None for r in bad)
    good_rows = [r for r in out if r[CORRUPT_COL] is None]
    assert good_rows[0]["item_id"] == 1


def test_round_trip_with_gap_and_truncation(spark, tmp_path):
    # layout with a 2-char gap between name and qty
    specs = [("k", 0, 4, "long"), ("name", 4, 6, "string"), ("qty", 12, 4, "long")]
    df = spark.createDataFrame(
        [(1, "short", 10), (2, "toolongname", 20), (3, None, None)],
        "k long, name string, qty long",
    )
    out_dir = tmp_path / "out"
    write_fixed_width(df, str(out_dir), specs, num_files=1)

    lines = sorted(
        r["value"]
        for r in spark.read.text(str(out_dir)).collect()
        if r["value"].strip()
    )
    assert lines == [
        "1   short   10  ",
        "2   toolon  20  ",  # documented truncation to the slice width
        "3   " + " " * 12,   # NULLs render as all-space slices
    ]

    back = read_fixed_width(spark, str(out_dir), specs)
    got = {r["k"]: (r["name"], r["qty"]) for r in back.collect()}
    assert got[1] == ("short", 10)
    assert got[2] == ("toolon", 20)
    assert got[3] == (None, None)
