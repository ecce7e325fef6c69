"""BIFF reader vs a POI-layout record stream.

The package writer (`biff.build_workbook_stream`) emits the MINIMAL
record set (RK/NUMBER/LABELSST), so round-trip tests never exercised the
record shapes a real writer produces. Apache POI's HSSF serializer emits
a much denser stream — interface/protection/window preamble, FONT/XF
blocks, ROW + DBCELL offsets, MULRK for consecutive RK runs, MULBLANK
for blank runs, FORMULA with cached results (+ trailing STRING for
string formulas), an SST that splits across CONTINUE mid-string — all
specified publicly in MS-XLS and visible in POI's InternalWorkbook /
Sheet record orderings. This module builds THAT stream byte-for-byte
per spec and pins `parse_xls_rows` against it: reading records a real
writer emits, not just our own.
"""

from __future__ import annotations

import struct

from shuttlestandalonedbcreator_spark.sources import biff
from shuttlestandalonedbcreator_spark.sources.biff import (
    _rec,
    _short_xl_string,
    _xl_string,
    wrap_cfb,
)


def _u16(*vals):
    return struct.pack("<" + "H" * len(vals), *vals)


def _poi_globals(sheet_names, sheet_offsets, sst_payloads):
    """Workbook-globals substream in POI InternalWorkbook.createWorkbook
    order. Our reader needs only BOF/BOUNDSHEET/FORMAT/XF/SST/EOF; the
    rest exercises the ignore-unknown-records path at real-world density."""
    out = bytearray()
    out += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    out += _rec(0x00E1, _u16(0x04B0))                      # INTERFACEHDR
    out += _rec(0x00C1, b"\x00\x00")                       # MMS
    out += _rec(0x00E2, b"")                               # INTERFACEEND
    out += _rec(0x005C, b" " * 112)                        # WRITEACCESS
    out += _rec(0x0042, _u16(0x04B0))                      # CODEPAGE utf-16
    out += _rec(0x0161, _u16(0))                           # DSF
    out += _rec(0x013D, _u16(*range(1, len(sheet_names) + 1)))  # TABID
    out += _rec(0x009C, _u16(14))                          # FNGROUPCOUNT
    out += _rec(0x0019, _u16(0))                           # WINDOWPROTECT
    out += _rec(0x0012, _u16(0))                           # PROTECT
    out += _rec(0x0013, _u16(0))                           # PASSWORD
    out += _rec(0x01AF, _u16(0))                           # PROT4REV
    out += _rec(0x01BC, _u16(0))                           # PROT4REVPASS
    out += _rec(0x003D, _u16(0x0168, 0x0111, 0x3A5C, 0x23C3, 0x0038,
                              0, 0, len(sheet_names), 0x0258))  # WINDOW1
    out += _rec(0x0040, _u16(0))                           # BACKUP
    out += _rec(0x008D, _u16(0))                           # HIDEOBJ
    out += _rec(0x0022, _u16(0))                           # DATEMODE 1900
    out += _rec(0x000E, _u16(1))                           # PRECISION
    out += _rec(0x01B7, _u16(0))                           # REFRESHALL
    out += _rec(0x00DA, _u16(0))                           # BOOKBOOL
    font = _u16(0x00C8, 0, 0x7FFF, 0x0190, 0, 0) + b"\x00\x00" + _short_xl_string("Arial")
    for _ in range(4):                                     # FONT x4 (POI quirk)
        out += _rec(0x0031, font)
    for ifmt in (5, 6, 7, 8, 0x2A, 0x29, 0x2C, 0x2B):      # FORMAT block
        out += _rec(0x041E, _u16(ifmt) + _xl_string('#,##0_);(#,##0)'))
    xf = bytearray(20)
    for _ in range(21):                                    # XF x21 (15 styles + cell)
        out += _rec(0x00E0, bytes(xf))
    for i in range(6):                                     # STYLE x6
        out += _rec(0x0293, _u16(0x8000 | i) + bytes([0xFF, 0x00]))
    out += _rec(0x0160, _u16(0))                           # USESELFS
    for name, off in zip(sheet_names, sheet_offsets):
        out += _rec(0x0085, struct.pack("<IBB", off, 0, 0) + _short_xl_string(name))
    out += _rec(0x008C, _u16(1, 1))                        # COUNTRY
    out += _rec(0x00FC, sst_payloads[0])                   # SST
    for cont in sst_payloads[1:]:
        out += _rec(0x003C, cont)                          # CONTINUE
    out += _rec(0x00FF, struct.pack("<H", 8))              # EXTSST (stub)
    out += _rec(0x000A, b"")                               # EOF
    return bytes(out)


def _poi_sheet(cell_records, n_rows, n_cols):
    """Worksheet substream in POI Sheet.serialize order: page-settings
    preamble, DIMENSIONS, ROW block, cell records, DBCELL, window tail."""
    out = bytearray()
    out += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    out += _rec(0x020B, struct.pack("<IIII", 0, 0, n_rows, 0))  # INDEX (stub)
    out += _rec(0x000D, _u16(1))                           # CALCMODE
    out += _rec(0x000C, _u16(0x0064))                      # CALCCOUNT
    out += _rec(0x000F, _u16(1))                           # REFMODE
    out += _rec(0x0011, _u16(0))                           # ITERATION
    out += _rec(0x0010, struct.pack("<d", 0.001))          # DELTA
    out += _rec(0x005F, _u16(1))                           # SAVERECALC
    out += _rec(0x002A, _u16(0))                           # PRINTHEADERS
    out += _rec(0x002B, _u16(0))                           # PRINTGRIDLINES
    out += _rec(0x0082, _u16(1))                           # GRIDSET
    out += _rec(0x0080, _u16(0, 0, 0, 0))                  # GUTS
    out += _rec(0x0225, _u16(0, 0x00FF))                   # DEFAULTROWHEIGHT
    out += _rec(0x0081, _u16(0x04C1))                      # WSBOOL
    out += _rec(0x0014, b"")                               # HEADER
    out += _rec(0x0015, b"")                               # FOOTER
    out += _rec(0x0083, _u16(0))                           # HCENTER
    out += _rec(0x0084, _u16(0))                           # VCENTER
    out += _rec(0x0200, struct.pack("<IIHHH", 0, n_rows, 0, n_cols, 0))
    for r in range(n_rows):                                # ROW block
        out += _rec(0x0208, struct.pack("<HHHHHHHH",
                                        r, 0, n_cols, 0x00FF, 0, 0, 0x0100, 0x000F))
    cell_start = len(out)
    for rec in cell_records:
        out += rec
    # DBCELL: offset back to the first ROW of the block (stub values —
    # readers that stream sequentially, like ours and POI's event model,
    # never consult it)
    out += _rec(0x00D7, struct.pack("<I", len(out) - cell_start))
    out += _rec(0x023E, _u16(0x06B6, 0, 0, 0, 0, 0, 0))    # WINDOW2
    out += _rec(0x001D, b"\x03" + _u16(0, 0, 0, 1) + _u16(0, 0, 0, 0))  # SELECTION
    out += _rec(0x000A, b"")                               # EOF
    return bytes(out)


def _rk_int(v, div100=False):
    rk = ((v & 0x3FFFFFFF) << 2) | 0x02 | (1 if div100 else 0)
    return rk & 0xFFFFFFFF


def _rk_double(d, div100=False):
    (bits,) = struct.unpack("<Q", struct.pack("<d", d))
    return ((bits >> 32) & 0xFFFFFFFC) | (1 if div100 else 0)


def _mulrk(row, col_first, rks):
    body = _u16(row, col_first)
    for ixfe, rk in rks:
        body += _u16(ixfe) + struct.pack("<I", rk)
    return _rec(0x00BD, body + _u16(col_first + len(rks) - 1))


def _mulblank(row, col_first, n, ixfe=15):
    return _rec(0x00BE, _u16(row, col_first) + _u16(*([ixfe] * n))
                + _u16(col_first + n - 1))


def _formula_num(row, col, value, rgce=b"\x1e\x07\x00"):
    return _rec(0x0006, _u16(row, col, 15) + struct.pack("<d", value)
                + _u16(0x0002) + struct.pack("<I", 0)
                + _u16(len(rgce)) + rgce)


def _formula_special(row, col, kind, payload_byte, rgce=b"\x1e\x01\x00"):
    cached = bytes([kind, 0, payload_byte, 0, 0, 0, 0xFF, 0xFF])
    return _rec(0x0006, _u16(row, col, 15) + cached
                + _u16(0x0002) + struct.pack("<I", 0)
                + _u16(len(rgce)) + rgce)


def _string_rec(s):
    return _rec(0x0207, _xl_string(s))


def _rstring(row, col, s, runs=((0, 0), (2, 1))):
    body = _u16(row, col, 15) + _xl_string(s) + _u16(len(runs))
    for ich, ifnt in runs:
        body += _u16(ich, ifnt)
    return _rec(0x00D6, body)


def _build_poi_workbook():
    """Two sheets; SST forced across a CONTINUE boundary MID-STRING with
    a fresh grbit on the continuation (the split POI performs at the
    8224-byte record cap)."""
    long_s = "x" * 40 + "END"  # split inside this string below
    strings = ["name", "qty", long_s, "tail"]
    # SST body: total/unique counts + 2 whole strings + the long string
    # cut after 40 chars; CONTINUE restarts with its own grbit byte
    head = struct.pack("<II", len(strings), len(strings))
    head += _xl_string("name") + _xl_string("qty")
    head += struct.pack("<HB", len(long_s), 0) + b"x" * 40
    cont = b"\x00" + b"END".ljust(3, b"\x00")[:3] + _xl_string("tail")
    sst_payloads = [head, cont]

    s1_cells = [
        _rec(0x00FD, _u16(0, 0, 15) + struct.pack("<I", 0)),   # LABELSST name
        _rec(0x00FD, _u16(0, 1, 15) + struct.pack("<I", 1)),   # LABELSST qty
        # row 1: a 5-cell MULRK run covering all four RK encodings
        _mulrk(1, 0, [
            (15, _rk_int(7)),
            (15, _rk_int(-3)),
            (15, _rk_int(123456, div100=True)),     # 1234.56
            (15, _rk_double(2.5)),                  # IEEE-truncatable
            (15, _rk_double(362.5, div100=True)),   # 3.625
        ]),
        # row 2: blank run + a trailing label
        _mulblank(2, 0, 3),
        _rec(0x00FD, _u16(2, 3, 15) + struct.pack("<I", 3)),   # "tail"
        # row 3: FORMULA results — number, string(+STRING), TRUE, error
        _formula_num(3, 0, 42.25),
        _formula_special(3, 1, 0, 0),               # string result marker
        _string_rec("hello from formula"),
        _formula_special(3, 2, 1, 1),               # boolean TRUE
        _formula_special(3, 3, 2, 0x07),            # error #DIV/0!
        # row 4: legacy rich-text inline string
        _rstring(4, 0, "rich"),
    ]
    s2_cells = [
        _rec(0x0203, _u16(0, 0, 15) + struct.pack("<d", 3.14159)),  # NUMBER
        _mulrk(0, 1, [(15, _rk_int(11)), (15, _rk_int(22))]),
    ]
    sheet1 = _poi_sheet(s1_cells, n_rows=5, n_cols=5)
    sheet2 = _poi_sheet(s2_cells, n_rows=1, n_cols=3)

    # BOUNDSHEET needs absolute offsets: assemble globals twice
    g0 = _poi_globals(["data", "extra"], [0, 0], sst_payloads)
    off1 = len(g0)
    off2 = off1 + len(sheet1)
    g = _poi_globals(["data", "extra"], [off1, off2], sst_payloads)
    assert len(g) == len(g0)
    return wrap_cfb(g + sheet1 + sheet2)


def test_reader_handles_poi_layout_stream():
    data = _build_poi_workbook()
    errors: list = []
    rows = list(biff.parse_xls_rows(data, errors=errors))
    assert errors == []
    by_sheet: dict[str, list[list[str]]] = {}
    for sheet, _idx, cells in rows:
        by_sheet.setdefault(sheet, []).append(cells)
    assert set(by_sheet) == {"data", "extra"}
    d = by_sheet["data"]
    assert d[0][:2] == ["name", "qty"]
    assert d[1] == ["7", "-3", "1234.56", "2.5", "3.625"]
    # row 2: three MULBLANK cells + the SST string that follows the
    # CONTINUE-split one
    assert d[2][:3] == ["", "", ""]
    assert d[2][3] == "tail"
    assert d[3] == ["42.25", "hello from formula", "TRUE", ""]
    assert d[4][0] == "rich"
    e = by_sheet["extra"]
    assert e[0][0] == "3.14159"
    assert e[0][1:3] == ["11", "22"]


def test_sst_continue_split_mid_string():
    data = _build_poi_workbook()
    rows = {(s, i): c for s, i, c in biff.parse_xls_rows(data)}
    # the long string lives in the SST even though no cell uses it —
    # reaching "tail" (index 3) proves the mid-string CONTINUE parse
    # consumed the split string correctly
    assert rows[("data", 2)][3] == "tail"


def test_poi_layout_through_spark_scan(spark, tmp_path):
    """End-to-end: the POI-layout workbook flows through the same
    read_workbook_rows scan the reference pipeline uses."""
    from shuttlestandalonedbcreator_spark.sources.excel import read_workbook_rows

    p = tmp_path / "poi_like.xls"
    p.write_bytes(_build_poi_workbook())
    df = read_workbook_rows(spark, str(p))
    got = {
        (r["_sheet"], r["_row_index"]): list(r["_cells"])
        for r in df.collect()
    }
    assert got[("data", 1)] == ["7", "-3", "1234.56", "2.5", "3.625"]
    assert got[("data", 3)][1] == "hello from formula"
    assert got[("extra", 0)][:3] == ["3.14159", "11", "22"]


def test_writer_coalesces_rk_runs_into_mulrk(tmp_path):
    """The package writer now emits the run shape a real writer does:
    consecutive RK-encodable ints become ONE MULRK record; singles stay
    RK; interruptions (float/string/None/bool) flush the run."""
    rows = [
        ["h1", "h2", "h3", "h4", "h5"],
        [1, 2, 3, 4, 5],                    # one 5-cell MULRK
        [7, None, 8, 9, 2.5],               # RK, gap, 2-cell MULRK, NUMBER
        [10, "x", 11, True, 12],            # RK, label, RK, bool, RK
    ]
    p = tmp_path / "runs.xls"
    biff.write_xls({"s": rows}, str(p))
    data = p.read_bytes()
    # record-level shape: count MULRK/RK in the workbook stream
    wb = biff.cfb_streams(data)["Workbook"]
    ids = [rid for rid, _p, _o in biff._records(wb)]
    assert ids.count(0x00BD) == 2   # MULRK: row1 run-of-5, row2 run-of-2
    assert ids.count(0x027E) == 4   # RK singles: 7, 10, 11, 12
    # value round-trip through the reader is unchanged
    got = {i: cells for _s, i, cells in biff.parse_xls_rows(data)}
    assert got[1] == ["1", "2", "3", "4", "5"]
    assert got[2] == ["7", "", "8", "9", "2.5"]
    assert got[3] == ["10", "x", "11", "TRUE", "12"]


def test_writer_caps_mulrk_record_size():
    """An out-of-spec 3000-int row must split into <=1369-cell MULRK
    records (BIFF 8224-byte record cap), never one oversized record."""
    rows = [list(range(3000))]
    stream = biff.build_workbook_stream({"s": rows})
    muls = [p for rid, p, _o in biff._records(stream) if rid == 0x00BD]
    assert len(muls) == 3  # 1369 + 1369 + 262
    assert all(len(p) <= 8224 for p in muls)
    got = {i: cells for _s, i, cells in biff.parse_xls_rows(
        biff.wrap_cfb(stream))}
    assert got[0] == [str(v) for v in range(3000)]
