"""Excel number-format rendering — POI ``DataFormatter`` parity for the
XLSX scan's ``formatted=True`` option.

The reference inserts the FORMATTED cell text, not the stored value
(`DataFormatter.formatCellValue`, SQLiteDirectImporter.java:457-465,
:948-952). Our default scan surfaces raw stored strings (identical for
every cell shape the transfer schema produces); this module closes the
remaining deviation for workbooks that carry number formats on
TEXT-bound columns.

Scope: the common format-code grammar —
- General (Excel's significant-digit rendering),
- fixed decimals / thousands grouping (``0``, ``0.00``, ``#,##0``...),
- percent (``0%``, ``0.00%``),
- scientific (``0.00E+00``),
- text (``@``),
- date/time masks (built-ins 14-22 and 45-47, plus custom y/m/d/h/s
  masks; month-vs-minute disambiguated by the neighbouring h/s token,
  ``[h]`` elapsed hours, AM/PM),
- multi-section codes (positive;negative;zero), quoted literals,
  ``\\``/``_``/``*`` escapes, [Red]-style modifiers (stripped).

Out of scope (returns the General rendering): fraction formats
(``# ?/?``), locale currency prefixes beyond literal text, and color
conditions — none appear in transfer reports.

Rounding is HALF-UP, matching POI's Excel-style rounding mode
(``DataFormatter`` sets ``RoundingMode.HALF_UP`` on its decimal
formats), not Java's default half-even.

Dates use the POI 1900 system consistent with
``functions/dates.py:excel_serial_to_timestamp``: serial >= 61 is exact
from epoch 1899-12-30; the ghost 1900-02-29 range below is out of real
data's range and renders via the same epoch.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import ROUND_HALF_UP, Decimal

# Built-in format ids (ECMA-376 §18.8.30) — the subset POI ships.
BUILTIN_FORMATS: dict[int, str] = {
    0: "General",
    1: "0",
    2: "0.00",
    3: "#,##0",
    4: "#,##0.00",
    9: "0%",
    10: "0.00%",
    11: "0.00E+00",
    12: "# ?/?",
    13: "# ??/??",
    14: "m/d/yy",
    15: "d-mmm-yy",
    16: "d-mmm",
    17: "mmm-yy",
    18: "h:mm AM/PM",
    19: "h:mm:ss AM/PM",
    20: "h:mm",
    21: "h:mm:ss",
    22: "m/d/yy h:mm",
    37: "#,##0;(#,##0)",
    38: "#,##0;[Red](#,##0)",
    39: "#,##0.00;(#,##0.00)",
    40: "#,##0.00;[Red](#,##0.00)",
    45: "mm:ss",
    46: "[h]:mm:ss",
    47: "mm:ss.0",
    48: "##0.0E+0",
    49: "@",
}

_EXCEL_EPOCH = _dt.datetime(1899, 12, 30)

_MONTHS = (
    "January February March April May June July August "
    "September October November December"
).split()
_DAYS = "Monday Tuesday Wednesday Thursday Friday Saturday Sunday".split()


def parse_styles(styles_xml: bytes | None) -> list[str]:
    """styles.xml → format code per cell-xf index (the cell's ``s``
    attribute indexes this list)."""
    if not styles_xml:
        return []
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    root = ET.fromstring(styles_xml)
    custom = {
        int(nf.get("numFmtId")): nf.get("formatCode", "General")
        for nf in root.iter(f"{ns}numFmt")
    }
    out: list[str] = []
    cellxfs = root.find(f"{ns}cellXfs")
    if cellxfs is None:
        return []
    for xf in cellxfs.iter(f"{ns}xf"):
        fmt_id = int(xf.get("numFmtId", "0"))
        out.append(custom.get(fmt_id) or BUILTIN_FORMATS.get(fmt_id, "General"))
    return out


def _split_sections(code: str) -> list[str]:
    """Split on ';' outside quotes/brackets (pos;neg;zero;text)."""
    sections, buf, in_q, in_b = [], [], False, False
    for ch in code:
        if ch == '"' and not in_b:
            in_q = not in_q
        elif ch == "[" and not in_q:
            in_b = True
        elif ch == "]" and not in_q:
            in_b = False
        if ch == ";" and not in_q and not in_b:
            sections.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    sections.append("".join(buf))
    return sections


def _strip_modifiers(section: str) -> str:
    """Remove [Red]/[>=100]-style bracket modifiers, but KEEP elapsed
    time tokens [h]/[m]/[s] (any repeat count)."""
    return re.sub(r"\[(?![hHmMsS]+\])[^\]]*\]", "", section)


def is_date_format(code: str) -> bool:
    """POI ``DateUtil.isADateFormat`` shape: a section containing
    y/m/d/h/s date tokens outside quotes and not a number grammar."""
    section = _strip_modifiers(_split_sections(code)[0])
    # drop quoted literals and escapes before probing
    bare = re.sub(r'"[^"]*"|\\.|_.|\*.', "", section)
    if re.search(r"[0#?]", bare):
        return False
    return re.search(r"[ymdhsYMDHS]", bare) is not None


def serial_to_datetime(serial: float) -> _dt.datetime:
    """POI 1900-system serial → datetime (UTC-naive), whole seconds —
    same epoch arithmetic as excel_serial_to_timestamp."""
    seconds = int(Decimal(repr(serial * 86400)).quantize(0, ROUND_HALF_UP))
    return _EXCEL_EPOCH + _dt.timedelta(seconds=seconds)


# --- date mask rendering ---------------------------------------------------

_DATE_TOKEN = re.compile(
    r'("(?:[^"]*)")|(\[[hHmMsS]+\])|([yY]+|[mM]+|[dD]+|[hH]+|[sS]+)'
    r"|(AM/PM|am/pm|A/P|a/p)|(\.0+)|(\\.)|(.)"
)


def _render_date(code: str, dt: _dt.datetime, serial: float) -> str:
    out: list[str] = []
    tokens = [m for m in _DATE_TOKEN.finditer(code)]
    # classify every m-run: minutes iff previous date token is hours or
    # next date token is seconds (POI's disambiguation)
    kinds: list[str | None] = []
    for m in tokens:
        t = m.group(3)
        kinds.append(t[0].lower() if t else None)
    has_ampm = any(m.group(4) for m in tokens)

    def nearest(idx: int, step: int) -> str | None:
        j = idx + step
        while 0 <= j < len(kinds):
            if kinds[j] is not None:
                return kinds[j]
            j += step
        return None

    for i, m in enumerate(tokens):
        quoted, elapsed, run, ampm, frac, esc, lit = m.groups()
        if quoted is not None:
            out.append(quoted[1:-1])
        elif elapsed is not None:
            unit = elapsed[1].lower()
            total = serial * 86400
            if unit == "h":
                out.append(str(int(total // 3600)))
            elif unit == "m":
                out.append(str(int(total // 60)))
            else:
                out.append(str(int(round(total))))
        elif run is not None:
            k, n = run[0].lower(), len(run)
            if k == "y":
                out.append(f"{dt.year % 100:02d}" if n <= 2 else f"{dt.year:04d}")
            elif k == "d":
                if n >= 4:
                    out.append(_DAYS[dt.weekday()])
                elif n == 3:
                    out.append(_DAYS[dt.weekday()][:3])
                else:
                    out.append(f"{dt.day:0{min(n, 2)}d}")
            elif k == "h":
                h = dt.hour
                if has_ampm:
                    h = h % 12 or 12
                out.append(f"{h:0{min(n, 2)}d}")
            elif k == "s":
                out.append(f"{dt.second:0{min(n, 2)}d}")
            else:  # m: month or minute
                prev_k, next_k = nearest(i, -1), nearest(i, +1)
                minutes = prev_k == "h" or next_k == "s"
                if minutes:
                    out.append(f"{dt.minute:0{min(n, 2)}d}")
                elif n >= 4:
                    out.append(_MONTHS[dt.month - 1])
                elif n == 3:
                    out.append(_MONTHS[dt.month - 1][:3])
                else:
                    out.append(f"{dt.month:0{min(n, 2)}d}")
        elif ampm is not None:
            mark = "AM" if dt.hour < 12 else "PM"
            out.append(mark if ampm[0].isupper() else mark.lower())
        elif frac is not None:
            sub = serial * 86400
            fraction = sub - int(sub)
            digits = len(frac) - 1
            out.append("." + f"{fraction:.{digits}f}"[2 : 2 + digits])
        elif esc is not None:
            out.append(esc[1])
        else:
            out.append(lit)
    return "".join(out)


# --- number grammar rendering ----------------------------------------------


def _render_number(code: str, x: float) -> str:
    """Render ``x`` (non-negative; sign handled by section choice) with a
    single number-grammar section."""
    # literals out, structure kept
    pct = 0
    structural: list[str] = []
    literals: dict[int, str] = {}
    i = 0
    while i < len(code):
        ch = code[i]
        if ch == '"':
            j = code.index('"', i + 1)
            literals[len(structural)] = code[i + 1 : j]
            structural.append("\x01")
            i = j + 1
            continue
        if ch in "\\_":
            nxt = code[i + 1] if i + 1 < len(code) else ""
            literals[len(structural)] = " " if ch == "_" else nxt
            structural.append("\x01")
            i += 2
            continue
        if ch == "*":
            i += 2  # fill char: drop (no column width here)
            continue
        if ch == "%":
            pct += 1
        structural.append(ch)
        i += 1
    s = "".join(structural)

    if pct:
        x = x * (100**pct)

    # scientific?
    m_sci = re.search(r"([0#.,]+)E([+-])(0+)", s, re.IGNORECASE)
    if m_sci:
        mant_fmt = m_sci.group(1)
        exp_digits = len(m_sci.group(3))
        exp = 0
        v = x
        if v != 0:
            while abs(v) >= 10:
                v /= 10
                exp += 1
            while abs(v) < 1:
                v *= 10
                exp -= 1
        dec = mant_fmt.split(".")[1] if "." in mant_fmt else ""
        mant = _fixed(v, len(dec))
        sign = "+" if exp >= 0 else "-"
        if m_sci.group(2) == "-" and exp >= 0:
            sign = ""
        body = f"{mant}E{sign}{abs(exp):0{exp_digits}d}"
        return (
            s[: m_sci.start()] + body + s[m_sci.end() :]
        ).replace("\x01", "\x00").replace("\x00", "")

    int_fmt, _, dec_fmt = s.partition(".")
    group = "," in int_fmt
    int_digits = int_fmt.replace(",", "")
    min_int = sum(1 for c in int_digits if c == "0")
    dec_places = sum(1 for c in dec_fmt if c in "0#")
    min_dec = sum(1 for c in dec_fmt if c == "0")

    body = _fixed(x, dec_places)
    ip, _, dp = body.partition(".")
    dp = dp.rstrip("#")
    # trim optional decimal digits (the '#' tail)
    while len(dp) > min_dec and dp.endswith("0"):
        dp = dp[:-1]
    if len(ip) < min_int:
        ip = "0" * (min_int - len(ip)) + ip
    if ip == "" and min_int == 0:
        ip = ""  # '#.##' style keeps empty integer part for 0.x? Excel: '.5'
    if group:
        ip = _group(ip)
    num = ip + ("." + dp if dp else "")

    # splice the rendered number back over the digit placeholders: replace
    # the FIRST run of digit grammar with `num`, drop remaining grammar
    out: list[str] = []
    placed = False
    idx = 0
    for pos, ch in enumerate(s):
        if ch in "0#?,." or (ch == "," and group):
            if not placed:
                out.append(num)
                placed = True
            continue
        if ch == "\x01":
            out.append(literals.get(pos, ""))
        elif ch == "%":
            out.append("%")
        else:
            out.append(ch)
        idx += 1
    if not placed:
        out.append(num)
    return "".join(out)


def _fixed(x: float, places: int) -> str:
    """Half-up fixed-point string (POI's Excel-style rounding)."""
    q = Decimal(1).scaleb(-places) if places else Decimal(1)
    d = Decimal(repr(x)).quantize(q, ROUND_HALF_UP)
    s = f"{d:f}"
    if places == 0 and "." in s:
        s = s.split(".")[0]
    return s


def _group(ip: str) -> str:
    if len(ip) <= 3:
        return ip
    out = []
    while len(ip) > 3:
        out.append(ip[-3:])
        ip = ip[:-3]
    out.append(ip)
    return ",".join(reversed(out))


def _general(x: float) -> str:
    """Excel 'General': integers bare, else up to 11 significant digits
    with trailing zeros trimmed (POI renders via its general rule)."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    s = f"{x:.11g}"
    if "e" in s or "E" in s:
        # Excel general switches to scientific for very large/small
        mant, _, exp = s.partition("e")
        mant = mant.rstrip("0").rstrip(".")
        e = int(exp)
        return f"{mant}E{'+' if e >= 0 else '-'}{abs(e):02d}"
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def format_number(raw: str, code: str | None) -> str:
    """POI ``DataFormatter.formatCellValue`` for a NUMERIC cell: apply
    ``code`` to the stored value; General/None falls back to the
    significant-digit rendering. Returns ``raw`` unchanged when the
    value does not parse (defensive — malformed files)."""
    try:
        x = float(raw)
    except (TypeError, ValueError):
        return raw
    if code is None or code.strip().lower() == "general":
        return _general(x)
    if is_date_format(code):
        section = _strip_modifiers(_split_sections(code)[0])
        return _render_date(section, serial_to_datetime(x), x)
    sections = [_strip_modifiers(s) for s in _split_sections(code)]
    if x > 0 or (x == 0 and len(sections) < 3):
        section = sections[0]
        val = x
    elif x < 0:
        section = sections[1] if len(sections) > 1 else sections[0]
        val = abs(x)
        if len(sections) == 1:
            return "-" + _render_section_or_general(section, val)
    else:
        section = sections[2]
        val = 0.0
    return _render_section_or_general(section, val)


def _render_section_or_general(section: str, val: float) -> str:
    if section.strip().lower() == "general" or not section.strip():
        return _general(val)
    if "@" in section:
        return section.replace("@", _general(val))
    if "/" in re.sub(r'"[^"]*"', "", section):
        return _general(val)  # fraction grammar: out of scope
    return _render_number(section, val)
