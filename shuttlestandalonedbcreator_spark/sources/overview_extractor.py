"""S9 with byte-level fidelity: extract one sheet into a new workbook
while PRESERVING charts, drawings, media, styles, and theme — the
reference extractor's whole purpose (TransferOverviewExtractor.java:
303-478 does the same ZIP-entry copy + workbook.xml rewrite).

Strategy (mirrors the reference's second pass):

- stream the source ZIP entry-by-entry (never inflate the workbook into
  a DOM — the reference's bounded-memory claim, :302-324);
- copy essential parts verbatim: [Content_Types].xml, _rels/.rels,
  docProps/*, xl/sharedStrings.xml, xl/styles.xml, xl/theme/*,
  xl/media/*, xl/drawings/* and xl/charts/* (including their _rels);
- copy ONLY the target sheet's worksheet part + its relationships;
- rewrite xl/workbook.xml keeping only the target <sheet> element
  (sheetId forced to 1, matching :445-455) and
  xl/_rels/workbook.xml.rels keeping every non-worksheet relationship
  plus the target's (:461-478).

Two deliberate improvements over the reference (noted for parity
review, both strictly safer artifacts):

- sheet elements are located by XML parsing of workbook.xml, not by the
  reference's regex (its `name="(?!Overview")` pattern breaks on
  attribute reordering and XML-escaped names);
- [Content_Types].xml Override entries for REMOVED worksheet parts are
  filtered out (the reference leaves them dangling, which makes strict
  OOXML readers flag the file for repair).

The data-only path (`excel.extract_sheet`) remains the distributed
variant; this one is driver/exec-local file IO, exactly like the
reference binary — wrap it in `mapInPandas` over `binaryFile` paths to
fan out over a directory of workbooks.
"""

from __future__ import annotations

import posixpath
import re
import shutil
import xml.etree.ElementTree as ET
import zipfile

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CT_NS = "http://schemas.openxmlformats.org/package/2006/content-types"

_ESSENTIAL_EXACT = frozenset(
    {"[Content_Types].xml", "_rels/.rels", "xl/sharedStrings.xml", "xl/styles.xml"}
)
_ESSENTIAL_PREFIXES = (
    "docProps/",
    "xl/theme/",
    "xl/media/",
    "xl/drawings/",
    "xl/charts/",
)


def _sheet_part_of(zf: zipfile.ZipFile, sheet_name: str) -> str | None:
    """Resolve ``sheet_name`` → its worksheet part path (e.g.
    ``xl/worksheets/sheet3.xml``) via workbook.xml + its rels — the same
    name→r:id→Target walk the reference's first pass does (:242-275)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rid = None
    for sheet in wb.iter(f"{{{_MAIN_NS}}}sheet"):
        if sheet.get("name") == sheet_name:
            rid = sheet.get(f"{{{_REL_NS}}}id")
            break
    if rid is None:
        return None
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter(f"{{{_PKG_REL_NS}}}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target", "")
            if target.startswith("/"):
                return target.lstrip("/")
            return posixpath.normpath(posixpath.join("xl", target))
    return None


def _rewrite_workbook_xml(data: bytes, sheet_name: str) -> bytes:
    """Drop every <sheet> except ``sheet_name``; force its sheetId to 1.

    String surgery on the sheet elements only (the rest of workbook.xml
    — views, defined names, calcPr — passes through byte-identical),
    but the KEEP decision comes from parsed attributes, not a regex over
    raw attribute text."""
    text = data.decode("utf-8")

    def keep(m: re.Match) -> str:
        frag = m.group(0)
        attrs = ET.fromstring(frag.replace("r:id=", f'xmlns:r="{_REL_NS}" r:id='))
        if attrs.get("name") != sheet_name:
            return ""
        return re.sub(r'sheetId="[^"]*"', 'sheetId="1"', frag)

    # both legal OOXML spellings: self-closing <sheet .../> AND the
    # paired <sheet ...></sheet> some writers emit
    return re.sub(
        r"<sheet\b[^>]*/>|<sheet\b[^>]*>.*?</sheet\s*>", keep, text, flags=re.S
    ).encode("utf-8")


def _rewrite_workbook_rels(data: bytes, keep_target: str) -> bytes:
    """Keep all non-worksheet relationships + the one worksheet rel whose
    Target resolves to ``keep_target``."""
    root = ET.fromstring(data)
    kept = []
    for rel in root.iter(f"{{{_PKG_REL_NS}}}Relationship"):
        rtype = rel.get("Type", "")
        target = rel.get("Target", "")
        resolved = (
            target.lstrip("/")
            if target.startswith("/")
            else posixpath.normpath(posixpath.join("xl", target))
        )
        if rtype.endswith("/worksheet") and resolved != keep_target:
            continue
        kept.append(
            f'<Relationship Id="{rel.get("Id")}" Type="{rtype}" Target="{target}"/>'
        )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">{"".join(kept)}</Relationships>'
    ).encode("utf-8")


def _rewrite_content_types(data: bytes, dropped_parts: set[str]) -> bytes:
    """Filter Override entries pointing at removed worksheet parts."""
    root = ET.fromstring(data)
    out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    out.append(f'<Types xmlns="{_CT_NS}">')
    for child in root:
        tag = child.tag.rsplit("}", 1)[-1]
        if tag == "Default":
            out.append(
                f'<Default Extension="{child.get("Extension")}" '
                f'ContentType="{child.get("ContentType")}"/>'
            )
        elif tag == "Override":
            part = child.get("PartName", "").lstrip("/")
            if part in dropped_parts:
                continue
            out.append(
                f'<Override PartName="{child.get("PartName")}" '
                f'ContentType="{child.get("ContentType")}"/>'
            )
    out.append("</Types>")
    return "".join(out).encode("utf-8")


def extract_sheet_preserving(
    in_path: str, out_path: str, sheet_name: str = "Overview"
) -> bool:
    """Create ``out_path`` containing only ``sheet_name`` with all its
    charts/drawings/media/styles preserved byte-for-byte. Returns False
    (writing nothing) when the sheet is absent — the reference's
    "No Overview sheet found" path (:221-224)."""
    with zipfile.ZipFile(in_path) as zin:
        keep_part = _sheet_part_of(zin, sheet_name)
        if keep_part is None:
            return False
        names = set(zin.namelist())
        keep_rels = (
            f"xl/worksheets/_rels/{posixpath.basename(keep_part)}.rels"
        )
        # dropped = EVERY part not copied into the output (other
        # worksheets, calcChain.xml, pivot caches, ...) — their
        # Content_Types Overrides would dangle otherwise, the strict-
        # reader repair flag this module exists to avoid
        copied = {
            n
            for n in names
            if n in (keep_part, keep_rels)
            or n in _ESSENTIAL_EXACT
            or n.startswith(_ESSENTIAL_PREFIXES)
        } | {"xl/workbook.xml", "xl/_rels/workbook.xml.rels"}
        dropped = names - copied
        with zipfile.ZipFile(
            out_path, "w", compression=zipfile.ZIP_DEFLATED
        ) as zout:
            for info in zin.infolist():
                name = info.filename
                if name == "xl/workbook.xml":
                    zout.writestr(
                        name, _rewrite_workbook_xml(zin.read(name), sheet_name)
                    )
                elif name == "xl/_rels/workbook.xml.rels":
                    zout.writestr(
                        name, _rewrite_workbook_rels(zin.read(name), keep_part)
                    )
                elif name == "[Content_Types].xml":
                    zout.writestr(
                        name, _rewrite_content_types(zin.read(name), dropped)
                    )
                elif name == keep_part or name == keep_rels:
                    _copy_entry(zin, zout, info)
                elif name in _ESSENTIAL_EXACT or name.startswith(
                    _ESSENTIAL_PREFIXES
                ):
                    _copy_entry(zin, zout, info)
                # everything else (other sheets + their rels, calcChain,
                # pivot caches...) is skipped, like the reference
    return True


def _copy_entry(
    zin: zipfile.ZipFile, zout: zipfile.ZipFile, info: zipfile.ZipInfo
) -> None:
    """Stream one entry through without inflating it into memory."""
    zi = zipfile.ZipInfo(info.filename, date_time=info.date_time)
    zi.compress_type = zipfile.ZIP_DEFLATED
    with zin.open(info) as src, zout.open(zi, "w") as dst:
        shutil.copyfileobj(src, dst, 64 * 1024)
