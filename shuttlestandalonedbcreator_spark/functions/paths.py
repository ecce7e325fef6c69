"""Path-derivation scalar functions.

Parity targets (reference semantics, cited file:line into /root/reference):
- ``path_level``            ≅ `calculateLevel`   — SQLiteDirectImporter.java:954-965
- ``parent_folder``         ≅ `getParentFolder`  — SQLiteDirectImporter.java:967-982
- ``job_name_from_filename``≅ `extractJobName`   — SQLiteDirectImporter.java:935-943
- ``sanitize_view_name``    ≅ `sanitizeViewName` — SQLiteDirectImporter.java:921-930

All are pure Column expressions (codegen'd JVM-side), safe at any scale —
no shuffle, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_level(col: Column) -> Column:
    """Number of path segments after stripping ONE leading '/'.

    ``"/a/b/c.txt"`` → 3, ``"f.txt"`` → 1, ``""``/NULL → 0.
    Reference: strip one leading slash, split on '/', count segments
    (SQLiteDirectImporter.java:954-965).
    """
    stripped = F.regexp_replace(col, "^/", "")
    return (
        F.when(col.isNull() | (F.trim(col) == ""), F.lit(0))
        .otherwise(F.size(F.split(stripped, "/")))
        .cast("int")
    )


def parent_folder(col: Column) -> Column:
    """Substring of the original path before its LAST '/'.

    NULL when level <= 1 or when the last '/' is at position 0 (e.g. "/x")
    — both guards from SQLiteDirectImporter.java:972-981. Keeps the leading
    slash: "/a/b.txt" → "/a".
    """
    # last-'/' position in 1-based terms: len - len(tail-after-last-slash) - 1
    tail = F.substring_index(col, "/", -1)
    head_len = F.length(col) - F.length(tail) - F.lit(1)
    candidate = F.substring(col, 1, head_len)
    return (
        F.when(col.isNull() | (path_level(col) <= 1), F.lit(None).cast("string"))
        .when(head_len <= 0, F.lit(None).cast("string"))  # lastIndexOf('/') <= 0
        .otherwise(candidate)
    )


def job_name_from_filename(col: Column) -> Column:
    """Workbook filename minus a case-sensitive .xlsx/.xls extension, trimmed;
    NULL/empty → 'Unknown' (SQLiteDirectImporter.java:935-943)."""
    stripped = F.trim(F.regexp_replace(col, r"\.(xlsx|xls)$", ""))
    return F.when(col.isNull() | (stripped == ""), F.lit("Unknown")).otherwise(stripped)


def sanitize_view_name(status: str | None) -> str:
    """Driver-side (names, not data) — exact reference semantics
    (SQLiteDirectImporter.java:921-930): NULL/blank input → 'unknown';
    else lowercase, non-[a-z0-9_] → '_', collapse runs, strip ONE leading
    and ONE trailing '_' (Java `replaceAll("^_|_$", "")`). Can return ''
    (e.g. '!!!'), in which case the caller skips the view (:894)."""
    if status is None or status.strip() == "":
        return "unknown"
    s = status.lower()
    s = re.sub(r"[^a-z0-9_]", "_", s)
    s = re.sub(r"_+", "_", s)
    return re.sub(r"^_|_$", "", s)
