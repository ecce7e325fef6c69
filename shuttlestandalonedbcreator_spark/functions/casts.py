"""Tolerant cast layer — the typed projection over all-string raw rows.

Reference semantics (SQLiteDirectImporter.java:509-536, 667-706):
- BIGINT columns: trim, parse; empty or junk → NULL  (:522-531)
- TEXT columns: pass through; empty cells REMAIN ''  (:464, :534)
The ''-vs-NULL asymmetry is deliberate and preserved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_long(col: Column) -> Column:
    """Trimmed string → LongType, NULL on empty/junk (null-on-error parse).

    Spark's ANSI-off cast already yields NULL for junk; `try_cast` keeps the
    behavior explicit and ANSI-mode-proof. Whitespace is trimmed first
    (reference trims before Long.parseLong, :525).
    """
    return F.trim(col).try_cast("long")


def text_cell(col: Column) -> Column:
    """TEXT passthrough: missing cell → '' (never NULL) — reference pads
    short rows with "" (:512, :602)."""
    return F.coalesce(col, F.lit(""))
