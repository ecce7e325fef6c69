"""Excel serial-date conversion.

Reference: `convertExcelDateToSQLite` (SQLiteDirectImporter.java:984-1006)
parses the cell as a double; 0 / unparseable / empty → NULL; otherwise the
POI 1900-date-system serial is rendered as 'yyyy-MM-dd HH:mm:ss'.

POI's `DateUtil.getJavaDate` maps serial day 1 → 1900-01-01 and carries the
Lotus-1-2-3 leap-year bug (ghost 1900-02-29 at serial 60), which makes
``timestamp'1899-12-30' + serial days`` exact for every serial >= 61 — i.e.
all of 1900-03-01 onward, the only range real transfer data occupies
(SURVEY.md §1.2). We normalize rendering to UTC (the reference uses the
system default zone, :1000 — an environment dependency, not a semantic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epoch from which `serial` days are added (POI 1900 system, serial >= 61).
EXCEL_EPOCH = "1899-12-30"


def excel_serial_to_timestamp(col: Column) -> Column:
    """Serial-number column (string or numeric) → TimestampType.

    NULL on: NULL input, empty/blank, unparseable, or serial == 0 —
    exactly the reference's guards (:985-989, :1003-1004). Sub-day
    fractions resolve to whole seconds (the reference renders seconds
    precision, :1001).
    """
    serial = col.try_cast("double")  # unparseable strings → NULL (ANSI-safe)
    seconds = F.round(serial * 86400).cast("long")
    ts = F.to_timestamp(F.lit(EXCEL_EPOCH)) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), seconds.cast("double")
    )
    return F.when(serial.isNull() | (serial == 0), F.lit(None).cast("timestamp")).otherwise(ts)
