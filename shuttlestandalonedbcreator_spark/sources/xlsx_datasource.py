"""`spark.read.format("xlsx")` — the Excel scan as a first-class Spark 4
Python DataSource (pyspark.sql.datasource API).

Same parse core as `excel.read_workbook_rows` (S2/S3 scans, stdlib-only),
re-exposed through the catalog-level source interface so the reference's
ingest source composes like any built-in format:

    register_xlsx_source(spark)
    df = (spark.read.format("xlsx")
          .option("sheetPrefix", "Transfer Report")
          .load("/data/source"))

Partitioning: one input partition PER WORKBOOK (the natural parallel unit
— sheet XML inside a file must stream sequentially, files are
independent). The driver lists files; executors each open and parse only
their own workbook, so memory is bounded by one sheet's row regardless of
corpus size. Discovery mirrors S1 (glob + `~*` temp-file exclusion,
SQLiteDirectImporter.java:226-248).

Scope: file listing uses the local/posix filesystem (the reference's
drop-folder contract is a local directory). For object stores, the
binaryFile-based `read_workbook_rows` path covers the same scan with
Hadoop FS discovery.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# module-level binding, NOT an import inside read()/__init__: the reader
# class is instantiated ON THE EXECUTOR, where an import statement would
# re-enter the import machinery with no repo on sys.path (NOTES.md fact
# #4). As module-level globals of a by-value-registered module, these
# function objects travel inside the pickled class instead.
from shuttlestandalonedbcreator_spark.sources.biff import parse_xls_rows
from shuttlestandalonedbcreator_spark.sources.excel import parse_xlsx_rows

RAW_SCHEMA = "_source_file string, _sheet string, _row_index int, _cells array<string>"


class _WorkbookPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xlsx source requires a path: .load('<dir-or-file>')")
        self.sheet_prefix = options.get("sheetprefix")
        self.glob = options.get("glob", "*.xls*")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if fnmatch.fnmatch(f, self.glob) and not f.startswith("~")
            )
        else:
            files = [self.path]
        return [_WorkbookPartition(p) for p in files]

    def read(self, partition: _WorkbookPartition):
        with open(partition.path, "rb") as fh:
            data = fh.read()
        parse = (
            parse_xls_rows
            if partition.path.lower().endswith(".xls")
            else parse_xlsx_rows
        )
        fname = os.path.basename(partition.path)
        for sheet, row_idx, cells in parse(data, self.sheet_prefix):
            yield (fname, sheet, row_idx, cells)


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> XlsxReader:
        return XlsxReader(self.options)


def register_xlsx_source(spark: SparkSession) -> None:
    """Register the format (idempotent). Ships the parse modules by value
    so executor pythons need no repo checkout (NOTES.md fact #4)."""
    import shuttlestandalonedbcreator_spark.sources.biff as _biff
    import shuttlestandalonedbcreator_spark.sources.excel as _excel
    import shuttlestandalonedbcreator_spark.sources.numfmt as _numfmt
    import shuttlestandalonedbcreator_spark.sources.xlsx_datasource as _self
    from pyspark.cloudpickle import register_pickle_by_value

    # numfmt too: excel.py references it at module level, so the pickled
    # class graph reaches it — by reference (ModuleNotFoundError on a
    # worker with no repo checkout) unless registered by value here
    for mod in (_biff, _excel, _numfmt, _self):
        register_pickle_by_value(mod)
    spark.dataSource.register(XlsxDataSource)
