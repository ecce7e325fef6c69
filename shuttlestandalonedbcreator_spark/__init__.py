"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `jacquesvandermerwe/ShuttleStandaloneDBCreator`
(an Excel→SQLite ETL + SQL-view query surface), re-expressed Spark-first,
plus large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    — SparkSession factory tuned for the scale profile.
- ``functions``  — column-expression builders (paths, excel dates, casts,
                   text metrics, vector math). All JVM-side built-ins; no
                   row-at-a-time Python UDFs in hot paths.
- ``sources``    — table registry over the driver's parquet, Excel-workbook
                   reader (gated), file-discovery / archive protocol.
- ``operators``  — dedup (exact/last-wins/MinHash-LSH/SimHash/Jaccard),
                   hierarchy closure, summaries, joins, similarity search.
- ``plans``      — end-to-end pipelines (transfer-report ingest) and the
                   view surface (static + dynamic status views).
- ``streaming``  — Structured Streaming: file-drop protocol, windowed aggs.
"""

__version__ = "0.1.0"

from shuttlestandalonedbcreator_spark.session import get_spark  # noqa: F401
