"""Column-expression builders — the engine's scalar-function surface.

Everything here returns `pyspark.sql.Column` built from JVM-side built-ins
(whole-stage-codegen friendly); nothing is a row-at-a-time Python UDF.
"""

from shuttlestandalonedbcreator_spark.functions.paths import (  # noqa: F401
    path_level,
    parent_folder,
    job_name_from_filename,
    sanitize_view_name,
)
from shuttlestandalonedbcreator_spark.functions.dates import (  # noqa: F401
    excel_serial_to_timestamp,
)
from shuttlestandalonedbcreator_spark.functions.casts import (  # noqa: F401
    try_long,
    text_cell,
)
