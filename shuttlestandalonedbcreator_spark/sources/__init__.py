from shuttlestandalonedbcreator_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
