from iceberg_relative_io_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
