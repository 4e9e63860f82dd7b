from iceberg_relative_io_spark.catalog.paths import absolute_location, relative_location  # noqa: F401
from iceberg_relative_io_spark.catalog.fileio import RelativeFileIO  # noqa: F401
from iceberg_relative_io_spark.catalog.table_ops import (  # noqa: F401
    CommitFailedError,
    TableOperations,
)
from iceberg_relative_io_spark.catalog.fs_catalog import FsCatalog  # noqa: F401
from iceberg_relative_io_spark.catalog.jdbc_catalog import JdbcCatalog  # noqa: F401
from iceberg_relative_io_spark.catalog.spark_table import RelativeTable  # noqa: F401
from iceberg_relative_io_spark.catalog.sql_frontend import RelativeSqlSession  # noqa: F401
