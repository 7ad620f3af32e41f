from etl_mini_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_ndjson,
    read_parquet,
    source_exists,
)
from etl_mini_spark.sources.writers import (  # noqa: F401
    write_ndjson,
    write_partitioned_by_type_date,
    write_run_layout,
)
from etl_mini_spark.sources.jdbc import write_jdbc_append, copy_into_postgres  # noqa: F401
