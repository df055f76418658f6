from doreisa_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet_partitioned,
)
