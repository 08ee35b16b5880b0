from powerdatapipeline_spark.sources.readers import (  # noqa: F401
    audit_nulls,
    check_columns,
    read_csv,
    read_parquet,
    load_tables,
    write_csv,
    write_parquet,
)
