"""Sources/sinks: Iceberg-first with parquet stand-in for local tests."""
