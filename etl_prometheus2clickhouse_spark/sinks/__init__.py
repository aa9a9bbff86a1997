"""Row sinks: local parquet fact table and ClickHouse TabSeparated/HTTP."""
