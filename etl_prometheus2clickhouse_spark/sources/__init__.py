"""Data sources: the partitioned Prometheus DataSource and the
watermark/lease state store (local and ClickHouse backends)."""
