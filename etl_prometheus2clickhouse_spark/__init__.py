"""PySpark-native analytics/ETL engine with the capabilities of
disafronov/etl-prometheus2clickhouse (reference at /root/reference, v5.1.6).

Architecture (Spark-first, NOT a port — see SURVEY.md):

- ``schemas``    — explicit StructTypes for the Prometheus response, the
                   metrics fact table and the ETL state table
                   (reference DDL: README.md:119-178).
- ``config``     — env-var config mirroring reference config.py:19-192
                   (same variable names, defaults and bounds).
- ``functions``  — column-expression recipes: lenient Float64 cast with
                   NaN/Inf spellings (reference etl_job.py:664-717),
                   label-map restructuring (etl_job.py:611-625), TSV
                   escaping / float-format golden parity
                   (etl_job.py:762-844).
- ``operators``  — DataFrame→DataFrame transforms: the Prometheus
                   response parser (replaces the ijson event pump at
                   etl_job.py:545-738 with from_json + double explode),
                   plus the large-scale data-pipeline layer (dedup,
                   similarity search, text analysis, multimodal).
- ``sources``    — Spark 4 Python DataSource for partitioned Prometheus
                   query_range reads (replaces prometheus_client.py),
                   and the watermark/lease state store
                   (clickhouse_client.py:219-693) with a local backend.
- ``sinks``      — parquet fact-table sink and ClickHouse TSV/HTTP sink
                   (clickhouse_client.py:131-217 wire parity).
- ``streaming``  — the run_once batch job and the Structured Streaming
                   foreachBatch variant with write-then-commit ordering
                   (etl_job.py:65-186).
"""

__version__ = "0.1.0"
