"""ClickHouse TabSeparated/HTTP sink (reference clickhouse_client.py:131-217).

Wire parity: rows are serialized to exactly the reference's TSV line shape
``<ts %.6f>\\t<name esc>\\t<['k',..]>\\t<['v',..]>\\t<float no-sci>\\n``
(etl_job.py:726-732) using the golden-tested expressions in functions/tsv,
then POSTed as ``INSERT INTO <t> FORMAT TabSeparated``. Empty batches
short-circuit without touching the network (clickhouse_client.py:166-170).

Two write paths:

- ``distributed=True`` (default, the 100 TB path): each partition POSTs
  its own TSV batches from the executor inside ``mapInPandas`` — N
  parallel inserts, no driver bottleneck, exactly how a ClickHouse bulk
  loader wants to be fed (many moderate inserts into a MergeTree). The
  upload is driven by a single *DataFrame* action (``collect`` of the
  per-partition posted counts), so upstream ``observe`` counters fire on
  the same pass — ``foreachPartition`` would run via the RDD path, which
  never emits SQL observed-metrics events and deadlocks
  ``Observation.get`` (streaming/job.py).
- ``distributed=False`` (reference-parity path): one request streaming
  all rows through the driver — byte-identical to the reference's single
  ``--data-binary`` upload; useful for wire-level golden tests.

Idempotency is inherited from the target table being a
ReplacingMergeTree over the content hash, exactly like the reference
(README.md:96-113): at-least-once POSTs, exactly-once effect. With
``dedup_tokens=True`` each POST additionally carries a
content-addressed ``insert_deduplication_token`` (md5 of the body), so
a retried task re-POSTing an identical block is dropped server-side
inside ClickHouse's block-dedup window — exactly-once RAW rows, before
any merge, on top of (never instead of) the RMT contract.
"""

from __future__ import annotations

import urllib.parse
import urllib.request
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.functions import (
    escape_tsv,
    format_clickhouse_array,
    format_float_udf,
    format_timestamp_6f,
)
from etl_prometheus2clickhouse_spark.operators.transform import rows_to_sink_shape
from etl_prometheus2clickhouse_spark.sources.state_store import validate_table_name


def rows_to_tsv_lines(rows: DataFrame) -> DataFrame:
    """Fact rows → single-column ``line`` DataFrame in reference TSV shape
    (etl_job.py:726-732). All JVM expressions except the no-sci float
    format (vectorized pandas UDF)."""
    sink = rows_to_sink_shape(rows)
    return sink.select(
        F.concat_ws(
            "\t",
            format_timestamp_6f("timestamp"),
            escape_tsv("name"),
            format_clickhouse_array("labels_key"),
            format_clickhouse_array("labels_value"),
            format_float_udf("value"),
        ).alias("line")
    )


def _post_tsv(
    url: str,
    table: str,
    body: bytes,
    user: str | None,
    password: str | None,
    timeout: int,
    insecure: bool = False,
    dedup_token: str | None = None,
) -> None:
    params = {"query": f"INSERT INTO {table} FORMAT TabSeparated"}
    if dedup_token is not None:
        # ClickHouse block-level retry idempotency: the server keeps a
        # window of recent block tokens per partition and silently
        # drops a re-inserted block whose token it has seen
        # (``insert_deduplication_token``, public HTTP-interface
        # setting) — the duplicate never lands, even before any
        # ReplacingMergeTree merge
        params["insert_deduplication_token"] = dedup_token
    req = urllib.request.Request(
        f"{url.rstrip('/')}/?{urllib.parse.urlencode(params)}",
        data=body,
        method="POST",
    )
    if user is not None:
        req.add_header("X-ClickHouse-User", user)
        req.add_header("X-ClickHouse-Key", password or "")
    # CLICKHOUSE_INSECURE parity: skip TLS certificate verification
    # (reference clickhouse_client.py:55-85, verify=False path).
    ctx = None
    if insecure and url.startswith("https"):
        import ssl

        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    with urllib.request.urlopen(  # nosec B310
        req, timeout=timeout, context=ctx
    ) as resp:
        resp.read()


class ClickHouseHttpSink:
    def __init__(
        self,
        url: str,
        table: str = "default.metrics",
        user: str | None = None,
        password: str | None = None,
        send_receive_timeout: int = 300,
        distributed: bool = True,
        batch_rows: int = 100_000,
        insecure: bool = False,
        dedup_tokens: bool = False,
    ) -> None:
        validate_table_name(table, "table_metrics")
        self._url = url
        self._table = table
        self._user = user
        self._password = password
        self._timeout = send_receive_timeout
        self._distributed = distributed
        self._batch_rows = batch_rows
        self._insecure = insecure
        # content-addressed insert_deduplication_token per POST (md5 of
        # the body): a retried task re-POSTing the identical block
        # carries the identical token, so the server drops the
        # duplicate inside its dedup window — belt-and-braces ON TOP of
        # the ReplacingMergeTree content-hash contract, never instead
        # of it (a retry with different batch boundaries gets fresh
        # tokens and falls back to the RMT collapse). Default off: the
        # reference's wire shape carries no extra URL params.
        self._dedup_tokens = dedup_tokens

    def write(self, rows: DataFrame) -> None:
        lines = rows_to_tsv_lines(rows)
        if self._distributed:
            url, table = self._url, self._table
            user, password = self._user, self._password
            timeout, batch_rows = self._timeout, self._batch_rows
            insecure = self._insecure
            dedup_tokens = self._dedup_tokens

            def _send_partition(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                buf: list[str] = []
                posted = 0

                def _flush() -> None:
                    nonlocal posted
                    body = ("\n".join(buf) + "\n").encode()
                    token = None
                    if dedup_tokens:
                        import hashlib

                        token = hashlib.md5(body).hexdigest()
                    _post_tsv(
                        url, table, body,
                        user, password, timeout, insecure,
                        dedup_token=token,
                    )
                    posted += len(buf)
                    buf.clear()

                for pdf in batches:
                    for line in pdf["line"]:
                        buf.append(line)
                        if len(buf) >= batch_rows:
                            _flush()
                if buf:  # empty partitions never POST
                    _flush()
                yield pd.DataFrame({"posted": [posted]})

            # One DataFrame action drives every partition's POSTs *and*
            # fires upstream observe metrics (RDD actions would not).
            lines.mapInPandas(_send_partition, "posted bigint").collect()
        else:
            # Reference-parity: one upload through the driver; empty batch
            # short-circuits before any network I/O.
            collected = [r.line for r in lines.toLocalIterator()]
            if not collected:
                return
            body = ("\n".join(collected) + "\n").encode()
            token = None
            if self._dedup_tokens:
                import hashlib

                token = hashlib.md5(body).hexdigest()
            _post_tsv(
                self._url,
                self._table,
                body,
                self._user,
                self._password,
                self._timeout,
                self._insecure,
                dedup_token=token,
            )
