"""Persisted incremental BM25 inverted index — the RETRIEVAL member of
the incremental-index layer (operators/dedup_index.py for near-dup
text; operators/ann_index.py for embedding search; this module for
lexical search).

:func:`operators.text.bm25_search` is one-shot: it re-tokenizes the
corpus and rebuilds the postings stream on every call. A RAG/retrieval
deployment instead builds the inverted index ONCE, appends each daily
shard, and serves many queries against the persisted postings — the
classic search-engine lifecycle (Robertson-Spärck Jones BM25 over an
inverted file; the architecture every Lucene-family system ships).
Layout under ``<path>``:

- ``postings/mb=<increment>/tp=<p>/…`` — ``(t, id, dl, tf)`` rows,
  PARTITIONED by the ingestion increment and the term-hash prefix
  ``tp = pmod(xxhash64(t), term_buckets)``. ALL postings of a term live
  in that term's single ``tp=`` bucket, so a query's probe set is the
  distinct prefixes of its own terms — bounded by
  ``min(n_query_terms, term_buckets)`` literals, pushed as a PARTITION
  filter: non-probed directories are pruned at file-listing time and
  df(t) is complete from the probed buckets alone (the band-index
  ``bb=`` discipline applied to retrieval).
- ``stats/mb=<increment>`` — ONE row per increment:
  ``(n_docs, sum_dl)``. Corpus statistics are ADDITIVE (counter
  linearity — the CMS-merge discipline), so N and avgdl at query time
  are exact sums over live increments; zero-token documents count here
  even though they emit no postings, exactly as the one-shot's
  ``avg(dl)`` ranges over every corpus row.
- ``meta/mb=base`` — one row: ``term_buckets``. Geometry is index
  state, not a probe parameter (the sketch-geometry fail-loud
  contract); ``k1``/``b``/``k`` remain query-time parameters because
  they never affect the stored postings.

Equivalence contract (EXACT, like the semantic index's): for
id-disjoint increments, :func:`bm25_index_search` over the live index
returns EXACTLY what :func:`operators.text.bm25_search` returns on the
union corpus — tf/dl are per-document facts, df/N/sum_dl are disjoint
sums, and the scoring arithmetic is identical term for term. Disjoint
shards are the layer's shared contract: a document split across
increments would double-count df and N (fail mode documented, not
detected — ids are the caller's identity).

Scale shape: probe work is ``|query terms' buckets| / term_buckets`` of
the postings bytes (witnessed byte-counted in scripts/scale_smoke.py);
increments land in their own ``mb=`` directory (OVERWRITE + manifest
commit ⇒ at-least-once replay idempotent, the dedup-index atomicity
contract); compaction folds increments back to one directory per table
and ``index_vacuum`` reclaims superseded dirs. Hot terms (stopwords)
concentrate rows in one bucket's files but never in one TASK — the
probed read re-splits by parquet row groups, and scoring aggregates by
(query, doc) with map-side combine, so a hot term costs bytes, not a
straggler.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.localframe import local_df
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    _compact_increment_table,
    _delete_path,
    _manifest_add,
    _pinned_live,
    _read_pinned_table,
)
from etl_prometheus2clickhouse_spark.operators.text import (
    _guard_model_rows,
    _words,
)


def _tp(term_col, term_buckets: int):
    """Partition prefix of a term — the ``bb``/``ip`` discipline for the
    postings table: every posting of a term lands in one
    ``tp = pmod(xxhash64(t), term_buckets)`` directory, so a query's
    probe set (the distinct ``tp`` of its own terms) is a complete
    cover for both tf and df of those terms."""
    return F.pmod(F.xxhash64(term_col), F.lit(term_buckets)).cast("int")


def _validate_label(label: str | None, fn: str) -> None:
    if not label or any(c in label for c in "/=%"):
        raise ValueError(
            f"{fn}: needs a filesystem-safe increment label, got {label!r}"
        )
    if label == "base":
        raise ValueError(
            f"{fn}: label 'base' is reserved for the build increment"
        )


def _write_increment(
    df: DataFrame,
    path: str,
    label: str,
    text_col: str,
    id_col: str,
    term_buckets: int,
    require_tokens: bool = False,
) -> None:
    """Land one increment's postings (term-prefix-partitioned, clustered
    on the partition key first — the band-table small-files lesson) and
    its additive one-row stats frame in their own ``mb=`` directories.
    OVERWRITE mode makes an at-least-once replay idempotent; the
    directories go live only through the caller's manifest commit.

    An increment with zero postings (empty shard, or all-empty texts)
    is legal: its postings directory holds no files — harmless beside
    the build's — and its stats row still counts the documents. The
    BUILD is the exception (``require_tokens``): a base with zero
    postings would leave every future read schemaless, so it fails
    loud instead."""
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("id"), _words(F.col(text_col)).alias("toks")
    )
    # one additive stats row per increment — N and sum_dl range over
    # EVERY document (zero-token docs emit no postings but do count
    # here, exactly like the one-shot's avg over all corpus rows);
    # collected so the build can validate, written driver-local
    st = toks.select(F.size("toks").cast("long").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    ).collect()[0]
    if require_tokens and st.sum_dl == 0:
        raise ValueError(
            "bm25_index_build: the corpus has no tokens — an index "
            "whose base increment holds zero postings has no readable "
            "postings schema; build from a corpus with text"
        )
    posts = (
        toks.select(
            "id", F.size("toks").alias("dl"), F.explode("toks").alias("t")
        )
        .groupBy("t", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    posts.select(
        _tp(F.col("t"), term_buckets).alias("tp"), "t", "id", "dl", "tf"
    ).repartition(F.col("tp")).write.mode("overwrite").partitionBy(
        "tp"
    ).parquet(os.path.join(path, "postings", f"mb={label}"))
    local_df(
        spark,
        [(int(st.n_docs), int(st.sum_dl))],
        "n_docs long, sum_dl long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "stats", f"mb={label}")
    )


def _read_meta(
    spark: SparkSession, path: str,
    live: "dict[str, list[str]] | None" = None,
) -> int:
    rows = (
        _read_pinned_table(spark, path, "meta", live)
        .select("term_buckets")
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(
            f"bm25 index at {path!r} has a corrupt meta table "
            f"({len(rows)} rows, expected 1)"
        )
    return int(rows[0].term_buckets)


def bm25_index_build(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_buckets: int = 64,
) -> None:
    """Tokenize the corpus once and persist the term-prefix-partitioned
    postings + the additive stats row + the geometry meta row, committed
    live through the versioned manifest. A build is a semantic overwrite
    of the whole index (stale increments cleared first).

    ``term_buckets`` is the 100 TB knob: a query probes
    ``|its terms' buckets| / term_buckets`` of the postings bytes, so
    buckets should scale with the index size the way the band index's
    ``index_buckets`` does."""
    if term_buckets < 1:
        raise ValueError(
            f"bm25_index_build: term_buckets must be ≥ 1, got {term_buckets}"
        )
    spark = corpus.sparkSession
    _delete_path(spark, path)
    _write_increment(
        corpus, path, "base", text_col, id_col, term_buckets,
        require_tokens=True,
    )
    local_df(
        spark, [(int(term_buckets),)], "term_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta", "mb=base")
    )
    _manifest_add(spark, path, ["postings", "stats", "meta"], "base")


def bm25_index_append(
    shard: DataFrame,
    path: str,
    label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append an id-DISJOINT shard under the index's stored geometry:
    postings + stats land in the shard's own ``mb=<label>`` directory
    (OVERWRITE ⇒ replay idempotent) and go live in one manifest commit —
    a crash between the write and the commit leaves an invisible,
    replay-overwritten directory, never a half-registered increment."""
    _validate_label(label, "bm25_index_append")
    spark = shard.sparkSession
    term_buckets = _read_meta(spark, path)
    _write_increment(shard, path, label, text_col, id_col, term_buckets)
    _manifest_add(spark, path, ["postings", "stats"], label)


def bm25_index_search(
    queries: DataFrame,
    path: str,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_query_terms: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k against the PERSISTED index — identical scoring
    arithmetic to :func:`operators.text.bm25_search` (idf
    ``ln(1 + (N-df+0.5)/(df+0.5))``, tf saturation, length norm), with
    the corpus work replaced by index reads:

    - postings come from ONLY the query terms' ``tp=`` partitions (the
      probe set is collected bounded — ≤ min(n_terms, term_buckets)
      literals — and pushed as a partition filter);
    - df(t) aggregates over the probed buckets, which contain every
      posting of the probed terms by construction;
    - N and avgdl are exact sums of the per-increment stats rows
      (bounded by the live-increment count; one row after compaction).

    Output ``(query_id, doc_id, bm25 rounded to 6, rank)`` — EXACTLY
    the one-shot's frame on the union corpus (module docstring has the
    argument). The manifest is resolved ONCE per search and every
    table read from that snapshot (:func:`.dedup_index.
    _read_pinned_table`), so a commit landing mid-query can never mix
    one version's postings with another's corpus stats."""
    spark = queries.sparkSession
    live = _pinned_live(spark, path)
    term_buckets = _read_meta(spark, path, live)
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(F.col(terms_col))).alias("t"),
    )
    _guard_model_rows(
        qterms, max_query_terms, "bm25_index_search",
        "exploded query-term list",
    )
    # the probe set: distinct term prefixes of the queries — bounded by
    # term_buckets literals, pushed as a PARTITION filter so the
    # postings read prunes file listings to those directories
    probe = [
        r.tp
        for r in qterms.select(
            _tp(F.col("t"), term_buckets).alias("tp")
        ).distinct().collect()
    ]
    postings = (
        _read_pinned_table(spark, path, "postings", live)
        .where(F.col("tp").isin(probe) if probe else F.lit(False))
        .select("t", "id", "dl", "tf")
    )
    stats = _read_pinned_table(spark, path, "stats", live).agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        (
            F.sum("sum_dl").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("avgdl"),
    )
    df_t = postings.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        postings.join(F.broadcast(qterms), "t")
        .join(df_t, "t")
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            F.col("id").alias(id_col),
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    ).where(F.col("rank") <= k)


def bm25_index_compact(
    spark: SparkSession,
    path: str,
    exclude_labels: set[str] | None = None,
) -> dict:
    """Fold accumulated ``mb=`` increments into one directory per table
    via the manifest swap (atomic for readers; run
    :func:`.dedup_index.index_vacuum` afterwards to reclaim superseded
    dirs). Stats rows stay one-per-folded-increment inside the single
    directory — they are additive, so the fold is physical, not
    semantic. The meta table is never folded (the model-table rule).
    ``exclude_labels`` is the streaming replay guard (see
    :func:`.dedup_index._compact_increment_table`)."""
    return {
        "posting_rows": _compact_increment_table(
            spark, path, "postings", "tp", exclude_labels=exclude_labels
        ),
        "stats_rows": _compact_increment_table(
            spark, path, "stats", None, exclude_labels=exclude_labels
        ),
    }
