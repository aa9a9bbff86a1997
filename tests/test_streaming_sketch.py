"""Streaming sketch partials (streaming/sketch_stream.py): one partial
per REAL micro-batch, merged exactly — streamed-and-merged must equal
the one-shot sketch over everything streamed."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.sketch import (
    bloom_build,
    bloom_merge,
    kmv_distinct,
    kmv_merge,
)
from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
    stream_bloom_partials,
    stream_kmv_partials,
)


@pytest.fixture()
def four_file_stream(spark):
    """A 4-file parquet scratch dir streamed one file per micro-batch."""
    scratch = tempfile.mkdtemp(prefix="sketch_stream_test_")
    batch = spark.createDataFrame(
        [("g1" if i % 3 else "g2", f"u{i % 137}") for i in range(1000)],
        "grp string, v string",
    )
    batch.repartition(4).write.mode("overwrite").parquet(scratch)
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(scratch)
    )
    yield batch, src
    shutil.rmtree(scratch, ignore_errors=True)


def test_stream_kmv_partials_merge_equals_one_shot(spark, four_file_stream):
    batch, src = four_file_stream
    partials = stream_kmv_partials(src, ["grp"], "v", k=32)
    # four genuine micro-batches fired (one per file), each group
    # sketched per batch
    assert partials.select("micro_batch").distinct().count() == 4
    merged = kmv_merge(partials, ["grp"], k=32)
    one_shot = kmv_distinct(batch, ["grp"], "v", k=32)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_stream_bloom_partials_merge_equals_one_shot(spark, four_file_stream):
    batch, src = four_file_stream
    partials = stream_bloom_partials(src, "v", m_bits=2048, k_hashes=3)
    assert partials.count() == 4
    merged = bloom_merge(partials)
    one_shot = bloom_build(batch, "v", m_bits=2048, k_hashes=3)
    assert merged.first().bloom == one_shot.first().bloom


def test_stream_partials_empty_stream(spark):
    """Zero rows streamed → zero partial rows, with the right schema
    (the template frame supplies it), so a downstream merge fails loud
    instead of crashing on a schema-less frame."""
    scratch = tempfile.mkdtemp(prefix="sketch_stream_empty_")
    try:
        batch = spark.createDataFrame([], "grp string, v string")
        batch.write.mode("overwrite").parquet(scratch)
        src = spark.readStream.schema(batch.schema).parquet(scratch)
        partials = stream_kmv_partials(src, ["grp"], "v", k=32)
        assert partials.count() == 0
        assert set(partials.columns) == {
            "grp", "micro_batch", "sketch", "k", "hash_family"
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# CMS family + replay safety (round-9: keyed accumulator)
# ---------------------------------------------------------------------------


def _cms_one_shot(batch, group_cols, item_col, depth, width):
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_merge,
        cms_partial_sketches,
    )

    return cms_merge(
        cms_partial_sketches(
            batch.withColumn("b", F.lit(0)), group_cols, item_col, "b",
            depth, width,
        ),
        group_cols,
    )


def test_stream_cms_partials_merge_equals_one_shot(spark, four_file_stream):
    from etl_prometheus2clickhouse_spark.operators.sketch import cms_merge
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        stream_cms_partials,
    )

    batch, src = four_file_stream
    partials = stream_cms_partials(src, ["grp"], "v", depth=3, width=64)
    assert partials.select("micro_batch").distinct().count() == 4
    merged = cms_merge(partials, ["grp"])
    one_shot = _cms_one_shot(batch, ["grp"], "v", 3, 64)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_replayed_batch_replaces_partial_so_cms_stays_exact(spark):
    """foreachBatch is at-least-once per batch id: simulate a retried
    batch by invoking the accumulator body twice with the same id. The
    keyed accumulator must REPLACE the partial — with a blind append,
    CMS's counter-sum merge would double-count (asserted below as the
    counter-example that motivates the keying)."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_merge,
        cms_partial_sketches,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        _MICRO_BATCH_COL,
        _keyed_collect_body,
    )

    df = spark.createDataFrame(
        [("g1", f"u{i % 7}") for i in range(100)], "grp string, v string"
    )

    def per_batch(batch_df, batch_id):
        return cms_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            ["grp"], "v", _MICRO_BATCH_COL, 3, 32,
        )

    acc = {}
    body = _keyed_collect_body(per_batch, acc)
    body(df, 0)
    body(df, 0)  # the replay
    assert list(acc) == [0]
    schema = per_batch(df, 0).schema
    partials = spark.createDataFrame(
        [r for b in sorted(acc) for r in acc[b]], schema
    )
    merged = {tuple(r) for r in cms_merge(partials, ["grp"]).collect()}
    one_shot = {
        tuple(r) for r in _cms_one_shot(df, ["grp"], "v", 3, 32).collect()
    }
    assert merged == one_shot

    # counter-example: an APPENDED duplicate double-counts CMS
    doubled = spark.createDataFrame(acc[0] + acc[0], schema)
    doubled_merged = {
        tuple(r) for r in cms_merge(doubled, ["grp"]).collect()
    }
    assert doubled_merged != one_shot


def test_duplicated_partial_is_harmless_for_kmv_and_bloom(spark):
    """KMV (explode+distinct+bottom-k) and Bloom (position-set union)
    merges are idempotent: a duplicated batch partial leaves the
    merged result unchanged — these two families tolerate even a
    non-keyed appender; the keyed accumulator makes the THIRD family
    (CMS) safe too."""
    df = spark.createDataFrame(
        [("g1", f"u{i % 53}") for i in range(500)], "grp string, v string"
    )
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_partial_sketches,
    )

    kp = kmv_partial_sketches(
        df.withColumn("b", F.lit(0)), ["grp"], "v", "b", k=16
    )
    merged = kmv_merge(kp, ["grp"], k=16)
    merged_dup = kmv_merge(kp.unionByName(kp), ["grp"], k=16)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in merged_dup.collect()
    }

    bp = bloom_build(
        df.withColumn("b", F.lit(0)), "v", 2048, 3, batch_col="b"
    )
    assert (
        bloom_merge(bp.unionByName(bp)).first().bloom
        == bloom_merge(bp).first().bloom
    )


# ---------------------------------------------------------------------------
# durable partials: parquet append per batch + checkpointed restart
# ---------------------------------------------------------------------------


def test_durable_partials_checkpointed_restart_merges_exact(spark, tmp_path):
    """The 100 TB shape end-to-end: phase 1 streams half the corpus
    (one parquet partition per micro-batch under a checkpoint), the
    stream STOPS, phase 2 adds input files and restarts from the same
    checkpoint — only unseen files are processed, partials accumulate,
    and the on-demand merge over the directory equals the one-shot
    sketch over everything. A third run with no new input is a no-op."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_distinct,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        read_partials,
        stream_kmv_partials_durable,
    )

    scratch = str(tmp_path / "in")
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    rows = [("g1" if i % 3 else "g2", f"u{i % 211}") for i in range(2000)]
    full = spark.createDataFrame(rows, "grp string, v string")
    half1 = spark.createDataFrame(rows[:1000], "grp string, v string")
    half2 = spark.createDataFrame(rows[1000:], "grp string, v string")

    def run():
        src = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(scratch)
        )
        stream_kmv_partials_durable(
            src, ["grp"], "v", partials_dir, ckpt, k=32
        )

    half1.repartition(2).write.mode("append").parquet(scratch)
    run()  # phase 1: two micro-batches, then the stream stops
    p1 = read_partials(spark, partials_dir)
    batches_1 = {r.micro_batch for r in p1.select("micro_batch").collect()}
    assert len(batches_1) == 2

    half2.repartition(2).write.mode("append").parquet(scratch)
    run()  # phase 2: restart from checkpoint — only the NEW files
    p2 = read_partials(spark, partials_dir)
    batches_2 = {r.micro_batch for r in p2.select("micro_batch").collect()}
    assert batches_1 < batches_2 and len(batches_2) == 4

    merged = kmv_merge(p2, ["grp"], k=32)
    one_shot = kmv_distinct(full, ["grp"], "v", k=32)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }

    run()  # phase 3: nothing new — no-op, partials unchanged
    p3 = read_partials(spark, partials_dir)

    def _hashable(rows):
        return {
            tuple(tuple(x) if isinstance(x, list) else x for x in r)
            for r in rows
        }

    assert _hashable(p3.collect()) == _hashable(p2.collect())


def test_durable_body_overwrites_replayed_batch_partition(spark, tmp_path):
    """A replayed batch must overwrite its OWN partition, not append a
    second partial file — directly exercised through the factored
    foreachBatch body."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        kmv_distinct,
        kmv_partial_sketches,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        _MICRO_BATCH_COL,
        _durable_body,
        read_partials,
    )

    df = spark.createDataFrame(
        [("g1", f"u{i % 29}") for i in range(300)], "grp string, v string"
    )

    def per_batch(batch_df, batch_id):
        return kmv_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            ["grp"], "v", _MICRO_BATCH_COL, k=16,
        )

    pdir = str(tmp_path / "p")
    body = _durable_body(per_batch, pdir)
    body(df, 0)
    body(df, 0)  # the replay
    partials = read_partials(spark, pdir)
    assert partials.count() == 1  # one group, ONE partial — no dup
    merged = kmv_merge(partials, ["grp"], k=16)
    one_shot = kmv_distinct(df, ["grp"], "v", k=16)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_durable_cms_partials_merge_exact(spark, tmp_path):
    """The durable path composed with the NON-idempotent family: CMS
    partials written one partition per batch, merged from disk, equal
    the one-shot counter table — and a simulated replay through the
    durable body leaves the merge unchanged (partition overwrite)."""
    from etl_prometheus2clickhouse_spark.operators.sketch import (
        cms_merge,
        cms_partial_sketches,
    )
    from etl_prometheus2clickhouse_spark.streaming.sketch_stream import (
        _MICRO_BATCH_COL,
        _durable_body,
        read_partials,
        run_partial_stream_durable,
    )

    scratch = str(tmp_path / "in")
    pdir = str(tmp_path / "partials")
    rows = [("g1" if i % 2 else "g2", f"u{i % 37}") for i in range(800)]
    full = spark.createDataFrame(rows, "grp string, v string")
    full.repartition(2).write.mode("overwrite").parquet(scratch)
    src = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(scratch)
    )

    def per_batch(batch_df, batch_id):
        return cms_partial_sketches(
            batch_df.withColumn(_MICRO_BATCH_COL, F.lit(batch_id)),
            ["grp"], "v", _MICRO_BATCH_COL, 3, 32,
        )

    run_partial_stream_durable(src, per_batch, pdir, str(tmp_path / "ckpt"))
    merged = {
        tuple(r)
        for r in cms_merge(read_partials(spark, pdir), ["grp"]).collect()
    }
    one_shot = {
        tuple(r) for r in _cms_one_shot(full, ["grp"], "v", 3, 32).collect()
    }
    assert merged == one_shot

    # replay batch 0 through the durable body: the partition is
    # OVERWRITTEN, never appended — the structural invariant that
    # keeps the counter-sum merge from double-counting. (The replayed
    # content need not match the original file split; the invariant
    # under test is one-partition-per-batch-id.)
    _durable_body(per_batch, pdir)(
        spark.createDataFrame(rows[:400], full.schema), 0
    )
    n_parts = {
        r.micro_batch
        for r in read_partials(spark, pdir).select("micro_batch").collect()
    }
    assert n_parts == {0, 1}
