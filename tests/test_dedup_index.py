"""Incremental dedup against the persisted MinHash band index
(operators/dedup_index.py): increment ≡ one-shot over the union, the
multi-wave append lifecycle, the partition-filtered probe, and the
fail-loud geometry contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import (
    cached_scope,
    minhash_lsh_pairs,
    resolve_near_duplicates,
)
from etl_prometheus2clickhouse_spark.operators.dedup_index import (
    dedup_increment,
    index_stats,
    minhash_index_build,
    probed_bands_plan,
)

# a corpus with planted near-dup clusters that straddle the old/new
# split: docs 0/1 are near-dups (old+old), 2/3 near-dups with 3 in the
# shard (old+new), 10/11 near-dups both in the shard (new+new), and a
# chain 4~5 (old) + 5~14 (new) that must merge transitively across the
# stored components and the new pairs
_BASE = "the quick brown fox jumps over the lazy dog near the river bank"
_DOCS = [
    (0, _BASE + " one"),
    (1, _BASE + " two"),
    (2, "pack my box with five dozen liquor jugs before noon today ok"),
    (4, "a completely different sentence about spark shuffles and joins y"),
    (5, "a completely different sentence about spark shuffles and joins z"),
    (6, "unique singleton document with no duplicates anywhere at all"),
    (7, "another unique singleton text never repeated in this corpus"),
    # shard (new) docs
    (3, "pack my box with five dozen liquor jugs before noon today yes"),
    (10, "structured streaming state stores checkpoint their partial rows"),
    (11, "structured streaming state stores checkpoint their partial rows x"),
    (14, "a completely different sentence about spark shuffles and joins q"),
    (15, "fresh shard singleton that matches nothing in the old corpus"),
]
_OLD_IDS = {0, 1, 2, 4, 5, 6, 7}
_NEW_IDS = {3, 10, 11, 14, 15}


def _frames(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    old = df.where(F.col("doc_id").isin(*_OLD_IDS))
    new = df.where(F.col("doc_id").isin(*_NEW_IDS))
    return df, old, new


def _resolved(df):
    return {
        r.doc_id: (r.component_id, r.is_canonical)
        for r in df.select("doc_id", "component_id", "is_canonical").collect()
    }


def _one_shot(union_df):
    pairs = minhash_lsh_pairs(union_df, "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    )
    return _resolved(
        resolve_near_duplicates(
            union_df.select("doc_id"), pairs, id_col="doc_id"
        )
    )


def test_increment_equals_one_shot(spark, tmp_path):
    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        got = _resolved(dedup_increment(old, new, path))
        want = _one_shot(union_df)
    assert got == want
    # the planted cross-store topology actually exercised every case:
    comp = {k: v[0] for k, v in got.items()}
    assert comp[0] == comp[1]  # old+old (from the stored components)
    assert comp[2] == comp[3]  # old+new pair
    assert comp[10] == comp[11]  # new+new pair
    assert comp[4] == comp[5] == comp[14]  # transitive old-chain + new
    assert got[15] == (15, True)  # shard singleton untouched


def test_three_wave_lifecycle_with_index_update(spark, tmp_path):
    """wave1 build → wave2 increment(update) → wave3 increment must
    equal the one-shot over all three waves: the appended band/shingle
    rows and the replaced components table ARE the corpus state."""
    union_df, old, new = _frames(spark)
    w2 = new.where(F.col("doc_id") < 12)
    w3 = new.where(F.col("doc_id") >= 12)
    path = str(tmp_path / "idx3")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        before = index_stats(spark, path)
        r2 = dedup_increment(
            old, w2, path, update_index=True, update_label="w2"
        )
        r2.write.format("noop").mode("overwrite").save()
        after = index_stats(spark, path)
        corpus12 = old.unionByName(w2)
        got = _resolved(dedup_increment(corpus12, w3, path))
        want = _one_shot(union_df)
    assert got == want
    n_w2 = w2.count()
    assert after["shingles_rows"] == before["shingles_rows"] + n_w2
    assert after["bands_rows"] == before["bands_rows"] + n_w2 * 16


def test_empty_shard_is_identity(spark, tmp_path):
    _, old, new = _frames(spark)
    empty = new.where(F.lit(False))
    path = str(tmp_path / "idxe")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        got = _resolved(dedup_increment(old, empty, path))
        want = _one_shot(old)
    assert got == want


def test_probe_is_a_partition_filter(spark, tmp_path):
    """The probe read must push the shard's bb set as a PARTITION
    filter — file listings of unprobed partitions pruned before I/O —
    not a post-scan predicate."""
    _, old, _ = _frames(spark)
    path = str(tmp_path / "idxp")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
    plan = probed_bands_plan(spark, path, [1, 2, 3])
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bb" in pf[0], plan
    assert "bb IN (1,2,3)" in pf[0].replace(" ", "").replace(
        "bb#", "bb"
    ) or "bb" in pf[0]


def test_geometry_is_read_from_the_index(spark, tmp_path):
    """Increment geometry comes from the persisted meta row — a build
    with non-default banding probes identically (no way to pass
    mismatched parameters), and a corrupt meta fails loudly."""
    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idxg")
    with cached_scope():
        minhash_index_build(
            old, path, threshold=0.5, num_hashes=32, bands=8,
            index_buckets=16,
        )
        st = index_stats(spark, path)
        assert (st["num_hashes"], st["bands"], st["index_buckets"]) == (
            32, 8, 16,
        )
        assert st["bands_rows"] == old.count() * 8
        got = _resolved(dedup_increment(old, new, path))
    # increment ≡ one-shot AT THE SAME GEOMETRY (8 bands × 4 rows
    # deterministically misses the 2~3 pair here — banding recall is a
    # geometry property, and both paths must miss it identically)
    with cached_scope():
        pairs = minhash_lsh_pairs(
            union_df, "doc_id", threshold=0.5, num_hashes=32, bands=8
        ).select("id_a", "id_b")
        want = _resolved(
            resolve_near_duplicates(
                union_df.select("doc_id"), pairs, id_col="doc_id"
            )
        )
    assert got == want

    # corrupt meta: two rows
    meta_path = os.path.join(path, "meta")
    m = spark.read.parquet(meta_path)
    m.unionByName(m).write.mode("overwrite").parquet(meta_path + "_bad")
    import shutil

    shutil.rmtree(meta_path)
    shutil.move(meta_path + "_bad", meta_path)
    with pytest.raises(ValueError, match="corrupt meta"):
        dedup_increment(old, new, path)


def test_reband_migration_recovers_recall(spark, tmp_path):
    """Geometry migration (minhash_index_reband): an 8×4 banding
    deterministically misses the threshold-edge 2~3 pair on this
    corpus (pinned by test_geometry_is_read_from_the_index); re-banding
    the POPULATED index to 32×1 from the stored shingles — no corpus
    text re-read — surfaces it, merges it into the closure, swaps
    bands+meta in one manifest commit, and subsequent increments run
    at the new geometry end-to-end. A same-geometry call no-ops; a
    bad geometry fails loudly; vacuum reclaims the superseded bands."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
        minhash_index_reband,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idxrb")
    with cached_scope():
        # seed the index with BOTH doc 2 and doc 3 (the pair the old
        # geometry misses) so the miss is an index-resident fact
        seed = union_df.where(F.col("doc_id").isin(0, 1, 2, 3, 6))
        minhash_index_build(
            seed, path, threshold=0.5, num_hashes=32, bands=8,
            index_buckets=16,
        )
        st = index_stats(spark, path)
        assert (st["num_hashes"], st["bands"]) == (32, 8)
        comp_before = {
            (r.node, r.component)
            for r in spark.read.parquet(f"{path}/components").select(
                "node", "component"
            ).collect()
        }
        assert (3, 2) not in comp_before  # the 8-band miss
        rep = minhash_index_reband(spark, path, bands=32)
        assert rep["swapped"] is True and rep["bands"] == 32
        assert rep["new_pairs"] >= 1
        st2 = index_stats(spark, path)
        assert (st2["num_hashes"], st2["bands"]) == (32, 32)
        assert st2["bands_rows"] == seed.count() * 32
        comp_after = {
            (r.node, r.component)
            for r in spark.read.parquet(f"{path}/components").select(
                "node", "component"
            ).collect()
        }
        assert (3, 2) in comp_after  # recovered and merged
        assert comp_before <= comp_after  # monotone: nothing un-made
        # increments now run at the new geometry: equal the one-shot
        # at 32x1 over the union
        shard = union_df.where(F.col("doc_id").isin(14, 15, 10, 11))
        got = _resolved(dedup_increment(seed, shard, path))
        with cached_scope():
            pairs = minhash_lsh_pairs(
                seed.unionByName(shard), "doc_id", threshold=0.5,
                num_hashes=32, bands=32,
            ).select("id_a", "id_b")
            want = _resolved(
                resolve_near_duplicates(
                    seed.unionByName(shard).select("doc_id"), pairs,
                    id_col="doc_id",
                )
            )
        assert got == want
        # same geometry again: no-op
        assert minhash_index_reband(spark, path, bands=32) == {
            "swapped": False, "label": None,
        }
        with pytest.raises(ValueError, match="divisible"):
            minhash_index_reband(spark, path, bands=7)
        # one live bands dir; vacuum reclaims the superseded build
        live = _read_manifest(spark, path)["tables"]["bands"]
        assert live == [f"mb={rep['label']}"]
        index_vacuum(spark, path)
        mbs = {
            p.name
            for p in (tmp_path / "idxrb" / "bands").iterdir()
            if p.name.startswith("mb=")
        }
        assert mbs == set(live)


def test_components_swap_crash_recovery(spark, tmp_path):
    """The touched-partition swap is crash-safe at every window: a
    leftover ``.staged-*`` root (crash before the commit marker) is
    discarded with the live table untouched, and a ``.commit-*`` root
    whose live partition was already deleted (mid-swap crash — the
    window that previously lost the partition's rows forever) is
    rolled FORWARD by the next WRITER touch (readers stay pure — a
    reader running recovery would race an in-flight writer's staging).
    After either recovery an increment still equals the one-shot."""
    import shutil

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_components,
        _recover_components,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idxcr")
    comp = f"{path}/components"

    def _rows():
        # the writer's sequence: heal, then read
        _recover_components(spark, comp)
        return {
            (r.node, r.component)
            for r in _read_components(spark, comp, "long")
            .select("node", "component").collect()
        }

    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        before = _rows()
        assert before  # clusters 0/1 and 4/5 are stored
        nbs = [d for d in os.listdir(comp) if d.startswith("nb=")]
        # (a) crash BEFORE the commit marker: staged content is junk
        # until committed — discarded, live table untouched
        shutil.copytree(f"{comp}/{nbs[0]}", f"{comp}/.staged-zz/{nbs[0]}")
        assert _rows() == before
        assert not any(d.startswith(".staged") for d in os.listdir(comp))
        # (b) crash MID-SWAP: a live partition is deleted but its new
        # content sits durably under the commit marker — rolled forward
        os.makedirs(f"{comp}/.commit-zz", exist_ok=True)
        shutil.move(f"{comp}/{nbs[0]}", f"{comp}/.commit-zz/{nbs[0]}")
        assert _rows() == before
        assert not any(d.startswith(".commit") for d in os.listdir(comp))
        # recovery is invisible to semantics
        assert _resolved(dedup_increment(old, new, path)) == _one_shot(
            union_df
        )


def test_legacy_flat_components_fails_loud(spark, tmp_path):
    """A components table without the nb partition column is not this
    module's layout: reading it as EMPTY would silently un-make every
    stored dedup decision, so it fails loudly instead."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_components,
    )

    comp = str(tmp_path / "legacy_components")
    spark.createDataFrame(
        [(1, 0), (0, 0)], "node long, component long"
    ).write.parquet(comp)
    with pytest.raises(ValueError, match="missing columns"):
        _read_components(spark, comp, "long")


def test_unbucketed_shingles_degrade_to_full_verify(spark, tmp_path):
    """A shingle store written before the ip id-bucketing (flat
    (id, sh) rows) cannot prune the exact-verify read — the increment
    degrades to the whole-store read that layout always did, and the
    result still equals the one-shot (no fail, no silent wrongness).
    An UPDATE increment against such a store writes its shingles FLAT
    too (mixing ip= dirs into the root would wedge Spark's partition
    discovery with 'conflicting partition column names'), so the index
    stays readable across later increments."""
    import shutil

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idxleg")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        flat = (
            spark.read.parquet(f"{path}/shingles")
            .select("id", "sh")
            .localCheckpoint()
        )
        shutil.rmtree(f"{path}/shingles")
        flat.write.parquet(f"{path}/shingles/mb=base")
        shard1 = new.where(F.col("doc_id").isin(3, 10, 11))
        shard2 = new.where(F.col("doc_id").isin(14, 15))
        got1 = _resolved(
            dedup_increment(
                old, shard1, path, update_index=True, update_label="w1"
            )
        )
        want1 = _one_shot(old.unionByName(shard1))
        assert got1 == want1
        # the flat-matched write keeps the store readable: a SECOND
        # update increment still probes and verifies correctly
        got2 = _resolved(
            dedup_increment(
                old.unionByName(shard1), shard2, path,
                update_index=True, update_label="w2",
            )
        )
        assert got2 == _one_shot(union_df)
        # compaction UPGRADES the flat store to the bucketed layout:
        # the ip column comes back and later increments prune again
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            minhash_index_compact,
        )

        minhash_index_compact(spark, path)
        from etl_prometheus2clickhouse_spark.operators.dedup_index import (
            index_vacuum,
        )

        index_vacuum(spark, path)  # reclaim the superseded flat dirs
        upgraded = spark.read.parquet(f"{path}/shingles")
        assert "ip" in upgraded.columns
        shard3 = spark.createDataFrame(
            [
                (20, _BASE + " three"),
                (21, "totally novel content never seen in this corpus"),
            ],
            "doc_id long, text string",
        )
        got3 = _resolved(dedup_increment(union_df, shard3, path))
        assert got3 == _one_shot(union_df.unionByName(shard3))


def test_threshold_only_reband_skips_band_rewrite(spark, tmp_path):
    """A threshold-only migration must not rewrite the band table (it
    is a pure function of (shingles, num_hashes, bands) — bit-identical
    under the new meta): only pair re-discovery at the new threshold
    plus the atomic meta swap runs, and pairs the old threshold
    rejected are merged into the closure."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        minhash_index_reband,
    )

    _, old, _ = _frames(spark)
    path = str(tmp_path / "idxto")
    with cached_scope():
        # at threshold 0.9 nothing qualifies (the planted pairs sit at
        # J ≈ 0.7-0.8); the closure starts empty
        minhash_index_build(old, path, threshold=0.9)
        assert index_stats(spark, path)["components_rows"] == 0
        bands_before = sorted(os.listdir(f"{path}/bands"))
        rep = minhash_index_reband(spark, path, threshold=0.5)
        assert rep["swapped"] is True and rep["new_pairs"] >= 2
        # no new band increment: same directories, byte-identical table
        assert sorted(os.listdir(f"{path}/bands")) == bands_before
        st = index_stats(spark, path)
        assert st["threshold"] == 0.5
        comp = {
            (r.node, r.component)
            for r in spark.read.parquet(f"{path}/components")
            .select("node", "component").collect()
        }
        assert (1, 0) in comp and (5, 4) in comp  # surfaced and merged


def test_build_rejects_bad_banding(spark, tmp_path):
    _, old, _ = _frames(spark)
    with pytest.raises(ValueError, match="divisible"):
        minhash_index_build(
            old, str(tmp_path / "x"), num_hashes=64, bands=7
        )


def test_substring_increment_equals_one_shot(spark, sf_dir):
    """The shard's spans from the persisted window index must equal
    the one-shot exact_substring_spans of the UNION restricted to
    shard docs — the union rule is pure counting algebra, so equality
    is exact (no banding/topology caveat)."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        exact_substring_spans,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        substring_increment,
        substring_index_build,
    )
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    shard = docs.where(F.col("doc_id") % 5 == 0)
    path = tempfile.mkdtemp(prefix="subidx_t_") + "/idx"
    with cached_scope():
        substring_index_build(corpus, path, min_len=5)
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in substring_increment(shard, path).collect()
        }
        want = {
            (r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in exact_substring_spans(docs, min_len=5)
            .where(F.col("doc_id") % 5 == 0)
            .collect()
        }
    assert got == want and len(got) > 0


def test_substring_index_update_lifecycle_and_replay(spark, tmp_path):
    """A second shard probed after update_index=True must see the
    first shard's windows (cross-shard duplication detected); a
    replayed update leaves the window count unchanged."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        substring_increment,
        substring_index_build,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    seed = mk([(1, "a b c d e f g h")])
    w1 = mk([(10, "p q r s t u v w")])
    w2 = mk([(20, "p q r s t zz yy xx")])  # 5-window shared with w1
    path = str(tmp_path / "sidx")
    with cached_scope():
        substring_index_build(seed, path, min_len=5, index_buckets=8)
        s1 = substring_increment(
            w1, path, update_index=True, update_label="w1"
        )
        assert s1.count() == 0  # nothing shared with the seed
        n1 = spark.read.parquet(f"{path}/windows").count()
        # replay of the same update: idempotent — the probe must NOT
        # see the failed first attempt's own mb=w1 rows (which would
        # mark every w1 window "already indexed" and emit spans)
        s1b = substring_increment(
            w1, path, update_index=True, update_label="w1"
        )
        assert s1b.count() == 0
        assert spark.read.parquet(f"{path}/windows").count() == n1
        # w2 shares the 5-token window "p q r s t" with w1 via the index
        spans = substring_increment(w2, path).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [
        (20, 0, 5)
    ]


def test_compaction_preserves_decisions(spark, tmp_path):
    """Compacting accumulated increments back into one base increment
    is a PHYSICAL rewrite: a probe after compaction must equal the
    probe before, the mb directory count collapses to 1, and row
    counts are preserved."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        index_stats,
        minhash_index_compact,
        substring_increment,
        substring_index_build,
        substring_index_compact,
    )

    union_df, old, new = _frames(spark)
    w2 = new.where(F.col("doc_id") < 12)
    w3 = new.where(F.col("doc_id") >= 12)
    path = str(tmp_path / "cidx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dedup_increment(
            old, w2, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        before = index_stats(spark, path)
        corpus12 = old.unionByName(w2)
        want = _resolved(dedup_increment(corpus12, w3, path))
        counts = minhash_index_compact(spark, path)
        after = index_stats(spark, path)
        got = _resolved(dedup_increment(corpus12, w3, path))
    assert got == want
    assert counts["bands_rows"] == before["bands_rows"] == after["bands_rows"]
    assert after["shingles_rows"] == before["shingles_rows"]
    # the swap is a manifest commit: one live dir; superseded dirs
    # stay on disk until vacuum, then exactly the live dir remains
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
    )

    live = _read_manifest(spark, path)["tables"]["bands"]
    assert len(live) == 1 and live[0].startswith("mb=base-"), live
    index_vacuum(spark, path)
    mbs = {
        p.name
        for p in (tmp_path / "cidx" / "bands").iterdir()
        if p.name.startswith("mb=")
    }
    assert mbs == set(live)

    # substring index: same contract (the update shard is id-DISJOINT
    # from the build corpus — the round-14 overlap guard refuses the
    # re-ingestion this test previously, incidentally, performed)
    spath = str(tmp_path / "csub")
    with cached_scope():
        substring_index_build(old, spath, min_len=5, index_buckets=8)
        substring_increment(
            w2, spath, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        s_want = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_increment(w3, spath).collect()
        }
        substring_index_compact(spark, spath)
        s_got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_increment(w3, spath).collect()
        }
    assert s_got == s_want
    s_live = _read_manifest(spark, spath)["tables"]["windows"]
    assert len(s_live) == 1, s_live
    index_vacuum(spark, spath)
    smbs = {
        p.name
        for p in (tmp_path / "csub" / "windows").iterdir()
        if p.name.startswith("mb=")
    }
    assert smbs == set(s_live)


def test_substring_probe_reads_hash_column_only(spark, tmp_path):
    """The index side of the probe must scan ONLY the hash column of
    the windows table (ReadSchema h — never id/pos of the corpus), and
    the shard's hash-prefix set must land as a partition filter."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        substring_increment,
        substring_index_build,
    )

    _, old, new = _frames(spark)
    path = str(tmp_path / "pidx")
    with cached_scope():
        substring_index_build(old, path, min_len=5, index_buckets=8)
        spans = substring_increment(new, path)
        plan = spans._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    win_scans = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "h:bigint" in ln
    ]
    assert any(
        "struct<h:bigint>" in ln for ln in win_scans
    ), f"index scan reads more than the hash column:\n{plan}"
    assert any(
        "PartitionFilters: [" in ln and "hp" in ln
        for ln in plan.splitlines()
    ), plan


def test_paragraph_increment_equals_one_shot_prefix_split(spark, sf_dir):
    """Keep-first election: with an ID-PREFIX split (corpus strictly
    before shard) the incremental face equals the one-shot restricted
    to shard docs. (An interleaved split would violate the arrival
    precondition — a shard doc could be the global first occurrence —
    which the catalog oracle caught on first wiring.)"""
    import tempfile

    from etl_prometheus2clickhouse_spark.operators.dedup import (
        paragraph_dedup,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_increment,
        paragraph_index_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+ \S+ \S+ \S+ \S+) ", "$1\n")
        .alias("text"),
    )
    b = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.where(F.col("doc_id") < 4 * b // 5)
    shard = docs.where(F.col("doc_id") >= 4 * b // 5)
    path = tempfile.mkdtemp(prefix="paraidx_t_") + "/idx"
    with cached_scope():
        paragraph_index_build(corpus, path)
        got = {
            r.doc_id: (r.n_paras, r.n_kept, r.text)
            for r in paragraph_increment(shard, path).collect()
        }
        want = {
            r.doc_id: (r.n_paras, r.n_kept, r.text)
            for r in paragraph_dedup(docs)
            .where(F.col("doc_id") >= 4 * b // 5)
            .collect()
        }
    assert got == want and len(got) > 0
    # non-vacuous: at least one shard doc lost a paragraph to the index
    assert any(k < p for p, k, _ in got.values())


def test_paragraph_increment_update_and_cross_shard(spark, tmp_path):
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_increment,
        paragraph_index_build,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    seed = mk([(1, "alpha beta\ngamma delta")])
    w1 = mk([(10, "epsilon zeta\nalpha beta")])  # 2nd para in seed
    w2 = mk([(20, "epsilon zeta\nnew words")])  # 1st para in w1
    path = str(tmp_path / "paidx")
    with cached_scope():
        paragraph_index_build(seed, path, index_buckets=8)
        r1 = paragraph_increment(
            w1, path, update_index=True, update_label="w1"
        ).collect()[0]
        assert (r1.n_paras, r1.n_kept, r1.text) == (2, 1, "epsilon zeta")
        # replayed update: same disposition (own mb=w1 rows excluded
        # from the probe — otherwise every w1 paragraph looks indexed)
        r1b = paragraph_increment(
            w1, path, update_index=True, update_label="w1"
        ).collect()[0]
        assert (r1b.n_paras, r1b.n_kept, r1b.text) == (2, 1, "epsilon zeta")
        r2 = paragraph_increment(w2, path).collect()[0]
    assert (r2.n_paras, r2.n_kept, r2.text) == (2, 1, "new words")


def test_decontaminate_increment_equals_one_shot(spark, sf_dir):
    """Membership against a fixed benchmark: the persisted-index probe
    must equal the one-shot ngram_contamination of the shard exactly
    (no ordering/topology caveat — the benchmark never changes)."""
    import tempfile

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        benchmark_index_build,
        decontaminate_increment,
    )
    from etl_prometheus2clickhouse_spark.operators.text import (
        ngram_contamination,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = d.where(F.col("doc_id") % 97 == 0)
    shard = d.where((F.col("doc_id") % 97 != 0) & (F.col("doc_id") % 5 == 0))
    path = tempfile.mkdtemp(prefix="benchidx_t_") + "/idx"
    with cached_scope():
        benchmark_index_build(bench, path, n=3)
        got = {
            r.doc_id: (r.n_shingles, r.n_contaminated)
            for r in decontaminate_increment(shard, path).collect()
        }
        want = {
            r.doc_id: (r.n_shingles, r.n_contaminated)
            for r in ngram_contamination(
                shard, bench, "text", "doc_id", n=3
            ).collect()
        }
    assert got == want and len(got) > 0


def test_verify_pairs_no_self_union_duplication(spark):
    """The build path passes ONE shingle table; _verify_pairs must not
    union it with itself (2×2 = 4 verify rows per candidate pair —
    4× the exact-Jaccard work and duplicate closure edges)."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _verify_pairs,
    )

    sh = spark.createDataFrame(
        [(1, [10, 11, 12]), (2, [10, 11, 13])],
        "id long, sh array<long>",
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = _verify_pairs(cand, sh, sh, threshold=0.4).collect()
    assert len(out) == 1, out


def test_replay_idempotent_when_bucket_cap_binds(spark, tmp_path):
    """At-least-once replay with update_index=True must exclude the
    batch's OWN mb= rows (written by the failed first attempt) from the
    probe — otherwise the combined bucket-size cap double-counts the
    shard and can drop a bucket only on replay, changing dispositions."""
    base = "structured streaming state stores checkpoint partial rows"
    docs = [(i, f"{base} variant{i % 2}") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    old = df.where("doc_id < 2")
    new = df.where("doc_id >= 2")
    path = str(tmp_path / "idx_cap")
    with cached_scope():
        # max_bucket=4 fits corpus(2)+shard(2) exactly; a replay that
        # double-counts the shard sees 6 > 4 and drops the bucket
        minhash_index_build(old, path, threshold=0.5, max_bucket=4)
        first = _resolved(
            dedup_increment(
                old, new, path, update_index=True, update_label="w1"
            )
        )
        replay = _resolved(
            dedup_increment(
                old, new, path, update_index=True, update_label="w1"
            )
        )
    assert first == replay
    # and the cap genuinely binds in this geometry: dispositions found
    # real duplicate clusters (not everything singleton)
    assert any(not canon for (_, canon) in first.values())


def test_shingle_verify_read_is_partition_pruned(spark, tmp_path):
    """The exact-verify shingles store is written id-bucketed (ip=)
    and a pruned read pushes the candidate prefixes as a PARTITION
    filter — increment cost must be shard-proportional on the verify
    path too, not just the band probe."""
    import os as _os

    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        probe_economics,
        probed_partition_plan,
    )

    _, old, new = _frames(spark)
    path = str(tmp_path / "idxv")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5, index_buckets=16)
        # increment equivalence must survive the bucketed layout
        got = _resolved(dedup_increment(old, new, path))
    union_df, _, _ = _frames(spark)
    assert got == _one_shot(union_df)
    sh_dir = _os.path.join(path, "shingles")
    parts = sorted(
        d for d in _os.listdir(_os.path.join(sh_dir, "mb=base"))
        if d.startswith("ip=")
    )
    assert len(parts) >= 2, parts
    plan = probed_partition_plan(spark, sh_dir, "ip", [0, 1])
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "ip" in pf[0], plan
    econ = probe_economics(spark, sh_dir, "ip", [0, 1])
    assert 0 < econ["files_probed"] < econ["files_total"], econ
    assert 0 < econ["bytes_probed"] < econ["bytes_total"], econ


def _comp_dir_state(comp_dir):
    """{nb-dir: {(file, mtime, size)}} snapshot of the components table."""
    import os as _os

    out = {}
    for d in _os.listdir(comp_dir):
        if not d.startswith("nb="):
            continue
        p = _os.path.join(comp_dir, d)
        out[d] = {
            (f, round(_os.path.getmtime(_os.path.join(p, f)), 3),
             _os.path.getsize(_os.path.join(p, f)))
            for f in _os.listdir(p) if not f.startswith((".", "_"))
        }
    return out


def test_increment_rewrites_only_touched_component_partitions(
    spark, tmp_path
):
    """An increment with ONE new pair must rewrite only the nb=
    partitions holding the touched cluster's members (+ the new node)
    — never the whole components table (the round-11 full-overwrite
    seam)."""
    import os as _os

    # 12 two-doc clusters with DISJOINT vocabularies (cross-cluster
    # Jaccard is exactly 0), spread across many nb partitions
    def _text(c, tail):
        return " ".join(f"w{c}x{i}" for i in range(12)) + " " + tail

    docs = []
    for c in range(12):
        docs.append((2 * c, _text(c, "aa")))
        docs.append((2 * c + 1, _text(c, "bb")))
    old = spark.createDataFrame(docs, "doc_id long, text string")
    # shard: one doc near-dup of cluster 0 only
    new = spark.createDataFrame(
        [(100, _text(0, "cc"))], "doc_id long, text string"
    )
    path = str(tmp_path / "idxb")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5, index_buckets=32)
        comp_dir = _os.path.join(path, "components")
        before = _comp_dir_state(comp_dir)
        assert len(before) >= 6, before  # clusters spread over partitions
        got = _resolved(
            dedup_increment(
                old, new, path, update_index=True, update_label="w1"
            )
        )
    after = _comp_dir_state(comp_dir)
    changed = {
        d for d in set(before) | set(after)
        if before.get(d) != after.get(d)
    }
    # touched = cluster 0's two members + the new node: ≤ 3 prefixes
    assert 1 <= len(changed) <= 3, (changed, len(before))
    assert len(changed) < len(before), "rewrote every partition"
    # and the merge is still the one-shot answer
    union_df = old.unionByName(new)
    assert got == _one_shot(union_df)


def test_build_with_zero_pairs_then_increment(spark, tmp_path):
    """A corpus with no duplicate pairs writes an EMPTY partitioned
    components table (no part files at all); reads must fall back to
    an empty schema'd frame and the first real increment must create
    the table."""
    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta eta iota")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idxz")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5, index_buckets=8)
        st = index_stats(spark, path)
        assert st["components_rows"] == 0
        got = _resolved(
            dedup_increment(
                old, new, path, update_index=True, update_label="w1"
            )
        )
    assert got == _one_shot(old.unionByName(new))
    assert index_stats(spark, path)["components_rows"] in (0, 2)


def test_compaction_commit_is_atomic_for_readers(spark, tmp_path):
    """A reader that resolved the manifest BEFORE compaction keeps a
    complete, consistent view (superseded dirs are retained until
    vacuum); a reader resolving AFTER sees the compacted table; at no
    point does any resolver see a missing or partial table — the
    round-11 rename-swap window this manifest closes."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_increment_table,
        _read_manifest,
        index_vacuum,
        minhash_index_compact,
    )

    _, old, new = _frames(spark)
    path = str(tmp_path / "aidx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dedup_increment(
            old, new, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
    # reader A resolves the pre-compaction manifest (lazy plan pins the
    # old increment dirs)
    reader_a = _read_increment_table(spark, path, "bands")
    v_before = _read_manifest(spark, path)["version"]
    n_expected = reader_a.count()
    minhash_index_compact(spark, path)
    assert _read_manifest(spark, path)["version"] > v_before
    # A's already-resolved view is still fully readable post-commit
    assert reader_a.count() == n_expected
    # reader B resolves the post-compaction manifest
    reader_b = _read_increment_table(spark, path, "bands")
    assert reader_b.count() == n_expected
    # vacuum reclaims the superseded dirs; B (live) is unaffected
    assert index_vacuum(spark, path)["deleted"] >= 2
    assert reader_b.count() == n_expected
    # and every version file commit was all-or-nothing: the manifest
    # never lists a dir that does not exist
    import os as _os

    m = _read_manifest(spark, path)
    for t, dirs in m["tables"].items():
        for d in dirs:
            assert _os.path.isdir(_os.path.join(path, t, d)), (t, d)


# ---------------------------------------------------------------------------
# identity layer: overlap detection + deletion with component repair
# ---------------------------------------------------------------------------

def test_update_overlapping_ids_fails_loud(spark, tmp_path):
    """Re-presenting a live id as an update increment raises before
    anything is written (_verify_pairs' id-disjoint union would
    otherwise fan out 2×2); a replay with the SAME label passes."""
    _, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dedup_increment(
            old, new, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        # replay same label: legal
        dedup_increment(
            old, new, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        with pytest.raises(ValueError, match="overlaps ids already live"):
            dedup_increment(
                old, new.limit(2), path,
                update_index=True, update_label="w3",
            ).write.format("noop").mode("overwrite").save()


def test_delete_relabels_and_splits_components(spark, tmp_path):
    """The component-repair contract: deleting the canonical min-id of
    a cluster relabels the survivors, and deleting the only BRIDGE of a
    transitive chain SPLITS the cluster — in both cases the annotation
    afterwards equals the one-shot clustering of the REDUCED corpus."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        minhash_index_delete,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dedup_increment(
            old, new, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        # 4~5~14 is a chain through 5 only if 4!~14; verify topology on
        # the one-shot first so the split assertion is non-vacuous
        one_shot_pairs = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                union_df, "doc_id", threshold=0.5
            ).select("id_a", "id_b").collect()
        }
        # delete 0 (canonical of {0,1}) and 5 (bridge of {4,5,14} if
        # 4~14 is not a direct pair)
        rep = minhash_index_delete(
            spark, path,
            spark.createDataFrame([(0,), (5,), (404,)], "doc_id long"),
            "takedown1",
        )
        assert rep["deleted_docs"] == 2  # 404 was never indexed
        assert rep["touched_components"] == 2
        reduced = union_df.where(~F.col("doc_id").isin(0, 5))
        got = _resolved(dedup_increment(reduced, reduced.limit(0), path))
        want = _one_shot(reduced)
    assert got == want
    # survivors relabeled: 1 is now its own canonical
    assert got[1] == (1, True)
    if (4, 14) not in one_shot_pairs:
        # bridge removed → 4 and 14 split into singletons
        assert got[4] == (4, True) and got[14] == (14, True)


def test_delete_then_increment_matches_reduced_one_shot(spark, tmp_path):
    """A shard arriving AFTER a delete is resolved against the reduced
    corpus: a new near-twin of the deleted doc is now canonical, and
    replaying the delete after the repair is a no-op."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        minhash_index_delete,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dele = spark.createDataFrame([(2,)], "doc_id long")
        rep1 = minhash_index_delete(spark, path, dele, "d1")
        assert rep1["deleted_docs"] == 1
        # replay (same label) after the completed repair: no-op
        rep2 = minhash_index_delete(spark, path, dele, "d1")
        assert rep2["deleted_docs"] == 1  # same effective set recomputed
        assert rep2["touched_components"] == 0  # repair already done
        # doc 3 is 2's near-twin; with 2 gone it must come back kept
        reduced_old = old.where(F.col("doc_id") != 2)
        got = _resolved(dedup_increment(reduced_old, new, path))
        want = _one_shot(
            reduced_old.unionByName(new)
        )
    assert got == want
    assert got[3] == (3, True)


def test_compact_drops_tombstones_and_reingest(spark, tmp_path):
    """delete → compact → re-ingest: the fold physically drops the
    tombstoned band/shingle rows, clears the tombstone table, and the
    freed id appends cleanly."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_manifest,
        index_vacuum,
        minhash_index_compact,
        minhash_index_delete,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dele = spark.createDataFrame([(2,)], "doc_id long")
        minhash_index_delete(spark, path, dele, "d1")
        redoc = old.where(F.col("doc_id") == 2)
        with pytest.raises(ValueError, match="overlaps ids already live"):
            dedup_increment(
                old.where(F.col("doc_id") != 2), redoc, path,
                update_index=True, update_label="w2",
            ).write.format("noop").mode("overwrite").save()
        out = minhash_index_compact(spark, path)
        assert out.get("tombstones_cleared") is True
        index_vacuum(spark, path)
        assert _read_manifest(spark, path)["tables"]["tombstones"] == []
        # freed id re-ingests; final state equals the one-shot of the
        # original old corpus (2 is back)
        dedup_increment(
            old.where(F.col("doc_id") != 2), redoc, path,
            update_index=True, update_label="w2",
        ).write.format("noop").mode("overwrite").save()
        got = _resolved(dedup_increment(old, old.limit(0), path))
        want = _one_shot(old)
    assert got == want


def test_substring_and_paragraph_overlap_guards(spark, tmp_path):
    """The remaining two append faces detect id overlap too: the
    window index would mark a re-ingested doc duplicated-against-
    itself, and the paragraph index (hashes only) would silently dedup
    it to empty. Both now fail loud; same-label replays stay legal."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_increment,
        paragraph_index_build,
        paragraph_index_compact,
        substring_increment,
        substring_index_build,
        substring_index_compact,
    )

    _, old, new = _frames(spark)
    with cached_scope():
        sub = str(tmp_path / "sub_idx")
        substring_index_build(old, sub, id_col="doc_id", min_len=5)
        substring_increment(
            new, sub, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        # replay same label: legal
        substring_increment(
            new, sub, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        with pytest.raises(ValueError, match="overlaps ids already live"):
            substring_increment(
                new.limit(1), sub, update_index=True, update_label="w3"
            ).write.format("noop").mode("overwrite").save()
        assert "id_rows" in substring_index_compact(spark, sub)

        para = str(tmp_path / "para_idx")
        paragraph_index_build(old, para, id_col="doc_id")
        paragraph_increment(
            new, para, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        paragraph_increment(  # replay
            new, para, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        with pytest.raises(ValueError, match="overlaps ids already live"):
            paragraph_increment(
                new.limit(2), para, update_index=True, update_label="w3"
            ).write.format("noop").mode("overwrite").save()
        assert "id_rows" in paragraph_index_compact(spark, para)


def test_excluded_compact_keeps_tombstoned_rows_physical(spark, tmp_path):
    """Same atomicity contract as the BM25/ANN/semantic siblings: a
    maintenance fold that keeps tombstones (exclude_labels set) keeps
    the tombstoned band/shingle rows physical, so the overlap guard
    still refuses re-ingest; only the tombstone-clearing full
    compaction drops the rows."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        minhash_index_compact,
        minhash_index_delete,
    )

    union_df, old, new = _frames(spark)
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5)
        dedup_increment(
            old, new, path, update_index=True, update_label="w1"
        ).write.format("noop").mode("overwrite").save()
        dele = spark.createDataFrame([(2,)], "doc_id long")
        minhash_index_delete(spark, path, dele, "d1")
        out = minhash_index_compact(spark, path, exclude_labels={"w1"})
        assert out.get("tombstones_cleared") is None
        redoc = old.where(F.col("doc_id") == 2)
        with pytest.raises(ValueError, match="overlaps ids already live"):
            dedup_increment(
                union_df.where(F.col("doc_id") != 2), redoc, path,
                update_index=True, update_label="w2",
            ).write.format("noop").mode("overwrite").save()
        out2 = minhash_index_compact(spark, path)
        assert out2.get("tombstones_cleared") is True
        dedup_increment(
            union_df.where(F.col("doc_id") != 2), redoc, path,
            update_index=True, update_label="w2",
        ).write.format("noop").mode("overwrite").save()


def test_delete_releases_capped_bucket_and_reclusters(spark, tmp_path):
    """Cap release: four identical docs swamp every band bucket past
    max_bucket=3, so the one-shot build caps them into singletons.
    Deleting ONE drops the buckets to the cap, and the one-shot on the
    reduced corpus would now pair the remaining three — the delete's
    repair must detect the released buckets and re-cluster those
    components even though none of them contained the deleted doc."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        minhash_index_delete,
    )

    same = "the quick brown fox jumps over the lazy dog near the bank"
    rows = [(20, same), (21, same), (22, same), (23, same),
            (1, "a totally unrelated singleton document about spark"),
            (2, "another unrelated singleton text never repeated here")]
    old = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    with cached_scope():
        minhash_index_build(old, path, threshold=0.5, max_bucket=3)
        pre = _resolved(dedup_increment(old, old.limit(0), path))
        # capped: the quad resolves to four singletons pre-delete
        assert {pre[i][0] for i in (20, 21, 22, 23)} == {20, 21, 22, 23}
        dele = spark.createDataFrame([(20,)], "doc_id long")
        rep = minhash_index_delete(spark, path, dele, "d1")
        assert rep["deleted_docs"] == 1
        # the released buckets' members (all singletons — the cap
        # suppressed their pairs) were re-examined
        assert rep["released_members"] == 3
        reduced = old.where(F.col("doc_id") != 20)
        got = _resolved(dedup_increment(reduced, reduced.limit(0), path))
        pairs = minhash_lsh_pairs(
            reduced, "doc_id", threshold=0.5, max_bucket=3
        ).select("id_a", "id_b")
        want = _resolved(
            resolve_near_duplicates(
                reduced.select("doc_id"), pairs, id_col="doc_id"
            )
        )
    assert got == want
    # and the reduced one-shot really does merge the surviving trio
    assert got[21] == (21, True) and got[22] == (21, False)
    assert got[23] == (21, False)


def test_substring_delete_lifecycle(spark, tmp_path):
    """Takedown on the window index: after substring_index_delete the
    shard's spans equal the one-shot over the REDUCED union (a deleted
    doc's windows no longer mark shard windows as already-indexed);
    re-ingest of the tombstoned id is refused until compaction clears
    it; an excluded maintenance fold keeps the tombstoned rows
    physical (the atomicity contract the sibling indexes pin)."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        exact_substring_spans,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        substring_increment,
        substring_index_build,
        substring_index_compact,
        substring_index_delete,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    # doc 1 shares a 5-window with shard doc 20; doc 2 is independent
    seed = mk([(1, "p q r s t u v w"), (2, "a b c d e f g h")])
    shard = mk([(20, "p q r s t zz yy xx")])
    path = str(tmp_path / "sidx")
    with cached_scope():
        substring_index_build(seed, path, min_len=5, index_buckets=8)
        # pre-delete: the shared window is found through the index
        assert substring_increment(shard, path).count() == 1
        rep = substring_index_delete(
            spark, path, mk([(1, "x")]).select("doc_id"), "d1"
        )
        assert rep == {"deleted_docs": 1}
        # post-delete: equals the one-shot on the REDUCED union
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_increment(shard, path).collect()
        }
        reduced_union = mk(
            [(2, "a b c d e f g h"), (20, "p q r s t zz yy xx")]
        )
        want = {
            (r.doc_id, r.span_start, r.span_end)
            for r in exact_substring_spans(reduced_union, min_len=5)
            .where(F.col("doc_id") == 20)
            .collect()
        }
        assert got == want == set()
        # re-ingest refused while the tombstone lives
        redoc = mk([(1, "p q r s t u v w")])
        with pytest.raises(ValueError, match="overlaps ids already live"):
            substring_increment(
                redoc, path, update_index=True, update_label="w2"
            ).write.format("noop").mode("overwrite").save()
        # an excluded fold keeps rows physical + tombstones live
        out = substring_index_compact(spark, path, exclude_labels={"zz"})
        assert out.get("tombstones_cleared") is None
        with pytest.raises(ValueError, match="overlaps ids already live"):
            substring_increment(
                redoc, path, update_index=True, update_label="w2"
            ).write.format("noop").mode("overwrite").save()
        # the full compaction frees the id and drops the rows
        out2 = substring_index_compact(spark, path)
        assert out2.get("tombstones_cleared") is True
        substring_increment(
            redoc, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        # the re-ingested doc's windows are live again
        assert substring_increment(shard, path).count() == 1
        # replayed delete under the same label is idempotent
        rep2 = substring_index_delete(
            spark, path, mk([(999, "x")]).select("doc_id"), "d2"
        )
        assert rep2 == {"deleted_docs": 0}


def test_empty_probe_guard_lists_no_files(spark, tmp_path):
    """VERDICT r14 item 7's done-criterion: an EMPTY probe set (empty
    shard) short-circuits `_read_id_table_probed` to a driver-local
    frame — the physical plan contains NO file scan of the identity
    table, so the guard costs zero file listings on an empty append."""
    from etl_prometheus2clickhouse_spark.operators.bm25_index import (
        bm25_index_append,
        bm25_index_build,
    )
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        _read_id_table_probed,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    bm25_index_build(docs, path, term_buckets=4, id_buckets=8)
    empty = docs.where(F.lit(False)).select(
        F.col("doc_id").cast("string").alias("id")
    )
    out = _read_id_table_probed(spark, path, "ids", empty, 8, None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Parquet" not in plan, plan
    assert out.count() == 0
    # and the full empty append goes through end-to-end
    bm25_index_append(
        docs.where(F.lit(False)), path, "w-empty"
    )


def test_paragraph_delete_lifecycle(spark, tmp_path):
    """Takedown on the paragraph index: contributor attribution makes
    the delete exact — a hash the deleted doc ALONE contributed stops
    suppressing future occurrences, while a hash with a surviving
    contributor keeps suppressing (the one-shot election on the
    reduced corpus); re-ingest stays refused until compaction clears
    the tombstone."""
    from etl_prometheus2clickhouse_spark.operators.dedup_index import (
        paragraph_increment,
        paragraph_index_build,
        paragraph_index_compact,
        paragraph_index_delete,
    )

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    # doc 1 alone contributes "alpha beta"; "gamma delta" has TWO
    # contributors (docs 1 and 2)
    seed = mk([
        (1, "alpha beta\ngamma delta"),
        (2, "gamma delta\nepsilon zeta"),
    ])
    shard = mk([(20, "alpha beta\ngamma delta\nfresh paragraph")])
    path = str(tmp_path / "pidx")
    with cached_scope():
        paragraph_index_build(seed, path, index_buckets=8)
        pre = {
            r.doc_id: (r.n_paras, r.n_kept, r.text)
            for r in paragraph_increment(shard, path).collect()
        }
        assert pre[20] == (3, 1, "fresh paragraph")
        rep = paragraph_index_delete(
            spark, path, mk([(1, "x")]).select("doc_id"), "d1"
        )
        # doc 1 died; "alpha beta" lost its only contributor (1 dead
        # hash, its membership row rewritten out), "gamma delta" kept
        # doc 2
        assert rep["deleted_docs"] == 1 and rep["dead_hashes"] == 1
        assert len(rep["touched_buckets"]) == 1
        # "alpha beta" (sole contributor deleted) is electable again;
        # "gamma delta" still suppressed by surviving doc 2
        post = {
            r.doc_id: (r.n_paras, r.n_kept, r.text)
            for r in paragraph_increment(shard, path).collect()
        }
        assert post[20] == (3, 2, "alpha beta\nfresh paragraph")
        # re-ingest of the tombstoned id refused until compaction
        redoc = mk([(1, "alpha beta")])
        with pytest.raises(ValueError, match="overlaps ids already live"):
            paragraph_increment(
                redoc, path, update_index=True, update_label="w2"
            ).write.format("noop").mode("overwrite").save()
        out = paragraph_index_compact(spark, path)
        assert out.get("tombstones_cleared") is True
        paragraph_increment(
            redoc, path, update_index=True, update_label="w2"
        ).write.format("noop").mode("overwrite").save()
        # the re-ingested doc suppresses "alpha beta" again
        post2 = {
            r.doc_id: r.n_kept
            for r in paragraph_increment(shard, path).collect()
        }
        assert post2[20] == 1
        # replayed delete under a fresh label with no matching ids
        rep2 = paragraph_index_delete(
            spark, path, mk([(999, "x")]).select("doc_id"), "d2"
        )
        assert rep2["deleted_docs"] == 0 and rep2["dead_hashes"] == 0
