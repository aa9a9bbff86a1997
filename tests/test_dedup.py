"""Dedup operator semantics: exact/fingerprint survivors, blocked
Jaccard, MinHash+LSH recall/verification/bucket-cap, SimHash Hamming
(operators/dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import (
    _simhash_chunks,
    distinct_by_fingerprint,
    exact_dedup,
    jaccard,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_hashes,
    shingles,
    simhash,
    simhash_near_pairs,
    simhash_verified_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE, "a"),
        (2, BASE, "a"),  # exact duplicate
        (3, BASE + " today", "a"),  # near duplicate
        (4, "completely different text about spark dataframes and shuffles", "a"),
        (5, "  the quick   brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun \n", "b"),
        (6, "another unrelated document mentioning prometheus metrics", "b"),
    ]
    return spark.createDataFrame(rows, "id bigint, text string, blk string")


def test_exact_dedup_deterministic_survivor(corpus):
    kept = exact_dedup(corpus, ["text"], order_col="id")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6]  # 2 collapsed into 1


def test_exact_dedup_arbitrary_survivor_count(corpus):
    assert exact_dedup(corpus, ["text"]).count() == 5


def test_fingerprint_dedup_whitespace_insensitive(corpus):
    kept = distinct_by_fingerprint(corpus, "text", order_col="id")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [1, 3, 4, 6]  # 2 (exact) and 5 (whitespace) fold into 1


def test_ngram_jaccard_requires_block(corpus):
    with pytest.raises(ValueError, match="block_col"):
        ngram_jaccard_pairs(corpus, "id")


def test_ngram_jaccard_blocked_pairs(corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in ngram_jaccard_pairs(
            corpus, "id", block_col="blk", threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    # 5 is whitespace-identical to 1 but in block "b": never a candidate
    assert not any(5 in p for p in pairs)


def test_minhash_lsh_finds_planted_dups_and_verifies(spark, corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in minhash_lsh_pairs(corpus, "id", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 5) in pairs  # whitespace variant tokenizes identically
    assert (2, 5) in pairs
    # verification step: every reported similarity is the EXACT Jaccard
    sh = corpus.select("id", shingle_hashes(F.col("text")).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb"))
    exact = {
        (r.id_a, r.id_b): r.j
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("sa"), F.col("sb")).alias("j"))
        .collect()
    }
    for p, j in pairs.items():
        assert abs(exact[p] - j) < 1e-12
        assert j >= 0.5
    # and no qualifying pair was missed on this corpus (recall check)
    for p, j in exact.items():
        if j >= 0.5:
            assert p in pairs


def test_minhash_bucket_cap_records_drops(spark):
    # 30 identical docs land in the same buckets; cap of 10 drops them
    rows = [(i, BASE) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, text string")
    stats: dict = {}
    out = minhash_lsh_pairs(
        df, "id", threshold=0.5, max_bucket=10, bucket_stats=stats
    )
    assert stats["dropped_entries"] > 0  # recorded, not silent
    assert stats["max_bucket_size"] == 30
    assert out.count() == 0  # every bucket over cap → no candidates


def test_simhash_identical_docs_distance_zero(corpus):
    sigs = {r.id: r.simhash64 for r in simhash(corpus, "id").collect()}
    assert sigs[1] == sigs[2]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(corpus, "id", max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 5)] == 0  # same token stream
    assert all(h <= 3 for h in pairs.values())


def test_simhash_chunks_pigeonhole_invariants():
    for h in (0, 3, 8, 10, 31, 63):
        chunks = _simhash_chunks(h)
        # H+1 chunks covering all 64 bits exactly once, every width ≥ 1
        assert len(chunks) == h + 1
        assert sum(w for _, w in chunks) == 64
        assert all(w >= 1 for _, w in chunks)
        covered = set()
        for shift, width in chunks:
            covered |= set(range(shift, shift + width))
        assert covered == set(range(64))
    with pytest.raises(ValueError):
        _simhash_chunks(64)


def test_simhash_wide_radius_guaranteed_recall(spark):
    # Pairs at Hamming 4-8 share no 16-bit quarter in the worst case; a
    # fixed 4-chunk split misses them. With H+1 pigeonhole chunks the
    # candidate join must find every pair within the radius.
    # Construct signatures via documents whose simhash differs in spread
    # positions is fiddly; instead assert on the corpus that radius-10
    # output ⊇ radius-3 output and every emitted distance ≤ 10.
    rows = [(i, BASE + " extra" * (i % 5)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "id bigint, text string")
    wide = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(df, "id", max_hamming=10).collect()
    }
    narrow = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(df, "id", max_hamming=3).collect()
    }
    assert set(narrow) <= set(wide)
    assert all(h <= 10 for h in wide.values())
    # brute-force ground truth: every pair within radius 10 is emitted
    sigs = {r.id: r.simhash64 for r in simhash(df, "id").collect()}
    ids = sorted(sigs)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            d = bin((sigs[ia] ^ sigs[ib]) & (2**64 - 1)).count("1")
            if d <= 10:
                assert (ia, ib) in wide, (ia, ib, d)


def test_simhash_verified_pairs_match_exact_jaccard(corpus):
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in simhash_verified_pairs(
            corpus, "id", max_hamming=10, threshold=0.5
        ).collect()
    }
    # exact all-pairs ground truth over the same shingle hashes
    sh = corpus.select("id", shingle_hashes(F.col("text")).alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb"))
    exact = {
        (r.id_a, r.id_b): r.j
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("sa"), F.col("sb")).alias("j"))
        .collect()
        if r.j >= 0.5
    }
    assert got.keys() == exact.keys()
    for p in got:
        assert abs(got[p] - exact[p]) < 1e-12


def test_release_cached_unpersists_intermediates(corpus):
    from etl_prometheus2clickhouse_spark.operators.dedup import release_cached

    out = minhash_lsh_pairs(corpus, "id", threshold=0.5)
    out.collect()
    deps = out._cached_deps
    assert deps and all(d.storageLevel.useMemory for d in deps)
    release_cached(out)
    assert all(not d.storageLevel.useMemory for d in deps)
    # no-op on frames without cached deps
    release_cached(corpus)


def test_shingles_and_hashes_agree_on_set_size(corpus):
    both = corpus.select(
        F.size(F.array_distinct(shingles(F.col("text")))).alias("ns"),
        F.size(shingle_hashes(F.col("text")).alias("h")).alias("nh"),
    ).collect()
    for r in both:
        assert r.ns == r.nh  # tuple-hashing preserves the distinct count


def test_short_text_single_shingle(spark):
    df = spark.createDataFrame([(1, "two words")], "id bigint, text string")
    r = df.select(
        shingles(F.col("text"), 3).alias("s"),
        shingle_hashes(F.col("text"), 3).alias("h"),
    ).first()
    assert r.s == ["two words"] and len(r.h) == 1


def test_cached_scope_releases_even_after_reselect(spark, corpus):
    """The round-3 leak: catalog entries re-select the operator output,
    dropping the `_cached_deps` attribute, so release_cached(result)
    silently freed nothing. cached_scope frees by registry, not by
    attribute — the re-selected frame doesn't matter."""
    from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    with cached_scope():
        out = minhash_lsh_pairs(corpus, "id", threshold=0.5).select("id_a")
        out.collect()
        assert n_persisted() > base  # intermediates really were cached
    assert n_persisted() == base


def test_cached_scope_long_lived_session_no_growth(spark, corpus):
    """10 runs under 10 scopes must leave storage memory flat — the
    long-lived-session contract (one-shot driver runs never noticed).
    Compared as RDD-id SETS, not counts: in a long suite session the
    ContextCleaner asynchronously unregisters earlier tests' RDDs
    between the baseline capture and the final check, so a size
    equality races against unrelated removals — what this test pins is
    that no NEW id survives the scopes."""
    from etl_prometheus2clickhouse_spark.operators.dedup import cached_scope

    def persisted_ids():
        it = (
            spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .iterator()
        )
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    base = persisted_ids()
    for _ in range(10):
        with cached_scope():
            minhash_lsh_pairs(corpus, "id", threshold=0.5).collect()
    leaked = persisted_ids() - base
    assert not leaked


def test_nested_scope_with_interleaved_release(spark, corpus):
    """A release_cached() of an OUTER scope's frame while an inner
    scope is open must not eat the inner scope's own registrations
    (the length-mark registry bug: removing a pre-mark entry shifted
    the mark window and under-released). Per-scope membership makes
    each scope free exactly what it registered."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        cached_scope,
        release_cached,
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    with cached_scope():
        outer = minhash_lsh_pairs(corpus, "id", threshold=0.5)
        outer.collect()
        after_outer = n_persisted()
        assert after_outer > base
        with cached_scope():
            # n=2 so the persisted intermediate's plan differs from the
            # outer run's (Spark's CacheManager dedupes identical plans)
            inner = minhash_lsh_pairs(corpus, "id", n=2, threshold=0.4)
            inner.collect()
            assert n_persisted() > after_outer
            # free the OUTER frame's deps while the inner scope is open
            release_cached(outer)
        # inner scope exit released the inner registrations too; ≤
        # rather than == because the ContextCleaner may concurrently
        # unregister EARLIER tests' RDDs in a long suite session (the
        # no-growth test's id-set rationale)
        assert n_persisted() <= base
    assert n_persisted() <= base


def test_unscoped_use_registers_nothing_globally(corpus):
    """Operators run outside any scope must not grow a global registry
    (a long-lived unscoped session would leak list entries forever);
    release_cached() still frees via the result attribute."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        _SCOPE_STACK,
        release_cached,
    )

    assert _SCOPE_STACK == []
    out = minhash_lsh_pairs(corpus, "id", threshold=0.5)
    out.collect()
    assert _SCOPE_STACK == []
    deps = out._cached_deps
    assert deps and all(d.storageLevel.useMemory for d in deps)
    release_cached(out)
    assert all(not d.storageLevel.useMemory for d in deps)


def test_dup_components_transitive_closure(spark):
    """A~B and B~C must land A, B, C in ONE cluster labeled min(id),
    even though (A, C) was never emitted as a pair."""
    from etl_prometheus2clickhouse_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(2, 7), (7, 9), (20, 21)], "id_a bigint, id_b bigint"
    )
    got = {r.node: r.component for r in dup_components(pairs).collect()}
    assert got == {2: 2, 7: 2, 9: 2, 20: 20, 21: 20}


def test_dup_components_chain_converges(spark):
    # a 12-node path is the worst case for plain propagation (diameter
    # rounds); must still converge well under the default cap
    from etl_prometheus2clickhouse_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a bigint, id_b bigint"
    )
    got = {r.node: r.component for r in dup_components(pairs).collect()}
    assert got == {i: 0 for i in range(12)}


def test_dup_components_nonconvergence_is_loud(spark):
    from etl_prometheus2clickhouse_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_components(pairs, max_iterations=2)


def test_twostar_matches_propagation_on_random_graph(spark):
    """Two independent CC algorithms must produce identical labels on a
    random multi-component graph (includes chains, stars, triangles)."""
    import random

    from etl_prometheus2clickhouse_spark.operators.dedup import (
        dup_components,
        dup_components_twostar,
    )

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 30)]          # one long chain
    edges += [(100, v) for v in range(101, 110)]        # a star
    edges += [(200, 201), (201, 202), (202, 200)]       # a triangle
    edges += [
        (rng.randrange(300, 340), rng.randrange(300, 340)) for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = {r.node: r.component for r in dup_components(pairs).collect()}
    b = {r.node: r.component for r in dup_components_twostar(pairs).collect()}
    assert a == b


def test_twostar_deep_chain_needs_few_rounds(spark):
    """A 64-node path: propagation needs ~diameter rounds; the
    alternating algorithm must finish in O(log d) — well under 10."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        dup_components_twostar,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a bigint, id_b bigint"
    )
    got = {
        r.node: r.component
        for r in dup_components_twostar(pairs, max_iterations=10).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_twostar_chain_is_not_declared_converged_early(spark):
    """{(3,2),(2,1)} is a fixpoint of small-star ALONE; the convergence
    check must still contract it to a star rooted at 1."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        dup_components_twostar,
    )

    pairs = spark.createDataFrame(
        [(3, 2), (2, 1)], "id_a bigint, id_b bigint"
    )
    got = {r.node: r.component for r in dup_components_twostar(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_twostar_keeps_self_loop_only_nodes(spark):
    """A node appearing only in self-loop pairs must still be emitted,
    labeled with itself — same contract as dup_components."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        dup_components,
        dup_components_twostar,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (7, 7)], "id_a bigint, id_b bigint"
    )
    a = {r.node: r.component for r in dup_components(pairs).collect()}
    b = {r.node: r.component for r in dup_components_twostar(pairs).collect()}
    assert a == b == {1: 1, 2: 1, 7: 7}


def test_ngram_jaccard_max_df_cap_semantics(spark):
    """A block-wide boilerplate shingle: with the df cap it no longer
    witnesses pairs (output is a subset of exact, sims are lower
    bounds); with a cap above the observed df the result is exact."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    boiler = "the quick brown fox jumps"
    rows = [(i, f"u{i} a{i} b{i} {boiler}", "en") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    kw = dict(text_col="text", block_col="lang", n=3, threshold=0.1)

    exact = ngram_jaccard_pairs(df, "doc_id", **kw).collect()
    # 3 shared boiler trigrams, 6 trigrams per doc: sim = 3/9 for all 6 pairs
    assert len(exact) == 6
    assert all(abs(r.jaccard_sim - 1 / 3) < 1e-12 for r in exact)

    stats: dict = {}
    capped = ngram_jaccard_pairs(
        df, "doc_id", max_df=2, df_stats=stats, **kw
    ).collect()
    # every shared shingle has df=4 > 2 -> no intersection survives
    assert capped == []
    assert stats == {"capped_shingle_keys": 3, "max_df_seen": 4}

    loose_stats: dict = {}
    loose = ngram_jaccard_pairs(
        df, "doc_id", max_df=10, df_stats=loose_stats, **kw
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in loose) == sorted(
        (r.id_a, r.id_b) for r in exact
    )
    assert loose_stats == {"capped_shingle_keys": 0, "max_df_seen": 4}


def test_ngram_jaccard_max_df_validation(spark):
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id bigint, text string, lang string"
    )
    with pytest.raises(ValueError, match="max_df must be >= 2"):
        ngram_jaccard_pairs(df, "doc_id", block_col="lang", max_df=1)


def test_resolve_near_duplicates_annotation(spark):
    """Keep-one-per-cluster: clustered rows keep exactly the min-id
    representative, singletons keep themselves, and the annotation
    covers EVERY corpus row (auditable dedup, not silent drops)."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        resolve_near_duplicates,
    )

    corpus = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a bigint, id_b bigint"
    )
    for algo in ("propagation", "twostar"):
        got = {
            r.doc_id: (r.component_id, r.is_canonical)
            for r in resolve_near_duplicates(
                corpus, pairs, id_col="doc_id", algorithm=algo
            ).collect()
        }
        assert got == {
            0: (0, True),
            1: (1, True),
            3: (1, False),
            5: (1, False),
            2: (2, True),
            6: (2, False),
            4: (4, True),
        }, algo


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. ACL'22 ExactSubstr)
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    exact_substring_dedup,
    exact_substring_spans,
)


@pytest.fixture()
def substr_corpus(spark):
    # doc 1/2 share the 4-token run "the quick brown fox"; doc 3 repeats
    # "a b c" twice WITHIN itself; doc 4 is clean; doc 5 too short
    rows = [
        (1, "start one the quick brown fox ends here now"),
        (2, "other intro the quick brown fox closing words differ"),
        (3, "a b c x y z a b c q r s"),
        (4, "entirely unique content with no repeated window at all"),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_substring_spans_cross_doc(spark, substr_corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in exact_substring_spans(
            substr_corpus, "doc_id", "text", min_len=3
        ).collect()
    }
    # doc 1 tokens: start one the quick brown fox ends here now
    #   windows "the quick brown" (pos 2) and "quick brown fox" (pos 3)
    #   duplicate doc 2's pos 2/3 → merged island [2, 6)
    assert (1, 2, 6, 4) in spans
    assert (2, 2, 6, 4) in spans
    # doc 3: "a b c" at pos 0 and pos 6 — two islands, not merged
    assert (3, 0, 3, 3) in spans and (3, 6, 9, 3) in spans
    assert not any(s[0] in (4, 5) for s in spans)


def test_exact_substring_spans_overlap_merges_to_one_island(spark):
    # "w w w w w" : every 2-token window "w w" duplicates; one span
    df = spark.createDataFrame([(1, "w w w w w")], "doc_id bigint, text string")
    spans = exact_substring_spans(df, "doc_id", "text", min_len=2).collect()
    assert [(r.span_start, r.span_end, r.span_len) for r in spans] == [(0, 5, 5)]


def test_exact_substring_dedup_cuts_and_reconstructs(spark, substr_corpus):
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            substr_corpus, "doc_id", "text", min_len=3
        ).collect()
    }
    assert len(out) == 5  # every doc survives as a row
    assert out[1].clean_text == "start one ends here now"
    assert out[1].dup_tokens == 4 and out[1].n_tokens == 9
    assert out[1].dup_frac == round(4 / 9, 6)
    # doc 3 loses both islands
    assert out[3].clean_text == "x y z q r s"
    # untouched docs pass through whitespace-normalized, dup_tokens 0
    assert out[4].dup_tokens == 0
    assert out[4].clean_text == "entirely unique content with no repeated window at all"
    assert out[5].dup_tokens == 0 and out[5].clean_text == "tiny doc"


def test_exact_substring_dedup_fully_duplicated_doc_empties(spark):
    df = spark.createDataFrame(
        [(1, "same exact words"), (2, "same exact words")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in exact_substring_dedup(df, min_len=3).collect()}
    assert out[1].clean_text == "" and out[2].clean_text == ""
    assert out[1].dup_frac == 1.0


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet stage)
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.dedup import (  # noqa: E402
    paragraph_dedup,
)


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha one\nshared para\nalpha two"),
            (2, "shared para\nbeta one"),
            (3, "beta one\nshared para\ngamma"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    # doc 1 saw everything first: keeps all three paragraphs verbatim
    assert out[1].n_paras == 3 and out[1].n_kept == 3
    assert out[1].text == "alpha one\nshared para\nalpha two"
    # doc 2's "shared para" was taken by doc 1; "beta one" is doc 2's
    assert out[2].n_kept == 1 and out[2].text == "beta one"
    # doc 3 loses both earlier paragraphs, keeps only "gamma"
    assert out[3].n_paras == 3 and out[3].n_kept == 1
    assert out[3].text == "gamma"


def test_paragraph_dedup_all_duplicate_doc_goes_empty(spark):
    df = spark.createDataFrame(
        [(1, "only para"), (2, "only para")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert out[1].n_kept == 1 and out[1].text == "only para"
    assert out[2].n_kept == 0 and out[2].text == ""
    assert out[2].n_paras == 1


def test_paragraph_dedup_trims_and_drops_empty_paragraphs(spark):
    # blank lines and whitespace-only paragraphs vanish; surviving
    # paragraphs compare trimmed, so "  x  " duplicates "x"
    df = spark.createDataFrame(
        [(1, "x\n\n  \ny"), (2, "  x  \nz")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert out[1].n_paras == 2 and out[1].text == "x\ny"
    assert out[2].n_paras == 2 and out[2].n_kept == 1
    assert out[2].text == "z"


def test_paragraph_dedup_within_doc_repeat_collapses(spark):
    df = spark.createDataFrame(
        [(7, "rep\nrep\nrep\nuniq")], "doc_id bigint, text string"
    )
    row = paragraph_dedup(df).collect()[0]
    assert row.n_paras == 4 and row.n_kept == 2
    assert row.text == "rep\nuniq"


def test_dup_components_auto_routes_agree(spark):
    """The driver union-find fast path and the distributed propagation
    must produce identical (node, component) frames — including
    transitive chains and the min-label choice."""
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        dup_components,
        dup_components_auto,
    )

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (7, 7), (100, 3)],
        "id_a bigint, id_b bigint",
    )
    via_driver = {
        (r.node, r.component)
        for r in dup_components_auto(pairs).collect()
    }
    via_cluster = {
        (r.node, r.component)
        for r in dup_components_auto(
            pairs, driver_edge_threshold=0
        ).collect()
    }
    want = {(r.node, r.component) for r in dup_components(pairs).collect()}
    assert via_driver == via_cluster == want
    assert {c for _, c in want} == {3, 7, 20}
