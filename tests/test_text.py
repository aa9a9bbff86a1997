"""Text-analysis operators: known-answer token/punct counts, language
ID, quality components, fingerprints (operators/text.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.text import (
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
    with_token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Hello, world! It is a test."),
        (2, "der die und das ist nicht ein mit von zu"),
        (3, "le chat est dans la maison que nous aimons pour toujours"),
        (4, ""),
        (5, "xyzzy plugh"),  # no stopwords in any language
        (6, "a-b c_d 42 3.14"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_text_stats_known_answers(docs):
    got = _by_id(with_text_stats(docs))
    r = got[1]  # "Hello, world! It is a test."
    assert r.n_chars_computed == 27
    assert r.n_tokens_ws == 6
    # BPE-ish: Hello , world ! It is a test . → 9
    assert r.n_tokens_bpe == 9
    assert r.n_punct == 3  # , ! .
    assert abs(r.punct_ratio - 3 / 27) < 1e-12
    # avg token len = (chars - (tokens-1)) / tokens = (27-5)/6
    assert abs(r.avg_token_len - 22 / 6) < 1e-12
    z = got[4]
    assert (z.n_chars_computed, z.n_tokens_ws, z.punct_ratio) == (0, 0, 0.0)
    num = got[6]  # "a-b c_d 42 3.14" → a - b c _ d 42 3 . 14
    assert num.n_tokens_ws == 4
    assert num.n_tokens_bpe == 10


def test_token_count_matches_stats(docs):
    stats = _by_id(with_text_stats(docs))
    quick = _by_id(with_token_count(docs))
    for i in quick:
        assert quick[i].n_tokens_ws == stats[i].n_tokens_ws
        assert quick[i].n_tokens_bpe == stats[i].n_tokens_bpe


def test_language_id(docs):
    got = _by_id(with_language_id(docs))
    assert got[1].lang_pred == "en"
    assert got[2].lang_pred == "de"
    assert got[2].lang_hits_de == 10
    assert got[3].lang_pred == "fr"
    assert got[4].lang_pred == "und"
    assert got[5].lang_pred == "und"


def test_language_id_tie_break_forward_order(spark):
    # "la" hits both fr and es once: en..de..fr wins by forward order
    df = spark.createDataFrame([(1, "la la")], "doc_id bigint, text string")
    assert with_language_id(df).first().lang_pred == "fr"


def test_quality_score_components(spark):
    good = "the cat sat on the mat and it was a very good day for everyone here"
    rows = [
        (1, good),                      # all four components pass
        (2, "the"),                     # too short, stopword ok
        (3, "!!! ??? ;;; ,,, ..."),     # punct-heavy, no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.quality_score for r in with_quality_score(df).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.75  # only the length band fails
    assert got[3] == 0.25  # only the token-length band passes


def test_fingerprint_whitespace_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " hello\nworld ")],
        "doc_id bigint, text string",
    )
    got = _by_id(with_fingerprint(df))
    assert got[1].fp_md5 == got[2].fp_md5 == got[3].fp_md5
    assert got[1].fp_xxh64 == got[2].fp_xxh64
    import hashlib

    assert got[1].fp_md5 == hashlib.md5(b"hello world").hexdigest()


# ---------------------------------------------------------------------------
# round-6 additions: repetition, PII scrub, decontamination
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (1, "alpha beta\nalpha beta\ngamma delta"),   # 1 dup line of 3
        (2, "one two three"),                          # no dups
        (3, ""),                                       # empty
        (4, "x x x x y"),                              # top word x: 4/5
        (5, "b a b a"),                                # tie 2-2 → 'a' wins
        (6, "  \n \n  "),                              # blank lines only
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_stats_known_answers(rep_docs):
    from etl_prometheus2clickhouse_spark.operators.text import repetition_stats

    got = {r.doc_id: r for r in repetition_stats(rep_docs).collect()}
    assert len(got) == 6  # empty docs are kept, not dropped
    r = got[1]
    assert r.n_lines == 3
    assert abs(r.dup_line_frac - 1 / 3) < 1e-12
    assert r.top_word == "alpha" and abs(r.top_word_frac - 2 / 6) < 1e-12
    assert got[2].dup_line_frac == 0.0 and got[2].n_words == 3
    z = got[3]
    assert (z.n_lines, z.n_words, z.top_word, z.top_word_frac) == (0, 0, None, 0.0)
    assert got[4].top_word == "x" and abs(got[4].top_word_frac - 0.8) < 1e-12
    # deterministic tie-break: max count, then lexicographically-min word
    assert got[5].top_word == "a"
    assert (got[6].n_lines, got[6].n_words) == (0, 0)


def test_pii_scrub_counts_and_redacts(spark):
    from etl_prometheus2clickhouse_spark.operators.text import with_pii_scrub

    rows = [
        (1, "mail me at a.b+c@ex-ample.co.uk or b@x.io thanks"),
        (2, "see https://example.com/a?b=c#d and http://x.io/y now"),
        (3, "url with mail https://h.com/u@example.com trailing"),
        (4, "plain text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in with_pii_scrub(df).collect()}
    assert got[1].n_emails == 2 and got[1].n_urls == 0
    assert got[1].text_scrubbed == "mail me at <EMAIL> or <EMAIL> thanks"
    assert got[2].n_urls == 2 and got[2].n_emails == 0
    assert got[2].text_scrubbed == "see <URL> and <URL> now"
    # URL containing an @ is a URL, not an email — counters reconcile
    # exactly with the redaction markers
    assert got[3].text_scrubbed == "url with mail <URL> trailing"
    assert (got[3].n_emails, got[3].n_urls) == (0, 1)
    assert got[4].text_scrubbed == rows[3][1]
    assert (got[4].n_emails, got[4].n_urls) == (0, 0)


def test_ngram_contamination_known_answers(spark):
    from etl_prometheus2clickhouse_spark.operators.text import (
        ngram_contamination,
        word_shingles,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares "quick brown fox"
            (2, "lazy dogs sleep all day"),     # no overlap
            (3, "too short"),                   # < n words → cannot match
            (4, "quick brown fox quick brown fox"),  # repeated shingle
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox runs far")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert set(got) == {1, 4}
    r1 = got[1]
    assert r1.n_shingles == 3 and r1.n_contaminated == 1
    assert abs(r1.contamination_frac - 1 / 3) < 1e-12
    # distinct-shingle semantics: the repeated match counts once
    assert got[4].n_contaminated == 1 and got[4].n_shingles == 4

    # shingle builder: short text yields an empty (not null) array
    sh = corpus.select(word_shingles(F.col("text"), 3).alias("s"))
    sizes = sorted(r.s if r.s is not None else None for r in sh.select(F.size("s").alias("s")).collect())
    assert sizes == [0, 3, 3, 4]


def test_chunk_documents_known_answers(spark):
    from etl_prometheus2clickhouse_spark.operators.text import chunk_documents

    rows = [
        (1, "abcdefghij"),   # 10 chars
        (2, "abc"),          # shorter than one chunk
        (3, ""),             # empty: no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_len, r.chunk_text)
        for r in chunk_documents(df, chunk_chars=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 → "abcd","defg","ghij","j"
    assert got[(1, 0)] == (0, 4, "abcd")
    assert got[(1, 1)] == (3, 4, "defg")
    assert got[(1, 2)] == (6, 4, "ghij")
    assert got[(1, 3)] == (9, 1, "j")
    assert got[(2, 0)] == (0, 3, "abc")
    assert all(d != 3 for d, _ in got)
    # overlap reconstruction: stride-prefixes concatenated == original
    rebuilt = "".join(
        got[(1, i)][2][:3] for i in range(3)
    ) + got[(1, 3)][2]
    assert rebuilt == "abcdefghij"


def test_chunk_documents_validates_args(spark):
    from etl_prometheus2clickhouse_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=0, stride=1)
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=4, stride=0)


def test_chunk_documents_reconstruction_property(spark):
    """Property over random corpora: concatenating each chunk's first
    `stride` characters (plus the final chunk's tail) reconstructs the
    original text exactly, and chunk metadata is self-consistent."""
    import random
    import string

    rng = random.Random(99)
    rows = [
        (
            i,
            "".join(
                rng.choice(string.printable[:70])
                for _ in range(rng.randrange(0, 40))
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from etl_prometheus2clickhouse_spark.operators.text import chunk_documents

    chunk_chars, stride = 7, 5
    got = {}
    for r in chunk_documents(df, chunk_chars=chunk_chars, stride=stride).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = r
    for doc_id, text in rows:
        chunks = got.get(doc_id, {})
        if not text:
            assert chunks == {}
            continue
        ids = sorted(chunks)
        assert ids == list(range(len(ids)))
        rebuilt = "".join(
            chunks[i].chunk_text[:stride] for i in ids[:-1]
        ) + chunks[ids[-1]].chunk_text
        assert rebuilt == text, doc_id
        for i in ids:
            r = chunks[i]
            assert r.chunk_start == i * stride
            assert r.chunk_len == len(r.chunk_text) <= chunk_chars


def test_interval_join_rejects_same_ts_name(spark):
    from etl_prometheus2clickhouse_spark.streaming.joins import (
        interval_join_streams,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "user_id bigint")
    with _pytest.raises(ValueError):
        interval_join_streams(df, df, "user_id", "ts", "ts")


def test_tfidf_top_terms_known_answer(spark):
    """Hand-checkable TF-IDF: scores recomputed in Python must select
    the same terms in the same rank order."""
    import math

    from etl_prometheus2clickhouse_spark.operators.text import (
        tfidf_top_terms,
    )

    docs = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "cherry cherry cherry common"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [
        (r.doc_id, r.word, r.tf, r.df, r.term_rank)
        for r in tfidf_top_terms(df, k=2)
        .orderBy("doc_id", "term_rank")
        .collect()
    ]

    def s(tf, df_):
        return tf * (math.log((1.0 + 3) / (1.0 + df_)) + 1.0)

    # doc 1: apple tf2 df1 -> 2*(ln(2)+1); banana tf1 df2; common tf1 df3
    assert got[0] == (1, "apple", 2, 1, 1)
    assert got[1] == (1, "banana", 1, 2, 2)
    # doc 3: cherry tf3 df2 beats common tf1 df3
    assert (got[4], got[5]) == ((3, "cherry", 3, 2, 1), (3, "common", 1, 3, 2))
    # rounded score matches the Python recomputation
    rows = {(r.doc_id, r.word): r.tfidf_r for r in tfidf_top_terms(df, k=2).collect()}
    assert rows[(1, "apple")] == round(s(2, 1), 6)
    assert rows[(3, "cherry")] == round(s(3, 2), 6)


def test_tfidf_uses_window_group_limit(spark):
    from etl_prometheus2clickhouse_spark.operators.text import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    plan = (
        tfidf_top_terms(df, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError, match="k must be >= 1"):
        tfidf_top_terms(df, k=0)


def test_pack_sequences_known_layout(spark):
    """Hand-checked concat-and-chunk layout: budget 10, docs of 4/7/3/6
    tokens -> starts 0,4,11,14; doc 2 straddles the seq-0/1 boundary,
    doc 4 straddles seq-1/2."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [("s", 1, 4), ("s", 2, 7), ("s", 3, 3), ("s", 4, 6)],
        "g string, id bigint, n int",
    )
    got = {
        r.id: (r.start_tok, r.seq_id, r.seq_offset, r.spans_boundary)
        for r in pack_sequences(df, "g", "id", "n", budget=10).collect()
    }
    assert got == {
        1: (0, 0, 0, False),
        2: (4, 0, 4, True),   # tokens 4..10 cross the seq-0/1 boundary
        3: (11, 1, 1, False),
        4: (14, 1, 4, False),  # tokens 14..19 stay inside seq 1
    }
    # empty docs never span and keep their predecessor's offset
    df2 = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, 0), ("s", 3, 5)], "g string, id bigint, n int"
    )
    got2 = {
        r.id: (r.start_tok, r.seq_id, r.spans_boundary)
        for r in pack_sequences(df2, "g", "id", "n", budget=10).collect()
    }
    assert got2 == {1: (0, 0, False), 2: (10, 1, False), 3: (10, 1, False)}


def test_pack_sequences_strata_independent(spark):
    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 1, 5)], "g string, id bigint, n int"
    )
    rows = pack_sequences(df, "g", "id", "n", budget=8).collect()
    assert all(r.start_tok == 0 and r.seq_id == 0 for r in rows)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "g", "id", "n", budget=0)


def test_pack_sequences_invariants_property(spark):
    """Property-pinned packing invariants on randomized token counts:
    contiguity (each doc starts where its predecessor ended), offsets
    inside the budget, and the straddle flag exactly when the doc's
    tokens cross a boundary."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        ns=st.lists(st.integers(min_value=0, max_value=37), min_size=1, max_size=24),
        budget=st.integers(min_value=1, max_value=19),
    )
    def run(ns, budget):
        df = spark.createDataFrame(
            [("s", i, n) for i, n in enumerate(ns)],
            "g string, id bigint, n int",
        )
        rows = sorted(
            pack_sequences(df, "g", "id", "n", budget=budget).collect(),
            key=lambda r: r.id,
        )
        expect_start = 0
        for r, n in zip(rows, ns):
            assert r.n_tokens == n
            assert r.start_tok == expect_start
            assert r.seq_id == r.start_tok // budget
            assert r.seq_offset == r.start_tok % budget
            assert 0 <= r.seq_offset < budget
            should_span = n > 0 and (r.seq_offset + n) > budget
            assert r.spans_boundary == should_span, (r, n, budget)
            expect_start += n

    run()


def test_pack_sequences_rejects_bad_token_counts(spark):
    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
    )

    neg = spark.createDataFrame(
        [("s", 1, 4), ("s", 2, -5)], "g string, id bigint, n int"
    )
    with pytest.raises(Exception, match="invalid token count -5"):
        pack_sequences(neg, "g", "id", "n", budget=10).collect()
    nul = spark.createDataFrame(
        [("s", 1, None)], "g string, id bigint, n int"
    )
    with pytest.raises(Exception, match="invalid token count NULL"):
        pack_sequences(nul, "g", "id", "n", budget=10).collect()


def test_tfidf_reserved_id_col(spark):
    from etl_prometheus2clickhouse_spark.operators.text import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame([("a b", "x")], "text string, word string")
    with pytest.raises(ValueError, match="reserves"):
        tfidf_top_terms(df, id_col="word", text_col="text")


def test_pack_sequences_bucketed_equals_plain(spark):
    """The bucketed face must reproduce the exact layout of the
    per-stratum window — the concat order is deterministic, so the
    stitched prefix sums have to agree token for token."""
    import random

    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences,
        pack_sequences_bucketed,
    )

    random.seed(11)
    rows = [
        (random.choice(["en", "de"]), i, random.randint(0, 500))
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "lang string, doc_id long, n_tok long"
    ).repartition(8)
    a = pack_sequences(df, "lang", "doc_id", "n_tok", budget=1024)
    b = pack_sequences_bucketed(
        df, "lang", "doc_id", "n_tok", budget=1024,
        bucket=F.floor(F.col("doc_id") / 100),
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pack_sequences_bucketed_rejects_non_monotone_bucket(spark):
    """A hash bucket interleaves ids across buckets and would silently
    scramble the packed layout — the in-plan id-range check raises."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.text import (
        pack_sequences_bucketed,
    )

    df = spark.createDataFrame(
        [("en", i, 5) for i in range(100)], "lang string, doc_id long, n_tok long"
    )
    with pytest.raises(Exception, match="not monotone"):
        pack_sequences_bucketed(
            df, "lang", "doc_id", "n_tok", budget=64,
            bucket=F.pmod(F.xxhash64("doc_id"), F.lit(4)),
        ).collect()


# ---------------------------------------------------------------------------
# bigram-LM perplexity (CCNet-style quality scoring)
# ---------------------------------------------------------------------------

import math

from etl_prometheus2clickhouse_spark.operators.text import lm_perplexity


def test_lm_perplexity_hand_computed_smoothing(spark):
    # reference: one doc "a b a b" → bigrams (a,b)x2, (b,a)x1;
    # contexts c(a·)=2, c(b·)=1; vocab V=2
    ref = spark.createDataFrame([(0, "a b a b")], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "b b"), (3, "c a")], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: r
        for r in lm_perplexity(corpus, ref, alpha=0.5).collect()
    }
    # doc 1: P(b|a) = (2+0.5)/(2+0.5*2) = 2.5/3
    assert out[1].cross_entropy == round(-math.log(2.5 / 3), 6)
    assert out[1].perplexity == round(math.exp(-math.log(2.5 / 3)), 6)
    # doc 2: (b,b) unseen in seen context b: (0+0.5)/(1+1) = 0.25
    assert out[2].cross_entropy == round(-math.log(0.25), 6)
    # doc 3: unseen context c → uniform 1/V = (0.5)/(0.5*2) = 0.5
    assert out[3].cross_entropy == round(-math.log(0.5), 6)
    assert all(r.n_bigrams == 1 for r in out.values())


def test_lm_perplexity_short_docs_absent_and_avg(spark):
    ref = spark.createDataFrame([(0, "x y x y")], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "x y x")], "doc_id bigint, text string"
    )
    out = lm_perplexity(corpus, ref, alpha=0.5).collect()
    # docs 1 and 2 have no bigrams → absent, not scored-as-zero
    assert {r.doc_id for r in out} == {3}
    row = out[0]
    assert row.n_bigrams == 2
    # bigrams (x,y): (2+.5)/(2+1)=2.5/3 ; (y,x): (1+.5)/(1+1)=0.75
    expected = -(math.log(2.5 / 3) + math.log(0.75)) / 2
    assert row.cross_entropy == round(expected, 6)
    assert row.perplexity == round(math.exp(expected), 6)


def test_lm_perplexity_ranks_fluent_above_shuffled(spark, sf_dir):
    # the signal test: text made of reference-frequent bigrams scores
    # lower perplexity than the same tokens in a rare order
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 7 == 0)
    probe = spark.createDataFrame(
        [(900001, "the the the the the the")], "doc_id bigint, text string"
    )
    # compare a self-repeating token (rare bigram) against in-corpus text
    sample_text = docs.where(F.col("doc_id") % 7 != 0).first().text
    probe2 = spark.createDataFrame(
        [(900002, sample_text)], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: r.perplexity
        for r in lm_perplexity(probe.union(probe2), ref).collect()
    }
    assert out[900002] < out[900001]


# ---------------------------------------------------------------------------
# multinomial Naive Bayes classification
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import nb_classify


def test_nb_classify_hand_computed_two_class(spark):
    # reference: class a = "x x y" (c_c=3), class b = "z z" (c_c=2);
    # vocab V = {x, y, z} = 3; priors ln(1/2) each (cancel)
    ref = spark.createDataFrame(
        [(0, "a", "x x y"), (1, "b", "z z")],
        "doc_id bigint, lang string, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "a", "x"), (11, "b", "z"), (12, "a", "q")],
        "doc_id bigint, lang string, text string",
    )
    out = {r.doc_id: r for r in nb_classify(corpus, ref).collect()}
    import math

    # doc 10 "x": P(x|a)=(2+1)/(3+3)=1/2 vs P(x|b)=(0+1)/(2+3)=1/5
    assert out[10].predicted == "a"
    assert out[10].nb_margin == round(
        math.log(0.5) - math.log(0.2), 6
    )
    # doc 11 "z": P(z|a)=1/6 vs P(z|b)=3/5
    assert out[11].predicted == "b"
    # doc 12 "q" is fully OOV: unseen term only — ln(1/6) vs ln(1/5),
    # class b (smaller token total) wins
    assert out[12].predicted == "b"
    assert out[12].nb_margin == round(
        math.log(1 / 5) - math.log(1 / 6), 6
    )
    assert out[10].label == "a" and out[12].label == "a"


def test_nb_classify_planted_vocabulary_is_separable(spark):
    # distinct vocabularies per class → accuracy 1.0: the classifier
    # discriminates when signal exists (the catalog corpus has none —
    # documented there as an algorithmic-parity entry)
    import random

    rng = random.Random(7)
    vocab = {
        "aa": [f"alpha{i}" for i in range(30)],
        "bb": [f"beta{i}" for i in range(30)],
        "cc": [f"gamma{i}" for i in range(30)],
    }
    rows = []
    did = 0
    for cls, words in vocab.items():
        for _ in range(20):
            rows.append(
                (did, cls, " ".join(rng.choice(words) for _ in range(25)))
            )
            did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    ref = df.where(F.col("doc_id") % 2 == 0)
    corpus = df.where(F.col("doc_id") % 2 == 1)
    out = nb_classify(corpus, ref).collect()
    assert len(out) == 30
    assert all(r.predicted == r.label for r in out)
    assert all(r.nb_margin > 0 for r in out)


def test_nb_classify_tie_breaks_lexicographically(spark):
    # symmetric reference → identical rounded scores for both classes
    # on a symmetric probe: the smaller class name must win, matching
    # the SQL oracle's ORDER BY score DESC, cls
    ref = spark.createDataFrame(
        [(0, "b", "x"), (1, "a", "x")],
        "doc_id bigint, lang string, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "a", "x x")], "doc_id bigint, lang string, text string"
    )
    row = nb_classify(corpus, ref).collect()[0]
    assert row.predicted == "a"
    assert row.nb_margin == 0.0


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import bm25_search


def test_bm25_hand_computed_single_term(spark):
    # corpus: d1 = "w w a" (tf=2, dl=3), d2 = "w b" (tf=1, dl=2),
    # d3 = "c c c" (no hit). N=3, avgdl=8/3, df(w)=2.
    import math

    docs = spark.createDataFrame(
        [(1, "w w a"), (2, "w b"), (3, "c c c")],
        "doc_id bigint, text string",
    )
    qs = spark.createDataFrame([(100, ["w"])], "query_id bigint, terms array<string>")
    out = {r.doc_id: r for r in bm25_search(docs, qs, k=10).collect()}
    assert set(out) == {1, 2}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = 8 / 3

    def score(tf, dl):
        return round(
            idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6
        )

    assert out[1].bm25 == score(2, 3)
    assert out[2].bm25 == score(1, 2)
    assert out[1].rank == 1 and out[2].rank == 2


def test_bm25_rare_term_outweighs_common(spark):
    # "rare" appears in 1 of 4 docs, "common" in all 4: a single rare
    # hit must outrank a single common hit at equal tf and dl
    docs = spark.createDataFrame(
        [
            (1, "rare common pad1"),
            (2, "common pad2 pad3"),
            (3, "common pad4 pad5"),
            (4, "common pad6 pad7"),
        ],
        "doc_id bigint, text string",
    )
    qs = spark.createDataFrame(
        [(9, ["rare", "common"])], "query_id bigint, terms array<string>"
    )
    out = bm25_search(docs, qs, k=4).collect()
    assert out[0].doc_id == 1 and out[0].rank == 1  # rare+common hit wins


def test_bm25_top_k_and_duplicate_query_terms(spark):
    docs = spark.createDataFrame(
        [(i, "t filler" + " pad" * i) for i in range(1, 8)],
        "doc_id bigint, text string",
    )
    # duplicate terms in the bag must not double-count (array_distinct)
    qs = spark.createDataFrame(
        [(5, ["t", "t"])], "query_id bigint, terms array<string>"
    )
    out = bm25_search(docs, qs, k=3).collect()
    assert len(out) == 3
    # shorter docs (smaller dl) score higher at equal tf
    assert [r.doc_id for r in out] == [1, 2, 3]


# ---------------------------------------------------------------------------
# broadcast-model size guards: the reference-sized-model contract fails
# LOUD (actionable ValueError) instead of OOMing at broadcast time
# ---------------------------------------------------------------------------


def test_lm_perplexity_model_size_guard_overflow(spark):
    ref = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id bigint, text string"
    )  # 5 distinct bigrams
    corpus = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="lm_perplexity.*broadcast cap"):
        lm_perplexity(corpus, ref, max_model_rows=4).collect()
    # at-cap passes (guard is > cap, not >= cap)
    assert lm_perplexity(corpus, ref, max_model_rows=5).count() == 1


def test_nb_classify_model_size_guard_overflow(spark):
    # dense model = V × n_classes = 3 × 2 = 6 rows
    ref = spark.createDataFrame(
        [(0, "a", "x y"), (1, "b", "z")],
        "doc_id bigint, lang string, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "a", "x")], "doc_id bigint, lang string, text string"
    )
    with pytest.raises(ValueError, match="nb_classify.*broadcast cap"):
        nb_classify(corpus, ref, max_model_rows=5).collect()
    assert nb_classify(corpus, ref, max_model_rows=6).count() == 1


def test_bm25_query_terms_guard_overflow(spark):
    docs = spark.createDataFrame([(1, "t u v")], "doc_id bigint, text string")
    qs = spark.createDataFrame(
        [(9, ["t", "u", "v"])], "query_id bigint, terms array<string>"
    )
    with pytest.raises(ValueError, match="bm25_search.*broadcast cap"):
        bm25_search(docs, qs, max_query_terms=2).collect()
    assert bm25_search(docs, qs, max_query_terms=3).count() == 1


# ---------------------------------------------------------------------------
# trigram Jelinek-Mercer LM perplexity
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import lm_perplexity3


def test_lm_perplexity3_hand_computed_interpolation(spark):
    # reference "a b c a b c": trigrams (a,b,c)x2, (b,c,a), (c,a,b);
    # bigrams (a,b)x2, (b,c)x2, (c,a); unigrams a:2 b:2 c:2, N=6, V=3
    ref = spark.createDataFrame(
        [(0, "a b c a b c")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z")], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: r
        for r in lm_perplexity3(
            corpus, ref, lambdas=(0.5, 0.3, 0.15, 0.05)
        ).collect()
    }
    import math

    # doc 1, trigram (a,b,c): ML3 = 2/2, ML2(c|b) = 2/2, ML1(c) = 2/6
    p1 = 0.5 * 1.0 + 0.3 * 1.0 + 0.15 * (2 / 6) + 0.05 / 3
    assert out[1].n_trigrams == 1
    assert out[1].cross_entropy == round(-math.log(p1), 6)
    assert out[1].perplexity == round(math.exp(-math.log(p1)), 6)
    # doc 2 fully OOV: only the uniform floor survives
    p2 = 0.05 / 3
    assert out[2].cross_entropy == round(-math.log(p2), 6)


def test_lm_perplexity3_short_docs_absent(spark):
    ref = spark.createDataFrame([(0, "x y z x y z")], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "x y"), (2, ""), (3, "x y z x")], "doc_id bigint, text string"
    )
    out = lm_perplexity3(corpus, ref).collect()
    assert {r.doc_id for r in out} == {3}
    assert out[0].n_trigrams == 2


def test_lm_perplexity3_ranks_fluent_above_shuffled(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % 7 == 0)
    probe = spark.createDataFrame(
        [(900001, "the the the the the the")], "doc_id bigint, text string"
    )
    sample_text = docs.where(F.col("doc_id") % 7 != 0).first().text
    probe2 = spark.createDataFrame(
        [(900002, sample_text)], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: r.perplexity
        for r in lm_perplexity3(probe.union(probe2), ref).collect()
    }
    assert out[900002] < out[900001]


def test_lm_perplexity3_model_size_guard_and_lambda_check(spark):
    ref = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id bigint, text string"
    )  # 4 distinct trigrams
    corpus = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="lm_perplexity3.*broadcast cap"):
        lm_perplexity3(corpus, ref, max_model_rows=3).collect()
    assert lm_perplexity3(corpus, ref, max_model_rows=4).count() == 1
    with pytest.raises(ValueError, match="lambdas must sum to 1"):
        lm_perplexity3(corpus, ref, lambdas=(0.5, 0.3, 0.15, 0.15))


# ---------------------------------------------------------------------------
# Gopher quality filter (Rae et al. 2021 App. A)
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import gopher_filter


def test_gopher_rules_known_answers(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then it ran "
        "away with great speed " * 4
    )
    bullets = "\n".join(f"- item {i}" for i in range(20))
    symbols = "the of and " + "# " * 40 + "word " * 60
    rows = [(1, good), (2, "too short"), (3, bullets), (4, symbols), (5, None)]
    out = {
        r.doc_id: r
        for r in gopher_filter(
            spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    assert out[1].keep and out[1].fail_reasons == ""
    assert not out[2].ok_word_count
    assert "word_count" in out[2].fail_reasons
    # 20/20 bullet lines > 90%
    assert not out[3].ok_bullet_lines
    # 40 symbols vs ~103 words → ratio > 0.1
    assert not out[4].ok_symbol_ratio
    # null text: empty doc fails loudly but structurally
    assert not out[5].keep and out[5].n_words == 0


def test_gopher_integer_boundaries_exact(spark):
    # symbol ratio exactly 0.1: 1 symbol per 10 words → kept;
    # one more symbol → dropped (cross-multiplied, no float fuzz)
    base = ("the be to of and that have with w1 w2 " * 5).strip()  # 50 words
    at = base + " #" * 5  # 55 words+symbols: recompute precisely below
    df = spark.createDataFrame(
        [(1, base + " # # # # #"), (2, base + " # # # # # #")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in gopher_filter(df).collect()}
    # 55 words incl. 5 '#' tokens, 5 symbols: 10*5 <= 55 → ok
    assert out[1].ok_symbol_ratio
    # 56 words, 6 symbols: 60 > 56 → fail
    assert not out[2].ok_symbol_ratio


def test_gopher_dup_lines_rule(spark):
    text_dup = ("the be to of and that have with unique words here\n" * 10)
    df = spark.createDataFrame(
        [(1, text_dup)], "doc_id bigint, text string"
    )
    r = gopher_filter(df).collect()[0]
    # 10 lines, 9 duplicates → 90% > 30%
    assert not r.ok_dup_lines and "dup_lines" in r.fail_reasons


# ---------------------------------------------------------------------------
# feature-hashed document vectors
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import (  # noqa: E402
    hashed_doc_vectors,
)


def test_hashed_doc_vectors_exact_signed_counts(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta"), (3, "alpha beta alpha")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in hashed_doc_vectors(df, dim=8).collect()}
    assert out[1].n_tokens == 3 and len(out[1].vec) == 8
    # vector is a pure function of the token multiset
    assert out[1].vec == out[3].vec
    # L1 mass bounded by token count (signs may cancel, never add mass)
    assert sum(abs(v) for v in out[1].vec) <= 3
    assert sum(abs(v) for v in out[2].vec) == 1
    # doc 1 = doc 2 + 2x(alpha's signed bucket): removing beta's
    # contribution leaves exactly alpha's doubled signature
    diff = [a - b for a, b in zip(out[1].vec, out[2].vec)]
    assert sorted(map(abs, diff)) == [0] * 7 + [2]


def test_hashed_doc_vectors_partitioning_independent(spark):
    rows = [(i, f"tok{i % 17} tok{i % 5} common") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = {r.doc_id: r.vec for r in hashed_doc_vectors(df, dim=16).collect()}
    b = {
        r.doc_id: r.vec
        for r in hashed_doc_vectors(df.repartition(13), dim=16).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Cavnar-Trenkle n-gram language ID
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.text import (  # noqa: E402
    ngram_lang_id,
)


def test_ngram_lang_id_separates_planted_languages(spark):
    ref = spark.createDataFrame(
        [
            (1, "der die das und ist nicht", "de"),
            (2, "die der und das ein sein", "de"),
            (3, "le la les une des est", "fr"),
            (4, "la le des les un c'est", "fr"),
            (5, "the and of to in is", "en"),
            (6, "of the to and a was", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    docs = spark.createDataFrame(
        [
            (10, "das und der die nicht hier"),
            (11, "les une la le est alors"),
            (12, "the of and to it was"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in ngram_lang_id(docs, ref).collect()}
    assert out[10].pred_lang == "de"
    assert out[11].pred_lang == "fr"
    assert out[12].pred_lang == "en"
    assert all(r.oop_distance >= 0 for r in out.values())


def test_ngram_lang_id_drops_sub_bigram_docs_and_caps_langs(spark):
    ref = spark.createDataFrame(
        [(1, "aa bb", "x")], "doc_id bigint, text string, lang string"
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "aab")], "doc_id bigint, text string"
    )
    out = ngram_lang_id(docs, ref).collect()
    assert [r.doc_id for r in out] == [2]  # doc 1 has no bigram
    with pytest.raises(ValueError, match="max_langs"):
        ngram_lang_id(docs, ref, max_langs=0)


def test_rrf_fuse_semantics(spark):
    from etl_prometheus2clickhouse_spark.operators.text import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    l2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    out = {r.doc_id: r for r in rrf_fuse([l1, l2], k0=60, k=10).collect()}
    # doc 11 appears in both lists -> fused 1/62 + 1/61 tops the list
    assert out[11].rank == 1
    assert out[11].rrf_score == round(1 / 62 + 1 / 61, 6)
    # docs present in only one list still score (absent term = 0)
    assert out[10].rrf_score == round(1 / 61, 6)
    assert out[13].rrf_score == round(1 / 62, 6)
    # deterministic tie-break: 10 (rank1, list1) vs 13 (rank2? no) —
    # 1/61 > 1/62, so 10 ranks ahead of 13
    assert out[10].rank < out[13].rank

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([l1], k0=60)
    with _pytest.raises(ValueError):
        rrf_fuse([l1, l2], k0=0)


def test_ndcg_at_k_known_answer(spark):
    """Hand-computed nDCG on a 2-query fixture: perfect ranking → 1.0,
    inverted ranking → the closed-form ratio; unjudged docs score 0,
    a query with no positive judgments reports 0.0."""
    import math

    from etl_prometheus2clickhouse_spark.operators.text import ndcg_at_k

    results = spark.createDataFrame(
        [
            # q1: retrieved in EXACTLY ideal order (rels 3, 1, 0)
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            # q2: inverted (rels 0, 1, 3) + an unjudged doc at rank 2
            (2, 20, 1), (2, 99, 2), (2, 21, 3), (2, 22, 4),
            # q3: retrieved docs all unjudged
            (3, 30, 1),
        ],
        "query_id long, doc_id long, rank int",
    )
    judgments = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (1, 12, 0),
         (2, 20, 0), (2, 21, 1), (2, 22, 3)],
        "query_id long, doc_id long, rel int",
    )
    got = {r.query_id: r for r in ndcg_at_k(results, judgments, k=4).collect()}

    def dcg(pairs):
        return sum((2.0 ** r - 1) / math.log2(rk + 1) for rk, r in pairs)

    assert got[1].ndcg == 1.0  # ideal order
    d2 = dcg([(1, 0), (2, 0), (3, 1), (4, 3)])
    i2 = dcg([(1, 3), (2, 1), (3, 0)])
    assert abs(got[2].ndcg - round(d2 / i2, 6)) < 1e-9
    assert got[2].ndcg < 1.0
    assert got[3].dcg == 0.0 and got[3].idcg == 0.0 and got[3].ndcg == 0.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(results, judgments, k=0)


def test_ndcg_at_k_duplicate_judgments_collapse(spark):
    """Duplicate (query, doc) judgment rows must not fan out the DCG
    join or give the ideal ranking two slots for one document: the
    operator collapses them to the max-relevance assessment, so the
    result equals the deduplicated pool's."""
    from etl_prometheus2clickhouse_spark.operators.text import ndcg_at_k

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)],
        "query_id long, doc_id long, rank int",
    )
    dup = spark.createDataFrame(
        [(1, 10, 3), (1, 10, 1), (1, 11, 1), (1, 11, 1)],
        "query_id long, doc_id long, rel int",
    )
    clean = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1)],
        "query_id long, doc_id long, rel int",
    )
    got_dup = ndcg_at_k(results, dup, k=3).collect()[0]
    got_clean = ndcg_at_k(results, clean, k=3).collect()[0]
    assert (got_dup.dcg, got_dup.idcg, got_dup.ndcg) == (
        got_clean.dcg, got_clean.idcg, got_clean.ndcg,
    )
    assert got_dup.ndcg == 1.0
