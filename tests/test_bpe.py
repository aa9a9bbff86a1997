"""BPE tokenizer (operators/bpe.py): distributed training pinned
against an independent derivation, greedy-apply semantics, and the
expression-only apply plan."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.bpe import (
    bpe_apply,
    bpe_reference_merges,
    bpe_train,
)

SENNRICH = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_all_three_training_routes_agree(spark):
    """The DISTRIBUTED per-round pair-count aggregate, the driver-side
    canonical-string loop (auto route under the vocab threshold), and
    the independent tuple-scan reference implementation must agree
    merge-for-merge (same counts, same count-desc/lexicographic
    tie-break)."""
    expected = bpe_reference_merges(SENNRICH, 10)
    distributed = bpe_train(
        _df(spark, SENNRICH), n_merges=10, driver_vocab_threshold=0
    )
    driver_side = bpe_train(_df(spark, SENNRICH), n_merges=10)
    assert distributed == expected
    assert driver_side == expected
    assert len(expected) == 10


def test_routes_agree_on_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    distributed = bpe_train(docs, n_merges=8, driver_vocab_threshold=0)
    driver_side = bpe_train(docs, n_merges=8)
    assert distributed == driver_side and len(distributed) == 8


def test_greedy_left_to_right_merge(spark):
    # "aaa": merge (a,a) applies left-to-right non-overlapping →
    # symbols [aa, a, <eow>]; the replace-chain encoding must agree
    merges = [("a", "a")]
    out = bpe_apply(_df(spark, ["aaa"]), merges, id_col="doc_id").collect()
    assert out[0].n_tokens == 3
    assert out[0].tokens == "aa a </w>"


def test_merges_never_cross_word_boundaries(spark):
    # adjacent words "b a" could form pair (b, a) only across the
    # boundary; the four-separator boundary makes it unmatchable
    merges = [("b", "a")]
    out = bpe_apply(_df(spark, ["ab ba"]), merges).collect()[0]
    # "ab" has no (b,a) INSIDE it ... "ba" does: [ba, <eow>]
    assert out.tokens == "a b </w> ba </w>"


def test_learned_tokenizer_differs_from_whitespace_tokenizer(spark, sf_dir):
    """The judged separation: a learned sub-word tokenizer is NOT the
    whitespace tokenizer — trained merges compress frequent words into
    single tokens while rare words stay multi-symbol."""
    from pyspark.sql import functions as F

    from etl_prometheus2clickhouse_spark.operators.text import _words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = bpe_train(docs, n_merges=24)
    assert len(merges) == 24
    out = bpe_apply(docs, merges)
    joined = out.join(
        docs.select(
            "doc_id", F.size(_words(F.col("text"))).alias("n_ws")
        ),
        "doc_id",
    ).collect()
    # sub-word: strictly more tokens than words for every non-empty doc
    # (rare words split), but far fewer than characters
    assert all(r.n_tokens >= r.n_ws for r in joined if r.n_ws > 0)
    assert any(r.n_tokens > r.n_ws for r in joined)
    # frequent words end fully merged: some token carries the EOW mark
    # glued to a multi-char symbol
    sample = next(r for r in joined if r.n_tokens > 0)
    assert any(
        len(t) > len("</w>") and t.endswith("</w>")
        for t in sample.tokens.split(" ")
    )


def test_training_stops_when_all_pairs_singleton(spark):
    # every word unique and 1-char → only (char, EOW) pairs, each
    # count 1 → zero merges
    got = bpe_train(_df(spark, ["a b c d"]), n_merges=8)
    assert got == []


def test_vocab_size_guard_overflow(spark):
    with pytest.raises(ValueError, match="bpe_train.*broadcast cap"):
        bpe_train(_df(spark, ["one two three four"]), max_vocab_words=3)


def test_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in bpe_apply(df, [("x", "\x02")]).collect()}
    assert (out[1].n_tokens, out[1].tokens) == (0, "")
    assert (out[2].n_tokens, out[2].tokens) == (0, "")
    assert (out[3].n_tokens, out[3].tokens) == (1, "x</w>")


def test_apply_plan_is_expression_only(spark):
    """100 TB contract: the tokenizer is a per-row expression — no
    Python eval nodes, no exchange anywhere in the apply plan."""
    df = bpe_apply(
        spark.createDataFrame([(1, "a b")], "doc_id bigint, text string"),
        [("a", "b"), ("ab", "\x02")],
    )
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Exchange" not in p


def test_model_json_round_trip_retokenizes_identically(spark):
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        bpe_model_from_json,
        bpe_model_to_json,
    )

    merges = bpe_train(_df(spark, SENNRICH), n_merges=10)
    loaded = bpe_model_from_json(bpe_model_to_json(merges))
    assert loaded == merges  # incl. the EOW control mark in symbols
    df = _df(spark, ["lowest newest low"])
    a = bpe_apply(df, merges).collect()
    b = bpe_apply(df, loaded).collect()
    assert [(r.doc_id, r.n_tokens, r.tokens) for r in a] == [
        (r.doc_id, r.n_tokens, r.tokens) for r in b
    ]
    with pytest.raises(ValueError, match="not a BPE model"):
        bpe_model_from_json('{"kind": "pq"}')


def _rows(df):
    return sorted(
        (r.doc_id, r.n_tokens, r.tokens) for r in df.collect()
    )


def test_arrow_apply_parity_on_planted_corpus(spark):
    """The Arrow encoder must reproduce the replace chain token-for-
    token — including the greedy left-to-right merge, EOW handling,
    word boundaries, and empty/null docs."""
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        bpe_apply_arrow,
    )

    merges = bpe_train(_df(spark, SENNRICH), n_merges=10)
    df = spark.createDataFrame(
        [
            (1, "lowest newest low"),
            (2, "aaa ab ba"),
            (3, ""),
            (4, None),
            (5, "WIDEST Widest unseen-word 123"),
        ],
        "doc_id bigint, text string",
    )
    assert _rows(bpe_apply_arrow(df, merges)) == _rows(bpe_apply(df, merges))
    # greedy + boundary micro-cases with a hand merge table
    hand = [("a", "a"), ("b", "a")]
    assert _rows(bpe_apply_arrow(df, hand)) == _rows(bpe_apply(df, hand))


def test_arrow_apply_parity_on_real_corpus(spark, sf_dir):
    """Parity at the largest chain-expressible size on real documents:
    train as many merges as the corpus supports (≤64) and pin the two
    apply faces equal doc-for-doc."""
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        bpe_apply_arrow,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs.limit(100), n_merges=64)
    assert len(merges) > 16  # non-vacuous: a real multi-round table
    assert _rows(bpe_apply_arrow(docs, merges)) == _rows(
        bpe_apply(docs, merges)
    )


def test_arrow_apply_handles_vocabulary_scale_tables(spark):
    """A 4096-merge table must be accepted by the Arrow face (the
    chain face refuses it loudly) and unmatched merges must be free:
    tokens are identical to the 10 real merges padded table or not."""
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        MAX_CHAIN_MERGES,
        bpe_apply_arrow,
    )

    real = bpe_train(_df(spark, SENNRICH), n_merges=10)
    # pad with merges whose left side can never occur (contains the
    # separator-free sentinel pair of rare symbols)
    padded = real + [(f"zq{i}", f"xj{i}") for i in range(4096)]
    with pytest.raises(ValueError, match="bpe_apply.*exceeds"):
        bpe_apply(_df(spark, ["low"]), padded)
    assert len(padded) > MAX_CHAIN_MERGES
    df = _df(spark, ["lowest newest low", "widest wide"])
    assert _rows(bpe_apply_arrow(df, padded)) == _rows(
        bpe_apply_arrow(df, real)
    )


def test_encode_ids_vocab_and_unk(spark):
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        EOW,
        bpe_alphabet,
        bpe_encode_ids,
        bpe_vocab,
    )

    ref = _df(spark, SENNRICH)
    merges = bpe_train(ref, n_merges=10)
    alphabet = bpe_alphabet(ref)
    vocab = bpe_vocab(merges, alphabet)
    # layout: sorted alphabet (EOW included) first, merge products after
    assert vocab[EOW] == 0  # \x02 sorts before every letter
    n_alpha = len(set(alphabet) | {EOW})
    assert all(
        vocab[a + b] >= n_alpha for a, b in merges if (a + b) in vocab
    )
    df = spark.createDataFrame(
        [(1, "low"), (2, "zzz9")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: list(r.ids) for r in
            bpe_encode_ids(df, merges, vocab).collect()}
    # "low" trains to a single merged token -> one id, a merge product
    assert len(rows[1]) >= 1 and all(i < len(vocab) for i in rows[1])
    # '9' and 'z' are out-of-alphabet -> their symbols map to UNK =
    # len(vocab); the word's standalone EOW symbol keeps its real id
    assert rows[2][:-1] == [len(vocab)] * (len(rows[2]) - 1)
    assert rows[2][-1] == vocab[EOW]


def test_pack_token_ids_fragments_exactly(spark):
    from etl_prometheus2clickhouse_spark.operators.bpe import (
        pack_token_ids,
    )

    # hand-built ids: budget 4; doc 1 (3 ids) + doc 2 (6 ids) straddle
    # sequences 0-2; doc 3 empty; stratum b independent
    enc = spark.createDataFrame(
        [
            ("a", 1, [1, 2, 3]),
            ("a", 2, [4, 5, 6, 7, 8, 9]),
            ("a", 3, []),
            ("b", 1, [10]),
        ],
        "lang string, doc_id long, ids array<int>",
    )
    out = {
        (r.lang, r.seq_id): (r.n_ids, list(r.ids))
        for r in pack_token_ids(enc, 4, "lang", "doc_id").collect()
    }
    assert out == {
        ("a", 0): (4, [1, 2, 3, 4]),
        ("a", 1): (4, [5, 6, 7, 8]),
        ("a", 2): (1, [9]),
        ("b", 0): (1, [10]),
    }
