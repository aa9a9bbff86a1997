"""Unigram-LM tokenizer (operators/unigram.py): the driver and
distributed training routes and the independent plain-Python reference
trainer must produce the IDENTICAL piece table on planted corpora, and
the Arrow-batched Viterbi encode must match the reference segmenter
token-for-token — the module's exactness contract."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.unigram import (
    MAX_WORD_LEN,
    unigram_apply,
    unigram_reference_model,
    unigram_reference_segment,
    unigram_train,
    viterbi_segment,
)

TRAIN = [
    "low low low low low lowest lowest",
    "newer newest newest newest wider widest widest",
    "the then this the the then the this",
    "running runner run runs running runner",
]
VOCAB, MPL, ITERS = 40, 4, 3


@pytest.fixture()
def ref_df(spark):
    return spark.createDataFrame([(t,) for t in TRAIN], "text string")


def test_training_routes_and_reference_agree(spark, ref_df):
    driver = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    distributed = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS,
        driver_vocab_threshold=0,
    )
    reference = unigram_reference_model(
        TRAIN, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    assert driver == distributed == reference
    pieces = [p for p, _ in driver]
    # the alphabet is fully covered and real multi-char pieces emerged
    assert set("lowestnrudigh") <= {p for p in pieces if len(p) == 1}
    assert any(len(p) > 1 for p in pieces)
    assert len(pieces) == len(set(pieces))


def test_apply_matches_reference_segmenter(spark, ref_df):
    model = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    docs = spark.createDataFrame(
        [
            (1, "the lowest runner runs"),
            (2, "NEWEST wide things"),          # case folds, OOV word segments
            (3, ""),                             # empty → zero tokens
            (4, "zq9"),                          # fully OOV chars → UNK edges
            (5, "x" * (MAX_WORD_LEN + 1)),       # long word passes through
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.tokens)
        for r in unigram_apply(docs, model).collect()
    }
    for doc_id, text in [
        (1, "the lowest runner runs"),
        (2, "NEWEST wide things"),
        (3, ""),
        (4, "zq9"),
        (5, "x" * (MAX_WORD_LEN + 1)),
    ]:
        toks: list[str] = []
        for w in text.lower().split():
            toks.extend(unigram_reference_segment(w, model))
        assert got[doc_id] == (len(toks), " ".join(toks)), doc_id
    # the long word really did pass through opaque
    assert got[5][1] == "x" * (MAX_WORD_LEN + 1)
    assert got[3] == (0, "")


def test_viterbi_prefers_cheaper_multichar_path():
    # 'ab' piece is far cheaper than a+b: Viterbi must take it, and
    # the engine segmenter must agree with the reference segmenter
    model = [("a", 3.0), ("ab", 0.5), ("b", 3.0), ("c", 1.0)]
    assert viterbi_segment("abc", dict(model), 2) == ["ab", "c"]
    assert unigram_reference_segment("abc", model, 2) == ["ab", "c"]
    # tie-break: two equal-cost paths pick the lexicographically
    # smaller token string
    tie = [("x", 1.0), ("xx", 2.0)]
    assert viterbi_segment("xx", dict(tie), 2) == [
        "x", "x"
    ] == unigram_reference_segment("xx", tie, 2)


def test_oov_char_uses_unk_edge():
    model = [("a", 1.0)]
    assert viterbi_segment("a9a", dict(model), 1) == ["a", "9", "a"]


def test_encode_ids_matches_vocab_mapping(spark, ref_df):
    from etl_prometheus2clickhouse_spark.operators.unigram import (
        unigram_encode_ids,
        unigram_vocab,
    )

    model = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    vocab = unigram_vocab(model)
    unk = len(vocab)
    docs = spark.createDataFrame(
        [(1, "the lowest runner"), (2, "zq9"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, list(r.ids))
        for r in unigram_encode_ids(docs, model).collect()
    }
    for doc_id, text in [(1, "the lowest runner"), (2, "zq9"), (3, "")]:
        ids = []
        for w in text.lower().split():
            for t in unigram_reference_segment(w, model):
                ids.append(vocab.get(t, unk))
        assert got[doc_id] == (len(ids), ids), doc_id
    # the OOV chars 'z','q','9' are not in the training alphabet → UNK
    assert unk in got[2][1]
    assert got[3] == (0, [])


def test_empty_reference_fails_loud(spark):
    empty = spark.createDataFrame([("",), ("   ",)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        unigram_train(empty, vocab_size=8)
