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


def _enumerate_nbest(word, nll, mpl, n):
    """Independent n-best: brute-force EVERY segmentation (viable for
    short words only), rank by (cost, joined string) — no DP, no
    pruning, no shared code with viterbi_nbest."""
    from etl_prometheus2clickhouse_spark.operators.unigram import UNK_NLL

    def walk(pos):
        if pos == len(word):
            return [(0.0, [])]
        out = []
        for k in range(1, min(len(word) - pos, mpl) + 1):
            piece = word[pos:pos + k]
            c = nll.get(piece)
            if c is None and k == 1 and piece not in nll:
                c = UNK_NLL
            if c is None:
                continue
            for sc, toks in walk(pos + k):
                out.append((c + sc, [piece] + toks))
        return out

    ranked = sorted(
        (cost, " " + " ".join(toks), toks) for cost, toks in walk(0)
    )
    return [toks for _, _, toks in ranked[:n]]


def test_nbest_matches_exhaustive_enumeration(spark, ref_df):
    """viterbi_nbest's per-level pruning is lossless: on every distinct
    short word of a mixed corpus its top-3 equals brute-force
    enumeration of ALL segmentations, and rank 1 equals the best-1
    Viterbi and the independent reference segmenter."""
    from etl_prometheus2clickhouse_spark.operators.unigram import (
        viterbi_nbest,
    )

    model = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    nll = dict(model)
    words = set(
        "the lowest runner runs newest wider widest zebra "
        "quiz77 running lowlow newestest x".split()
    )
    for w in words:
        got = viterbi_nbest(w, nll, MPL, 3)
        want = _enumerate_nbest(w, nll, MPL, 3)
        assert got == want, w
        assert got[0] == viterbi_segment(w, nll, MPL), w
        assert got[0] == unigram_reference_segment(w, model, MPL), w
        # ranked strictly: no duplicate segmentations
        assert len({" ".join(g) for g in got}) == len(got), w
    # over-length words have exactly one (opaque) segmentation
    long_w = "x" * (MAX_WORD_LEN + 1)
    assert viterbi_nbest(long_w, nll, MPL, 3) == [[long_w]]


def test_word_nbest_dataframe_face(spark, ref_df):
    from etl_prometheus2clickhouse_spark.operators.unigram import (
        unigram_word_nbest,
        viterbi_nbest,
    )

    model = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    nll = dict(model)
    docs = spark.createDataFrame(
        [(1, "the lowest runner"), (2, "Zebra runs THE")],
        "doc_id long, text string",
    )
    rows = unigram_word_nbest(docs, model, n=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r.w, []).append((r.rank, r.n_tokens, r.tokens))
    assert set(got) == {"the", "lowest", "runner", "zebra", "runs"}
    for w, entries in got.items():
        entries.sort()
        assert [e[0] for e in entries] == list(
            range(1, len(entries) + 1)
        ), w
        want = viterbi_nbest(w, nll, MPL, 3)
        assert [e[2] for e in entries] == [" ".join(s) for s in want], w
        assert all(e[1] == len(e[2].split()) for e in entries), w


def test_sampled_apply_contract(spark, ref_df):
    """The non-oracled production face: deterministic across calls,
    every emitted word segmentation is a member of that word's n-best
    list, and a large alpha recovers the Viterbi encode exactly."""
    from etl_prometheus2clickhouse_spark.operators.unigram import (
        unigram_apply_sampled,
        viterbi_nbest,
    )

    model = unigram_train(
        ref_df, vocab_size=VOCAB, max_piece_len=MPL, em_iters=ITERS
    )
    nll = dict(model)
    docs = spark.createDataFrame(
        [(i, "the lowest newest runner runs widest") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(
        (r.doc_id, r.n_tokens, r.tokens)
        for r in unigram_apply_sampled(docs, model, n=3, alpha=0.05).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.tokens)
        for r in unigram_apply_sampled(docs, model, n=3, alpha=0.05).collect()
    )
    assert a == b  # hash-draw, not RNG: bit-stable across runs
    # with 40 docs at a flat alpha, at least two docs drew different
    # segmentations of the same text — it actually samples
    assert len({t for _, _, t in a}) > 1
    # every sampled word segmentation is from the word's n-best list
    allowed = {
        w: {" ".join(s) for s in viterbi_nbest(w, nll, MPL, 3)}
        for w in "the lowest newest runner runs widest".split()
    }

    def legal(tokens):
        toks = tokens.split()
        # greedy re-alignment: consume tokens word by word
        i = 0
        for w in "the lowest newest runner runs widest".split():
            for cand in sorted(allowed[w], key=len, reverse=True):
                cl = cand.split()
                if toks[i:i + len(cl)] == cl:
                    i += len(cl)
                    break
            else:
                return False
        return i == len(toks)

    assert all(legal(t) for _, _, t in a)
    # alpha -> inf: the sample IS the Viterbi encode
    hard = sorted(
        (r.doc_id, r.tokens)
        for r in unigram_apply_sampled(
            docs, model, n=3, alpha=1000.0
        ).collect()
    )
    vit = sorted(
        (r.doc_id, r.tokens)
        for r in unigram_apply(docs, model).collect()
    )
    assert hard == vit
