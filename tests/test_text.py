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
