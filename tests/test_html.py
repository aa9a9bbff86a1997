"""HTML→text extraction (operators/html.py): known-answer boilerplate
removal, entity/whitespace handling, and the expression-only plan
shape."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.html import html_extract


@pytest.fixture(scope="module")
def page(spark):
    html = (
        '<html><head><title>T</title>'
        '<script>var x = "<p>fake</p>";</script>'
        "<style>.a { color: red; }</style></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/a">About us</a></div>'
        "<!-- comment <p>hidden</p> -->"
        "<div><p>This is the first real paragraph of content here.</p>"
        '<p>Second paragraph with an inline <a href="/x">link</a> '
        "and more than five words total.</p></div>"
        '<div class="footer"><a href="/t">Terms</a> '
        '<a href="/p">Privacy</a> c</div>'
        "</body></html>"
    )
    return spark.createDataFrame(
        [
            (1, html),
            (2, ""),
            (3, None),
            (4, "plain text no markup but more than five words"),
        ],
        "doc_id bigint, html string",
    )


def test_boilerplate_dropped_content_kept(page):
    out = {r.doc_id: r for r in html_extract(page).collect()}
    r = out[1]
    # blocks: title, nav, 2 paragraphs, footer (script/style/comment
    # stripped before segmentation)
    assert r.n_blocks == 5
    assert r.n_kept == 2
    assert r.text == (
        "This is the first real paragraph of content here.\n"
        "Second paragraph with an inline link and more than five words "
        "total."
    )
    assert r.n_chars == len(r.text)
    # "fake", "hidden", nav and footer text must not leak through
    assert "fake" not in r.text and "hidden" not in r.text
    assert "Home" not in r.text and "Privacy" not in r.text


def test_empty_null_and_plain_inputs(page):
    out = {r.doc_id: r for r in html_extract(page).collect()}
    assert (out[2].n_blocks, out[2].n_kept, out[2].text) == (0, 0, "")
    assert (out[3].n_blocks, out[3].n_kept, out[3].text) == (0, 0, "")
    # tag-free input is one block, kept if long enough
    assert out[4].n_kept == 1
    assert out[4].text == "plain text no markup but more than five words"


def test_link_density_curtain_is_integer_exact(spark):
    # exactly at the 1/3 boundary: 3*link_chars == text_chars → kept
    # ("aaaa" link + 8 more chars = 12 chars text, 4 link chars);
    # one char more of link text → dropped
    at = '<p><a href="/">aaaa</a> b c d e f</p>'  # text "aaaa b c d e f"
    over = '<p><a href="/">aaaaa</a> b c d e</p>'  # text "aaaaa b c d e"
    df = spark.createDataFrame(
        [(1, at), (2, over)], "doc_id bigint, html string"
    )
    out = {r.doc_id: r for r in html_extract(df, min_words=2).collect()}
    assert out[1].n_kept == 1  # 3*4 = 12 ≤ len("aaaa b c d e f") = 14
    assert out[2].n_kept == 0  # 3*5 = 15 > len("aaaaa b c d e") = 13


def test_entities_decoded_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b &lt; c &nbsp; d &#39;e&#39; f&amp;g</p>")],
        "doc_id bigint, html string",
    )
    r = html_extract(df, min_words=1).collect()[0]
    # &amp;lt; → literal "&lt;" (no double decode); &lt; → "<"
    assert r.text == "a &lt; b < c d 'e' f&g"


def test_plan_is_expression_only(spark):
    """The 100 TB contract: zero Python in the row path — no
    Arrow/Python eval nodes, and the only exchange is the final
    doc-keyed aggregate with a map-side partial."""
    from etl_prometheus2clickhouse_spark.plans.catalog import ALL_QUERIES

    df = ALL_QUERIES["html_extract"](spark, "/root/testdata/sf0.001")
    p = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in p
    assert "BatchEvalPython" not in p
    assert "mapInPandas" not in p.lower()
    import re

    shuffles = re.findall(r"^\(\d+\) Exchange$", p, flags=re.M)
    assert len(shuffles) == 1  # only the final per-doc aggregate
    assert "partial_" in p  # map-side combine before it


# ---------------------------------------------------------------------------
# URL features + per-domain caps
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.html import (
    cap_per_domain,
    with_url_features,
)


def test_url_parsing_known_answers(spark):
    rows = [
        (1, "https://www.news3.com/a/1?x=2"),
        (2, "http://sub.shop.co.uk/p"),
        (3, "https://data.org"),
        (4, None),
        (5, "HTTPS://WWW.News3.COM/c"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r.doc_id: r for r in with_url_features(df).collect()}
    assert (got[1].scheme, got[1].host, got[1].path, got[1].tld) == (
        "https", "www.news3.com", "/a/1", "com",
    )
    assert got[1].registered_domain == "news3.com"
    # two-label public suffix keeps three labels
    assert got[2].registered_domain == "shop.co.uk"
    # bare registrable host: domain == host, path empty
    assert got[3].registered_domain == "data.org" and got[3].path == ""
    assert got[4].host == "" and got[4].registered_domain == ""
    # case-insensitive scheme + host
    assert (got[5].scheme, got[5].host) == ("https", "www.news3.com")


def test_cap_per_domain_quota_and_determinism(spark):
    rows = [(i, f"https://spam.com/{i}") for i in range(10)] + [
        (100, "https://ok.org/a")
    ]
    df = with_url_features(
        spark.createDataFrame(rows, "doc_id bigint, url string")
    )
    kept = cap_per_domain(df, cap=3).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.registered_domain, []).append(r.doc_id)
    # lowest ids survive the quota, rank is deterministic
    assert sorted(by_dom["spam.com"]) == [0, 1, 2]
    assert by_dom["ok.org"] == [100]


def test_cap_per_domain_plan_is_windowgrouplimit(spark):
    """The 100 TB property: map tasks emit ≤ cap rows per domain
    BEFORE the shuffle (WindowGroupLimit), so a spam domain costs cap
    rows of shuffle, not its page count."""
    df = with_url_features(
        spark.createDataFrame(
            [(1, "https://a.com/x")], "doc_id bigint, url string"
        )
    )
    p = spark._jvm.PythonSQLUtils.explainString(
        cap_per_domain(df, cap=5)._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in p
