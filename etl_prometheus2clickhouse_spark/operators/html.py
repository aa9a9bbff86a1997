"""HTML → text extraction: the crawl-pipeline front door.

Every text operator in this engine assumes clean text; real
training-data pipelines start from raw HTML, and the first stage of the
CCNet / RefinedWeb lineage (Wenzek et al. LREC 2020; Penedo et al. 2023,
which uses trafilatura) is boilerplate removal: strip the markup,
segment the page into blocks, keep the content blocks, drop chrome
(navigation, footers, link farms). The keep rule here is the
jusText-family heuristic (Pomikálek 2011, "Removing boilerplate and
duplicate content from web corpora"): content blocks are long enough
and have low LINK DENSITY (fraction of their text inside anchor tags);
boilerplate blocks are short or link-heavy.

Spark-first shape — **pure JVM expressions, zero Python in the row
path** (pinned by tests/test_html.py plan-shape test):

1. strip ``<script>``/``<style>`` elements and comments
   (``regexp_replace``, dot-all non-greedy),
2. mark every block-level tag with a ``\\x01`` sentinel and split —
   block segmentation without a parser (the jusText segmentation rule:
   block boundaries are exactly the block-level tags),
3. per block (one ``posexplode``): anchor inner text via
   ``regexp_extract_all`` group capture, tag-strip + entity-decode +
   whitespace-normalize via an expression chain,
4. keep rule on integer arithmetic only (``3·link_chars ≤ text_chars``
   — exact, no float rounding surface for the oracle),
5. one doc-keyed hash aggregate reassembles kept blocks in document
   order.

100 TB: embarrassingly parallel — no shuffle before the final per-doc
aggregate (slim rows: id + block text), filters/projections reach the
scan, whole-stage codegen end to end. The regex subset is deliberately
RE2-compatible (no backreferences, no lookahead) so the DuckDB oracle
replicates the arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level elements: boundaries of jusText-style segmentation.
BLOCK_TAGS = (
    "html|head|body|p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|table|thead|tbody|"
    "tr|td|th|section|article|header|footer|nav|aside|blockquote|br|hr|"
    "title|form|pre"
)

# fixed entity-decode chain; ``&amp;`` LAST so ``&amp;lt;`` decodes to
# the literal text ``&lt;`` (single-pass decode), never to ``<``.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _clean_fragment(c: Column) -> Column:
    """Markup fragment → visible text: strip remaining (inline) tags,
    decode the fixed entity set, collapse whitespace."""
    out = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_link_thirds: int = 1,
) -> DataFrame:
    """Boilerplate-removing text extraction (module docstring).

    Keep rule per block: ``n_words >= min_words`` AND
    ``3 * link_chars <= max_link_thirds * text_chars`` (default: link
    density ≤ 1/3 — jusText's link-density curtain, expressed in
    integers so the SQL oracle is exact).

    Emits one row per input document:
    ``(id, n_blocks, n_kept, n_chars, text)`` where ``n_blocks`` counts
    non-empty blocks, ``text`` is the kept blocks joined by newlines in
    page order, and ``n_chars = length(text)``.
    """
    raw = F.coalesce(F.col(html_col), F.lit(""))
    # 1. drop invisible elements wholesale (script/style bodies are
    # not content; comments may hide markup) — script/style first so a
    # commented-out </script> inside one cannot truncate the strip
    stripped = F.regexp_replace(
        raw, r"(?is)<script\b[^>]*>.*?</script>", " "
    )
    stripped = F.regexp_replace(
        stripped, r"(?is)<style\b[^>]*>.*?</style>", " "
    )
    stripped = F.regexp_replace(stripped, r"(?s)<!--.*?-->", " ")
    # 2. block segmentation: every block-level tag is a boundary
    marked = F.regexp_replace(
        stripped, r"(?i)</?(" + BLOCK_TAGS + r")\b[^>]*>", "\u0001"
    )
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(marked, "\u0001")).alias("pos", "block"),
    )
    # 3. per-block signals — link text from anchor group capture, then
    # the same clean chain for both the block and its anchors
    anchors = F.regexp_extract_all(
        F.col("block"), F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1
    )
    link_chars = F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, a: acc + F.length(_clean_fragment(a)),
    )
    text = _clean_fragment(F.col("block"))
    per_block = blocks.select(
        id_col,
        "pos",
        text.alias("text"),
        link_chars.alias("link_chars"),
    ).select(
        id_col,
        "pos",
        "text",
        (F.length("text") > 0).alias("is_block"),
        F.size(F.split("text", " ")).alias("n_words"),
        "link_chars",
    )
    keep = (
        F.col("is_block")
        & (F.col("n_words") >= min_words)
        & (F.lit(3) * F.col("link_chars") <= max_link_thirds * F.length("text"))
    )
    kept_struct = F.when(keep, F.struct("pos", "text"))
    agg = per_block.groupBy(id_col).agg(
        F.sum(F.col("is_block").cast("long")).alias("n_blocks"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.text,
            ),
            "\n",
        ).alias("text"),
    )
    return agg.select(
        id_col,
        "n_blocks",
        "n_kept",
        F.length("text").cast("long").alias("n_chars"),
        "text",
    )


# ---------------------------------------------------------------------------
# URL features + per-domain caps: the other half of the crawl front
# door (RefinedWeb/C4 both filter and quota BY URL before touching
# text — spammy domains contribute unbounded near-identical pages, so
# real pipelines cap documents per registered domain).
# ---------------------------------------------------------------------------

# two-label public suffixes treated as one (heuristic subset of the
# public-suffix list — enough for the quota semantics; swap in the
# full PSL as a broadcast table for production crawls)
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "co.kr",
    "com.br", "com.cn", "co.in", "co.za",
)


def with_url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``scheme``, ``host``, ``path``, ``tld``, and
    ``registered_domain`` parsed with JVM regexps (RE2-compatible so
    the oracle replicates them exactly). ``registered_domain`` is the
    last two host labels — three when the last two are a known
    two-label public suffix (co.uk-style)."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    )
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    domain = (
        F.when(n <= 1, host)
        .when(
            last2.isin(*TWO_LABEL_SUFFIXES) & (n >= 3),
            F.concat_ws(".", F.element_at(labels, -3), last2),
        )
        .otherwise(last2)
    )
    tld = F.when(n >= 2, F.element_at(labels, -1)).otherwise(F.lit(""))
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("path", path)
        .withColumn("tld", tld)
        .withColumn("registered_domain", domain)
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    domain_col: str = "registered_domain",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain — the
    anti-spam quota. Deterministic: rank by ascending id within the
    domain (swap in a quality column for quality-ranked quotas — same
    plan). WindowGroupLimit shape: map tasks emit ≤ cap rows per
    domain before the single shuffle, so a million-page spam domain
    costs cap rows of shuffle, not a million."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("domain_rank", F.row_number().over(w).cast("int"))
        .where(F.col("domain_rank") <= cap)
    )
