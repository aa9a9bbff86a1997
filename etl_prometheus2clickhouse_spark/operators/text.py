"""Text-analysis operators over a document table (engine extension for
large-scale training-data pipelines; BASELINE.json north star).

All pure built-in expressions — whole-stage codegen, no Python in the hot
path, embarrassingly parallel (no shuffle), so they scale linearly with
input splits at 100 TB.

Operators:
- :func:`with_text_stats`     — token/char/punct/whitespace counts and ratios.
- :func:`with_quality_score`  — composite quality heuristic with
  SQL-expressible components (oracle-checkable).
- :func:`with_language_id`    — stopword-hit language heuristic for a
  small fixed language set (en/de/fr/es), expressed as regexp counts.
- :func:`with_fingerprint`    — deterministic document fingerprints
  (md5 hex of normalized text + xxhash64).
- :func:`with_token_count`    — whitespace and BPE-ish regex token counts.
- :func:`repetition_stats`    — Gopher-style repetition signals
  (duplicate-line fraction, most-frequent-word mass).
- :func:`with_pii_scrub`      — email/URL redaction with match counts.
- :func:`ngram_contamination` — corpus-vs-benchmark n-gram collision
  join (train/test decontamination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.partitioning import spread

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer family, simplified to an ASCII-safe regex).
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Top stopwords per language — small fixed lists so the whole heuristic
# stays a constant-folded regexp per language.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "en", "una", "es", "por", "con"],
}


def _stopword_hits(col: Column, lang: str) -> Column:
    pattern = r"(?i)\b(" + "|".join(_STOPWORDS[lang]) + r")\b"
    return F.coalesce(F.regexp_count(col, F.lit(pattern)), F.lit(0))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append char/token/punctuation/whitespace statistics."""
    c = F.col(text_col)
    n_chars = F.length(c)
    ws_tokens = F.size(
        F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)
    )
    return (
        df.withColumn("n_chars_computed", n_chars.cast("bigint"))
        .withColumn("n_tokens_ws", ws_tokens.cast("bigint"))
        .withColumn(
            "n_tokens_bpe",
            F.coalesce(F.regexp_count(c, F.lit(BPE_TOKEN_REGEX)), F.lit(0)).cast(
                "bigint"
            ),
        )
        .withColumn(
            "n_punct",
            F.coalesce(
                F.regexp_count(c, F.lit(r"[!-/:-@\[-`{-~]")), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, F.col("n_punct") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "avg_token_len",
            F.when(
                F.col("n_tokens_ws") > 0,
                (n_chars - (F.col("n_tokens_ws") - 1)) / F.col("n_tokens_ws"),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Just the two token counters (cheap path for budget accounting)."""
    c = F.col(text_col)
    return df.withColumn(
        "n_tokens_ws",
        F.size(F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)).cast(
            "bigint"
        ),
    ).withColumn(
        "n_tokens_bpe",
        F.coalesce(F.regexp_count(c, F.lit(BPE_TOKEN_REGEX)), F.lit(0)).cast(
            "bigint"
        ),
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-count language heuristic.

    Score per language = stopword hits; ``lang_pred`` = argmax with a
    deterministic tie-break on language code; ``und`` (undetermined) when
    no stopword fires. A fixed CASE-WHEN cascade, so DuckDB can replicate
    it exactly for the correctness oracle.
    """
    c = F.col(text_col)
    out = df
    for lang in _STOPWORDS:
        out = out.withColumn(f"lang_hits_{lang}", _stopword_hits(c, lang))
    best = F.greatest(*[F.col(f"lang_hits_{code}") for code in _STOPWORDS])
    pred = F.lit("und")
    # reversed: earlier languages win ties (first-match in forward order)
    for lang in reversed(list(_STOPWORDS)):
        pred = F.when(
            (best > 0) & (F.col(f"lang_hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals made
    SQL-simple): length band, punctuation sanity, stopword presence,
    mean-token-length band. Deterministic, oracle-checkable."""
    out = with_text_stats(df, text_col)
    out = with_language_id(out, text_col)
    length_ok = (F.col("n_chars_computed") >= 50) & (
        F.col("n_chars_computed") <= 20000
    )
    punct_ok = F.col("punct_ratio") <= 0.2
    stop_ok = F.col("lang_pred") != "und"
    tok_ok = (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)
    score = (
        length_ok.cast("int") * 0.25
        + punct_ok.cast("int") * 0.25
        + stop_ok.cast("int") * 0.25
        + tok_ok.cast("int") * 0.25
    )
    return out.withColumn("quality_score", score.cast("double"))


# PII-ish patterns, ASCII-safe and identical under Java regex (Spark)
# and RE2 (DuckDB) so the scrub is oracle-checkable cross-engine.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_REGEX = r"https?://[^\s]+"


def _words(c: Column) -> Column:
    """Lowercased whitespace-token array with empties dropped."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals.

    Emits per document:

    - ``n_lines`` / ``dup_line_frac`` — non-blank line count and the
      fraction of lines that are repeats of an earlier line. Pure
      array expressions (split → filter → array_distinct), shuffle-free
      and whole-stage-codegen'd.
    - ``n_words`` / ``top_word`` / ``top_word_frac`` — total word
      count, the most frequent word (ties broken lexicographically so
      the result is engine-independent), and the fraction of all words
      it accounts for. This is a per-document word-count: one
      hash aggregation keyed on (id, word) with map-side combine, then
      a per-id reduction — both embarrassingly parallel at 100 TB
      (key cardinality scales with the corpus, no global hot key).

    High repetition on either axis is the classic low-quality signal
    used by training-data pipelines (boilerplate, scraped nav bars,
    keyword stuffing).
    """
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    line_stats = df.select(
        id_col,
        n_lines.cast("bigint").alias("n_lines"),
        F.when(
            n_lines > 0,
            (n_lines - n_distinct_lines).cast("double") / n_lines,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
    )

    # tokenize in its own projection + explode_outer: a plain explode
    # of the tokenizer expression triggers InferFiltersFromGenerate,
    # which re-evaluates the whole split/filter chain interpreted in a
    # pushed-down size() filter (see ngram_contamination docstring)
    words = (
        df.select(F.col(id_col), _words(c).alias("__toks"))
        .select(F.col(id_col), F.explode_outer("__toks").alias("w"))
        .where(F.col("w").isNotNull())
    )
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("cnt"))
    # min(struct(-cnt, w)) == (max count, then lexicographically-min
    # word): a deterministic argmax without a window sort.
    top = wc.groupBy(id_col).agg(
        F.min(F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("w"))).alias("m"),
        F.sum("cnt").alias("n_words"),
    )
    top = top.select(
        id_col,
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("m.w").alias("top_word"),
        ((-F.col("m.neg_cnt")).cast("double") / F.col("n_words")).alias(
            "top_word_frac"
        ),
    )
    out = line_stats.join(top, id_col, "left")
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        F.coalesce(F.col("n_words"), F.lit(0).cast("bigint")).alias("n_words"),
        "top_word",
        F.coalesce(F.col("top_word_frac"), F.lit(0.0)).alias("top_word_frac"),
    )


def top_k_words(
    df: DataFrame,
    stratum_col: str,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact heavy hitters: the ``k`` most frequent words per stratum
    (corpus vocabulary analysis — stopword discovery, boilerplate
    tokens, language drift).

    Shape: tokenize-project + explode_outer (see
    :func:`ngram_contamination` for why not plain explode), one
    map-side-combining count keyed by (stratum, word) — cardinality is
    the vocabulary, not the corpus — then per-stratum top-k as
    ``row_number() <= k`` over (count desc, word asc), which Spark
    executes with WindowGroupLimit: map tasks emit at most k words per
    stratum. Deterministic tie-break on the word itself.
    """
    from pyspark.sql import Window

    words = (
        df.select(F.col(stratum_col), _words(F.col(text_col)).alias("__toks"))
        .select(F.col(stratum_col), F.explode_outer("__toks").alias("w"))
        .where(F.col("w").isNotNull())
    )
    wc = words.groupBy(stratum_col, "w").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    win = Window.partitionBy(stratum_col).orderBy(
        F.col("n_occurrences").desc(), F.col("w")
    )
    return (
        wc.withColumn("word_rank", F.row_number().over(win).cast("int"))
        .where(F.col("word_rank") <= k)
        .select(stratum_col, F.col("w").alias("word"), "n_occurrences", "word_rank")
    )


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact email addresses and URLs.

    URLs are scrubbed first (``<URL>``), then emails (``<EMAIL>``) on
    the URL-scrubbed text — and ``n_emails`` is counted on the SAME
    URL-scrubbed text, so the counters reconcile exactly with the
    redaction markers: an address embedded in a URL counts as (and is
    scrubbed as) a URL, never double-booked as an email. All JVM
    regex expressions: shuffle-free, linear in input splits.
    """
    c = F.col(text_col)
    url_scrubbed = F.regexp_replace(c, URL_REGEX, "<URL>")
    return (
        df.withColumn(
            "n_emails",
            F.coalesce(
                F.regexp_count(url_scrubbed, F.lit(EMAIL_REGEX)), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "n_urls",
            F.coalesce(F.regexp_count(c, F.lit(URL_REGEX)), F.lit(0)).cast(
                "bigint"
            ),
        )
        .withColumn(
            "text_scrubbed",
            F.regexp_replace(url_scrubbed, EMAIL_REGEX, "<EMAIL>"),
        )
    )


def shingles_of_tokens(toks: Column, n: int) -> Column:
    """All ``n``-word shingles of a token-array column, space-joined
    (empty array when fewer than ``n`` tokens). Pass a MATERIALIZED
    column (from its own projection), not the tokenizer expression
    inline: the slice-per-position lambda references its input once per
    shingle, so an inlined ``split``+``filter`` would re-tokenize the
    document O(shingles) times (measured 3-4× wall on the contamination
    join before the split)."""
    n_sh = F.size(toks) - (n - 1)
    return F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(c: Column, n: int = 5) -> Column:
    """All ``n``-word shingles of a text column (convenience form —
    prefer tokenizing into a projected column and calling
    :func:`shingles_of_tokens` in anything hot)."""
    return shingles_of_tokens(_words(c), n)


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Train/test decontamination: flag corpus documents sharing any
    word ``n``-gram with a benchmark set.

    Both sides are expanded to DISTINCT shingles (per document on the
    corpus side, globally on the benchmark side) and equi-joined on the
    shingle string; hits aggregate back to one row per contaminated
    document with ``n_shingles`` (document shingle count),
    ``n_contaminated`` (distinct shingles that collided) and
    ``contamination_frac``.

    Scale shape: the benchmark side is deduplicated before the join and
    carries only the shingle key, so the join is a shuffle hash join on
    an evenly-hashed string key (or a broadcast join when the benchmark
    is small — Catalyst/AQE picks); the corpus side never materializes
    more than its exploded shingles, and the final rollup is a
    map-side-combining count keyed by document. In production the join
    key would be ``xxhash64(shingle)`` to shrink shuffle width — kept
    as the raw string here so the DuckDB oracle is byte-identical.

    Tokenization is materialized in its own projection, and the shingle
    count + array are projected BEFORE the explode, so the tokenizer
    runs once per document and the explode carries only precomputed
    columns (inlining either one re-evaluates it per shingle row).
    ``explode_outer`` (with a post-explode null filter) rather than
    ``explode``: the InferFiltersFromGenerate rule rewrites a plain
    explode into a pre-Generate ``size(arr) > 0`` filter with the WHOLE
    generator expression inlined and pushed below the projections —
    interpreted, outside codegen, re-tokenizing every document several
    times per row (measured: the filter alone was ~7 s of an 8 s query
    at sf0.1). The outer variant is exempt from that rule.
    """
    corpus_sh = (
        corpus.select(
            F.col(id_col), _words(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            (F.size("__toks") - (n - 1)).cast("bigint").alias("n_shingles"),
            F.array_distinct(
                shingles_of_tokens(F.col("__toks"), n)
            ).alias("__arr"),
        )
        .select(id_col, "n_shingles", F.explode_outer("__arr").alias("sh"))
        .where(F.col("sh").isNotNull())
    )
    bench_sh = (
        benchmark.select(_words(F.col(text_col)).alias("__toks"))
        .select(
            F.explode_outer(
                shingles_of_tokens(F.col("__toks"), n)
            ).alias("sh")
        )
        .where(F.col("sh").isNotNull())
        .distinct()
    )
    hits = corpus_sh.join(bench_sh, "sh").groupBy(id_col, "n_shingles").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return hits.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        (F.col("n_contaminated").cast("double") / F.col("n_shingles")).alias(
            "contamination_frac"
        ),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the pre-tokenization chunking step of a training pipeline
    (``stride < chunk_chars`` gives ``chunk_chars - stride`` chars of
    overlap between consecutive chunks).

    Chunks start at every multiple of ``stride`` strictly below the
    text length; the final chunk may be short. Empty documents emit no
    chunks. One row per (doc, chunk) with ``chunk_id`` (start/stride —
    position-derived, no ordinality dependence), ``chunk_start``
    (0-based), ``chunk_len``, and the chunk text.

    Shape: a start-offset array projected per document then
    ``explode_outer`` (see :func:`ngram_contamination` for why not
    plain explode) and one ``substr`` per chunk — shuffle-free,
    whole-stage codegen, output size ~ input × (1 + overlap ratio).
    """
    if chunk_chars < 1 or stride < 1:
        raise ValueError("chunk_chars and stride must be >= 1")
    c = F.col(text_col)
    n = F.length(c)
    starts = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.floor((n - 1) / stride)),
            lambda i: (i * stride).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    out = (
        df.select(F.col(id_col), c.alias("__text"), starts.alias("__starts"))
        .select(
            id_col, "__text", F.explode_outer("__starts").alias("chunk_start")
        )
        .where(F.col("chunk_start").isNotNull())
    )
    chunk = F.col("__text").substr(
        (F.col("chunk_start") + 1).cast("int"), F.lit(chunk_chars)
    )
    return out.select(
        id_col,
        (F.col("chunk_start") / stride).cast("long").alias("chunk_id"),
        "chunk_start",
        F.length(chunk).cast("bigint").alias("chunk_len"),
        chunk.alias("chunk_text"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fingerprints of whitespace-normalized, lowercased
    text: ``fp_md5`` (hex, cross-engine stable — DuckDB md5 matches) and
    ``fp_xxh64`` (cheap 64-bit for joins)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_xxh64", F.xxhash64(norm)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest-TF-IDF terms
    per document (smoothed idf, sklearn spelling:
    ``tf × (ln((1+N)/(1+df)) + 1)``) — the classic corpus-level
    document representation for clustering, topic labeling, and
    near-dup triage.

    Output: ``(id, word, tf, df, tfidf_r, term_rank)`` with the score
    rounded to 6 decimals (``tfidf_r``) for cross-engine hash
    stability; ranking uses the unrounded score, ties break on the
    word (same discipline as the cosine entries).

    Scale shape: term frequencies are one map-side-combining count on
    (doc, word); document frequencies aggregate THAT table on word
    (never re-tokenizing); the one corpus-wide shuffle joins tf to df
    on the evenly-hashed word key; N arrives as a broadcast one-row
    frame (no driver scalar); the per-doc top-k is ``row_number() <= k``
    — WindowGroupLimit, map tasks emit ≤ k rows per doc. The tf table
    is persisted (scope-registered): both the df aggregation and the
    join consume it.
    """
    from pyspark.sql import Window

    from etl_prometheus2clickhouse_spark.operators.dedup import (
        _register_cached,
    )

    if k < 1:
        raise ValueError("tfidf_top_terms k must be >= 1")
    # same reserved-name discipline as the samplers/sketches: an id_col
    # colliding with an output column would emit duplicate names
    reserved = {"word", "tf", "df", "tfidf_r", "term_rank", "id"}
    if id_col in reserved:
        raise ValueError(
            f"tfidf_top_terms reserves column name {id_col!r}; rename "
            "it on the input frame first"
        )
    tf = (
        spread(df)
        .select(F.col(id_col).alias("id"), _words(F.col(text_col)).alias("__toks"))
        .select("id", F.explode_outer("__toks").alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    _register_cached(tf)
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("__n"))
    score = F.col("tf") * (
        F.log((1.0 + F.col("__n")) / (1.0 + F.col("df"))) + F.lit(1.0)
    )
    ranked = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("__s", score)
        .withColumn(
            "term_rank",
            F.row_number()
            .over(
                Window.partitionBy("id").orderBy(
                    F.col("__s").desc(), F.col("word")
                )
            )
            .cast("int"),
        )
        .where(F.col("term_rank") <= k)
    )
    out = ranked.select(
        F.col("id").alias(id_col),
        "word",
        "tf",
        "df",
        F.round("__s", 6).alias("tfidf_r"),
        "term_rank",
    )
    out._cached_deps = [tf]  # type: ignore[attr-defined]
    return out


def pack_sequences(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in
    deterministic ``(stratum, id)`` order and the token stream is
    chunked into fixed-``budget`` training sequences — the layout step
    between a curated corpus and a pretraining dataloader. Documents
    may straddle sequence boundaries (the standard concat-then-chunk
    packing); the output locates every document in that layout:

    ``(stratum…, id, n_tokens, start_tok, seq_id, seq_offset,
    spans_boundary)`` where ``start_tok`` is the document's offset in
    its stratum's token stream, ``seq_id = start_tok div budget``,
    ``seq_offset = start_tok mod budget``, and ``spans_boundary``
    flags documents whose tokens cross into the next sequence.

    A true bin packer (docs never split, first-fit) is a sequential
    recurrence — not a window function — and is NOT what pretraining
    pipelines do; the cumulative-sum formulation is exactly the
    concat-and-chunk semantics and is one prefix-sum window per
    stratum, fully ANSI-SQL-expressible for the oracle.

    Scale shape: one shuffle+sort per stratum (the window). Strata are
    corpus slices (language × source), so per-partition volume is the
    stratum, not the corpus; for a skewed mega-stratum use
    :func:`pack_sequences_bucketed` — identical output, window
    partitioned on (stratum, id-bucket) with a slim stitched cumsum,
    so no single task ever sorts a whole stratum.
    """
    from pyspark.sql import Window

    _check_pack_args(stratum_col, id_col, budget, "pack_sequences")
    t = _valid_token_count(token_col, "pack_sequences")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(t).over(w) - t).alias("start_tok")
    out = df.select(
        stratum_col,
        id_col,
        t.alias("n_tokens"),
        start,
    )
    return _pack_layout(out, stratum_col, id_col, budget)


def _check_pack_args(
    stratum_col: str, id_col: str, budget: int, op: str
) -> None:
    if budget < 1:
        raise ValueError(f"{op} budget must be >= 1")
    reserved = {"n_tokens", "start_tok", "seq_id", "seq_offset", "spans_boundary"}
    clash = sorted({stratum_col, id_col} & reserved)
    if clash:
        raise ValueError(
            f"{op} reserves column name(s) {clash}; rename "
            "them on the input frame first"
        )


def _valid_token_count(token_col: str, op: str) -> Column:
    """Fail-loud token count: a negative count would silently shift
    every later doc's start_tok backwards (and Spark's % would emit a
    negative seq_offset); NULL is equally invalid for a prefix sum."""
    raw_t = F.col(token_col).cast("bigint")
    return F.when(
        raw_t.isNull() | (raw_t < 0),
        F.raise_error(
            F.concat(
                F.lit(f"{op}: invalid token count "),
                F.coalesce(raw_t.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint"),
    ).otherwise(raw_t)


def _pack_layout(
    out: DataFrame, stratum_col: str, id_col: str, budget: int
) -> DataFrame:
    """Shared final projection: locate each document in the packed
    layout from its ``start_tok`` (both the per-stratum and the
    bucketed face end here, so they agree by construction)."""
    end_tok = F.col("start_tok") + F.col("n_tokens") - 1
    return out.select(
        stratum_col,
        id_col,
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / budget).alias("seq_id"),
        (F.col("start_tok") % budget).alias("seq_offset"),
        # an empty document occupies no tokens and never spans
        F.when(
            (F.col("n_tokens") > 0)
            & (F.floor(end_tok / budget) != F.floor(F.col("start_tok") / budget)),
            F.lit(True),
        )
        .otherwise(F.lit(False))
        .alias("spans_boundary"),
    )


def pack_sequences_bucketed(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    token_col: str,
    budget: int,
    bucket: "Column | str",
) -> DataFrame:
    """Skew-proof :func:`pack_sequences`: identical output, but the
    prefix-sum window partitions on ``(stratum, bucket)`` instead of
    the bare stratum, so one enormous stratum (English web is a large
    fraction of a real pretraining corpus) no longer lands in a single
    sort task. The bucket-window-stitch recipe from
    ``operators/timeseries.py`` (``counter_rate_bucketed`` /
    ``sessionize_bucketed``):

    1. window WITHIN each (stratum, bucket) for the local prefix sum —
       full rows shuffle once on the composite key, task size is the
       bucket, not the stratum;
    2. a slim per-bucket frame (one row per (stratum, bucket): its
       token total) flows through its own tiny cumsum window ordered
       by bucket — O(strata × buckets) rows;
    3. the per-bucket token offset joins back on (stratum, bucket) and
       ``start_tok = bucket_offset + local_start``.

    ``bucket`` must be an expression MONOTONE NON-DECREASING in
    ``id_col`` within each stratum (the concat order is (stratum, id),
    so buckets must be contiguous id ranges — e.g.
    ``F.floor(F.col("doc_id") / 4096)`` for dense numeric ids, or a
    fixed-length prefix of a lexicographically ordered string id).
    A hash bucket would interleave ids across buckets and silently
    scramble the layout, so monotonicity is VERIFIED inside the plan:
    the slim frame orders buckets and raises at the first bucket whose
    min id does not exceed the previous bucket's max id. Duplicate ids
    across buckets are rejected by the same check (the layout is only
    deterministic for unique ids).
    """
    from pyspark.sql import Window

    _check_pack_args(stratum_col, id_col, budget, "pack_sequences_bucketed")
    bk = F.col(bucket) if isinstance(bucket, str) else bucket
    t = _valid_token_count(token_col, "pack_sequences_bucketed")
    rows = df.select(
        stratum_col,
        id_col,
        t.alias("n_tokens"),
        bk.alias("__bk"),
    )

    w_local = (
        Window.partitionBy(stratum_col, "__bk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rows.withColumn(
        "__local", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )

    # slim stitch frame: one row per (stratum, bucket) — its token
    # total and id range; the global offset of a bucket is the running
    # token total of all earlier buckets, and the id ranges double as
    # the monotonicity proof
    per_bucket = rows.groupBy(stratum_col, "__bk").agg(
        F.sum("n_tokens").alias("__tok"),
        F.min(id_col).alias("__min_id"),
        F.max(id_col).alias("__max_id"),
    )
    wb = Window.partitionBy(stratum_col).orderBy("__bk")
    prev_max = F.lag("__max_id").over(wb)
    run = Window.partitionBy(stratum_col).orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offset = F.sum("__tok").over(run) - F.col("__tok")
    stitch = per_bucket.select(
        stratum_col,
        "__bk",
        F.when(
            prev_max.isNotNull() & (prev_max >= F.col("__min_id")),
            F.raise_error(
                F.concat(
                    F.lit(
                        "pack_sequences_bucketed: bucket expression is not "
                        "monotone in the id column (bucket "
                    ),
                    F.col("__bk").cast("string"),
                    F.lit(" starts at id "),
                    F.col("__min_id").cast("string"),
                    F.lit(" but an earlier bucket reaches id "),
                    prev_max.cast("string"),
                    F.lit(") — use contiguous id ranges, not a hash"),
                )
            ).cast("bigint"),
        )
        .otherwise(offset)
        .alias("__off"),
    )

    joined = local.join(stitch, [stratum_col, "__bk"])
    out = joined.select(
        stratum_col,
        id_col,
        "n_tokens",
        (F.col("__off") + F.col("__local")).alias("start_tok"),
    )
    return _pack_layout(out, stratum_col, id_col, budget)


def _guard_model_rows(df: DataFrame, cap: int, operator: str, what: str) -> None:
    """Reference-sized-model contract made LOUD (the ``max_queries``
    discipline of ``similarity.cosine_topk_arrow``): every frame these
    operators broadcast is bounded by the reference/query side, so a
    caller that passes a corpus-sized "reference" would silently OOM
    driver and executors at broadcast time. Count-bound the frame first
    — ``limit(cap+1).count()`` stops scanning at the cap, so the guard
    costs one bounded pass over a (by contract small) frame — and fail
    with an actionable message instead of an executor OOM."""
    n = df.limit(cap + 1).count()
    if n > cap:
        raise ValueError(
            f"{operator}: {what} exceeds the broadcast cap ({cap} rows) — "
            "the model/reference side must be reference-sized (it is "
            "broadcast to every task). Shrink the reference or raise the "
            "cap only with matching driver/executor memory."
        )


def _bigrams(toks: Column) -> Column:
    sz = F.size(toks)
    return F.when(
        sz >= 2,
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def lm_reference_model(
    reference: DataFrame,
    text_col: str = "text",
    max_model_rows: int = 1_000_000,
    materialize: bool = True,
):
    """:func:`lm_perplexity`'s reference-side model tables — bigram
    counts, context counts, vocabulary size — built ONCE for callers
    that score many shards against one frozen reference (the streaming
    funnel scores every micro-batch; inline, the model rebuild plus
    its guard count is a per-batch fixed cost). ``materialize=True``
    pins each table with ``localCheckpoint`` so later scoring calls
    broadcast stored rows instead of re-aggregating the reference.
    The counts are a pure function of the reference, so scores are
    bit-identical to the inline path."""
    ref_toks = reference.select(_words(F.col(text_col)).alias("toks"))
    ref_big = ref_toks.select(
        F.explode(_bigrams(F.col("toks"))).alias("b")
    ).select("b.w1", "b.w2")
    big_counts = ref_big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_big")
    )
    ctx_counts = big_counts.groupBy("w1").agg(F.sum("c_big").alias("c_ctx"))
    vocab = ref_toks.select(F.explode("toks").alias("t")).agg(
        F.count_distinct("t").cast("double").alias("v_size")
    )
    # loud size guard on the largest broadcast frame (big_counts bounds
    # ctx_counts: one context row per distinct w1)
    _guard_model_rows(
        big_counts, max_model_rows, "lm_perplexity", "reference bigram table"
    )
    if materialize:
        big_counts = big_counts.localCheckpoint()
        ctx_counts = ctx_counts.localCheckpoint()
        vocab = vocab.localCheckpoint()
    return big_counts, ctx_counts, vocab


def lm_perplexity(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    max_model_rows: int = 1_000_000,
    model=None,
) -> DataFrame:
    """Per-document bigram language-model perplexity against a
    reference corpus — the CCNet-style quality signal (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data", LREC 2020: score every web document under an LM
    trained on a trusted corpus; low perplexity ⇒ fluent,
    in-distribution text). CCNet uses a 5-gram KenLM; the engine's
    re-expression is an add-α bigram model — the same
    score-under-a-reference-LM shape with the n-gram order that stays
    fully oracle-checkable (the smoothing arithmetic is closed-form
    SQL; a KenLM binary is not).

    Model: ``P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V)`` with
    ``c(·)`` reference bigram/context counts and ``V`` the reference
    unigram vocabulary size; an unseen context degrades to the uniform
    ``1/V``. Emits per corpus document: ``n_bigrams``,
    ``cross_entropy`` (mean negative ln-probability, rounded to 6) and
    ``perplexity = exp(cross_entropy)`` (rounded to 6). Documents with
    fewer than 2 tokens have no bigrams and are absent from the output
    (no LM evidence either way — the caller's routing decision).

    Scale shape: the LM tables are REFERENCE-sized, not corpus-sized —
    CCNet's trusted corpus is Wikipedia, orders of magnitude smaller
    than the crawl being scored — so both count tables and the 1-row
    vocabulary scalar join to the corpus as **broadcasts** (the plan
    hints them; nothing corpus-sized shuffles on a token key). The
    corpus side is one JVM bigram explode (shifted-slice ``zip_with``,
    tokenizer consumed once per row) feeding a doc-keyed hash
    aggregate with map-side partial combine — the only corpus shuffle
    is one slim (doc, sum, count) row per document. Reference counts
    are two map-side-combining aggregates on (w₁,w₂)/(w₁) — uniform
    word keys, the word-count shape.

    ``model`` (from :func:`lm_reference_model`) skips the reference-
    side derivation — for callers that score MANY shards against ONE
    frozen reference (the streaming funnel scores every micro-batch),
    the per-call model rebuild is pure repeated fixed cost. Scoring
    arithmetic is identical either way."""
    if model is not None:
        big_counts, ctx_counts, vocab = model
    else:
        big_counts, ctx_counts, vocab = lm_reference_model(
            reference, text_col, max_model_rows, materialize=False
        )
    corp = (
        spread(corpus).select(
            F.col(id_col), _words(F.col(text_col)).alias("toks")
        )
        .select(id_col, F.explode(_bigrams(F.col("toks"))).alias("b"))
        .select(id_col, "b.w1", "b.w2")
    )
    scored = (
        corp.join(F.broadcast(big_counts), ["w1", "w2"], "left")
        .join(F.broadcast(ctx_counts), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("c_big"), F.lit(0)) + alpha)
                    / (
                        F.coalesce(F.col("c_ctx"), F.lit(0))
                        + alpha * F.col("v_size")
                    )
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("cross_entropy"),
        F.round(F.exp(F.avg("nll")), 6).alias("perplexity"),
    )


def lm_perplexity3(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lambdas: tuple[float, float, float, float] = (0.5, 0.3, 0.15, 0.05),
    max_model_rows: int = 1_000_000,
) -> DataFrame:
    """Trigram language-model perplexity with Jelinek-Mercer linear
    interpolation — the CCNet-parity upgrade of :func:`lm_perplexity`
    (Wenzek et al. LREC 2020 score under a KenLM n-gram model; JM
    interpolation is Jelinek & Mercer 1980, the classical smoothing
    whose arithmetic stays closed-form and SQL-expressible, unlike
    KenLM's modified Kneser-Ney):

    ``P(w₃|w₁w₂) = λ₃·ML₃(w₃|w₁w₂) + λ₂·ML₂(w₃|w₂) + λ₁·ML₁(w₃)
    + λ₀/V``

    with maximum-likelihood ratios ``ML₃ = c(w₁w₂w₃)/c(w₁w₂·)``,
    ``ML₂ = c(w₂w₃)/c(w₂·)``, ``ML₁ = c(w₃)/N`` from the reference
    corpus (a ratio with an unseen context contributes 0), ``V`` the
    reference vocabulary, and fixed weights summing to 1 — the
    ``λ₀/V`` floor keeps every probability positive, so the model
    scores fully-OOV text instead of diverging. Emits per corpus
    document (≥ 3 tokens; shorter docs have no trigram evidence and
    are absent): ``n_trigrams``, ``cross_entropy`` (mean −ln P,
    rounded 6), ``perplexity = exp(cross_entropy)`` (rounded 6).

    Scale shape — identical to :func:`lm_perplexity`: all LM tables
    are REFERENCE-sized and **broadcast** (the trigram table is the
    largest; the loud size guard bounds it), the corpus side is one
    JVM trigram explode feeding three broadcast left joins and a
    doc-keyed map-side-combining aggregate. Nothing corpus-sized
    shuffles on a token key."""
    l3, l2, l1, l0 = lambdas
    if abs(l3 + l2 + l1 + l0 - 1.0) > 1e-9:
        raise ValueError(f"lambdas must sum to 1, got {lambdas}")

    def ngrams(toks: Column, n: int) -> Column:
        sz = F.size(toks)
        fields = [
            F.slice(toks, i + 1, sz - (n - 1)).alias(f"s{i}")
            for i in range(n)
        ]
        if n == 2:
            pair = F.zip_with(
                fields[0], fields[1],
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        else:
            pair = F.zip_with(
                F.zip_with(
                    fields[0], fields[1],
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
                fields[2],
                lambda ab, c: F.struct(
                    ab.w1.alias("w1"), ab.w2.alias("w2"), c.alias("w3")
                ),
            )
        empty_t = (
            "array<struct<w1:string,w2:string>>"
            if n == 2
            else "array<struct<w1:string,w2:string,w3:string>>"
        )
        return F.when(sz >= n, pair).otherwise(F.array().cast(empty_t))

    ref_toks = reference.select(_words(F.col(text_col)).alias("toks"))
    tri = ref_toks.select(
        F.explode(ngrams(F.col("toks"), 3)).alias("g")
    ).select("g.w1", "g.w2", "g.w3")
    tri_counts = tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c_tri")
    )
    ctx3 = tri_counts.groupBy("w1", "w2").agg(F.sum("c_tri").alias("c_ctx3"))
    big = ref_toks.select(
        F.explode(ngrams(F.col("toks"), 2)).alias("g")
    ).select(F.col("g.w1").alias("w2"), F.col("g.w2").alias("w3"))
    big_counts = big.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).alias("c_big")
    )
    ctx2 = big_counts.groupBy("w2").agg(F.sum("c_big").alias("c_ctx2"))
    uni = ref_toks.select(F.explode("toks").alias("w3")).groupBy("w3").agg(
        F.count(F.lit(1)).alias("c_uni")
    )
    totals = uni.agg(
        F.sum("c_uni").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    _guard_model_rows(
        tri_counts, max_model_rows, "lm_perplexity3",
        "reference trigram table",
    )
    corp = (
        spread(corpus)
        .select(F.col(id_col), _words(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode(ngrams(F.col("toks"), 3)).alias("g"))
        .select(id_col, "g.w1", "g.w2", "g.w3")
    )
    # interpolated probability; each ML ratio degrades to 0 on an
    # unseen context (coalesce both sides of the division)
    p = (
        F.lit(l3)
        * (
            F.coalesce(F.col("c_tri"), F.lit(0))
            / F.coalesce(F.col("c_ctx3"), F.lit(1))
        )
        + F.lit(l2)
        * (
            F.coalesce(F.col("c_big"), F.lit(0))
            / F.coalesce(F.col("c_ctx2"), F.lit(1))
        )
        + F.lit(l1)
        * (F.coalesce(F.col("c_uni"), F.lit(0)) / F.col("n_tokens"))
        + F.lit(l0) / F.col("v_size")
    )
    scored = (
        corp.join(F.broadcast(tri_counts), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(ctx3), ["w1", "w2"], "left")
        .join(F.broadcast(big_counts), ["w2", "w3"], "left")
        .join(F.broadcast(ctx2), ["w2"], "left")
        .join(F.broadcast(uni), ["w3"], "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, (-F.log(p)).alias("nll"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.round(F.avg("nll"), 6).alias("cross_entropy"),
        F.round(F.exp(F.avg("nll")), 6).alias("perplexity"),
    )


def nb_classify(
    corpus: DataFrame,
    reference: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    max_model_rows: int = 1_000_000,
) -> DataFrame:
    """Multinomial Naive Bayes text classification — the supervised
    classifier stage of a curation pipeline (CCNet's alternative to
    LM filtering is exactly this shape: a linear bag-of-words model
    trained to separate a trusted reference from crawl text; fastText
    supervised is the modern spelling). Naive Bayes is the member of
    that family whose TRAINING is also closed-form counting, so the
    entire train → score → argmax pipeline stays SQL-expressible and
    oracle-checkable — no gradient descent anywhere.

    Model: ``log P(c|d) ∝ log prior(c) + Σ_w log P(w|c)`` with
    add-α (Laplace) smoothing ``P(w|c) = (count(w,c) + α) /
    (count(·,c) + α·V)``, ``V`` = reference vocabulary. Tokens outside
    the reference vocabulary contribute the per-class unseen term
    (they still discriminate — class token totals differ). Emits one
    row per corpus document: ``(id, label, predicted, nb_margin)``
    where ``predicted`` is the argmax class (score rounded to 6
    before ranking, ties → lexicographically smallest class — the
    cos_sim convention, so near-ties resolve identically in the SQL
    oracle) and ``nb_margin`` the rounded best-vs-runner-up log-odds
    (the abstain/confidence knob real pipelines threshold on).

    Scale shape: the model is REFERENCE-sized — the (class × word)
    log-prob table is bounded by reference vocabulary × classes and
    **broadcasts**; the corpus-side cost is one token explode joined
    against it (the n_classes-way row multiplication happens on the
    slim (doc, word) stream, n_classes is small by definition) into a
    doc×class hash aggregate with map-side combine, then one keyed
    window for the argmax. Nothing corpus-sized shuffles on a word
    key; training is two map-side-combining counts over the
    reference."""
    ref = reference.select(
        F.col(label_col).alias("cls"), _words(F.col(text_col)).alias("toks")
    )
    ref_words = ref.select("cls", F.explode("toks").alias("w"))
    wc = ref_words.groupBy("cls", "w").agg(F.count(F.lit(1)).alias("c_wc"))
    ct = wc.groupBy("cls").agg(F.sum("c_wc").alias("c_c"))
    vocab_df = ref_words.select("w").distinct()
    v_size = vocab_df.agg(F.count(F.lit(1)).cast("double").alias("v_size"))
    priors = ref.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
    priors = priors.crossJoin(
        F.broadcast(priors.agg(F.sum("n_c").alias("n_total")))
    ).select("cls", F.log(F.col("n_c") / F.col("n_total")).alias("log_prior"))
    # dense (word × class) table over the reference vocabulary: absent
    # (w, c) pairs get the smoothed-zero numerator — broadcastable by
    # the reference-sized-model contract, made loud below
    dense = (
        vocab_df.crossJoin(ct.select("cls"))
        .join(wc, ["cls", "w"], "left")
        .join(ct, "cls")
        .crossJoin(v_size)
        .select(
            "cls",
            "w",
            F.log(
                (F.coalesce(F.col("c_wc"), F.lit(0)) + alpha)
                / (F.col("c_c") + alpha * F.col("v_size"))
            ).alias("logp"),
        )
    )
    # loud size guard on the broadcast model: the dense table is
    # V × n_classes rows (the largest frame shipped to every task);
    # limit(cap+1) stops the guard scan at the cap
    _guard_model_rows(
        dense, max_model_rows, "nb_classify", "dense (class × word) model"
    )
    # per-class unseen-token term (corpus tokens outside the reference
    # vocabulary entirely)
    unseen = ct.crossJoin(v_size).select(
        "cls",
        F.log(alpha / (F.col("c_c") + alpha * F.col("v_size"))).alias(
            "logp_unseen"
        ),
    )
    corpus = spread(corpus)
    toks = corpus.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    )
    # seen tokens: n_classes rows per token via the broadcast dense
    # table; unseen tokens: counted once per doc, expanded per class
    seen_scores = toks.join(F.broadcast(dense), "w").groupBy(
        id_col, "cls"
    ).agg(F.sum("logp").alias("s_seen"))
    oov_counts = toks.join(
        F.broadcast(vocab_df), "w", "left_anti"
    ).groupBy(id_col).agg(F.count(F.lit(1)).alias("n_oov"))
    doc_ids = corpus.select(id_col, F.col(label_col).alias("label"))
    scores = (
        doc_ids.crossJoin(F.broadcast(unseen.select("cls")))
        .join(seen_scores, [id_col, "cls"], "left")
        # corpus-sized per-doc frame: a regular id-keyed join (NEVER
        # broadcast — it scales with the corpus)
        .join(oov_counts, id_col, "left")
        .join(F.broadcast(unseen), "cls")
        .join(F.broadcast(priors), "cls")
        .select(
            id_col,
            "label",
            "cls",
            F.round(
                F.coalesce(F.col("s_seen"), F.lit(0.0))
                + F.coalesce(F.col("n_oov"), F.lit(0)) * F.col("logp_unseen")
                + F.col("log_prior"),
                6,
            ).alias("score"),
        )
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    ranked = scores.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "runner_up", F.lead("score", 1).over(w_rank)
    )
    return ranked.where(F.col("rn") == 1).select(
        id_col,
        "label",
        F.col("cls").alias("predicted"),
        F.round(
            F.col("score") - F.coalesce(F.col("runner_up"), F.col("score")), 6
        ).alias("nb_margin"),
    )


def rrf_fuse(
    lists: "list[DataFrame]",
    k0: int = 60,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
    merge N ranked retrieval lists into one, ``score(q,d) =
    Σᵢ 1/(k0 + rankᵢ(q,d))`` with absent entries contributing 0 —
    the standard way to combine lexical (BM25) and dense (vector)
    retrieval without score calibration, since only RANKS cross the
    fusion boundary.

    Determinism: the fused score is a fixed-order CHAIN of per-list
    terms (an expression, not a floating-point aggregation whose
    addend order could vary with shuffle), so both engines compute
    identical doubles; final ties break by document id.

    Scale shape: the inputs are already top-k lists — O(queries × k)
    rows each — so the full-outer alignment joins and the per-query
    WindowGroupLimit move result-sized frames only; all heavy lifting
    stays inside the upstream retrieval operators.
    """
    if len(lists) < 2:
        raise ValueError("rrf_fuse needs at least 2 ranked lists")
    if k0 <= 0:
        raise ValueError("k0 must be positive")
    joined = None
    for i, df in enumerate(lists):
        part = df.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias(f"__r{i}"),
        )
        joined = (
            part
            if joined is None
            else joined.join(part, ["query_id", "doc_id"], "full_outer")
        )
    score = None
    for i in range(len(lists)):
        term = F.when(
            F.col(f"__r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("__score").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("__score", 6).alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ndcg_at_k(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k ranking evaluation (Järvelin & Kekäläinen, TOIS 2002 —
    the graded-relevance metric every retrieval deployment tracks
    beside recall): ``DCG@k = Σ_{rank≤k} (2^rel − 1)/log2(rank+1)``
    over the retrieved list, normalized by the IDEAL DCG@k — the same
    sum over the query's judgments sorted by relevance (ties by doc
    id). Retrieved documents without a judgment score relevance 0
    (the standard pooling convention); a query with no positive
    judgments reports ndcg 0.0 rather than NULL so downstream
    averages stay defined. Emits one row per RETRIEVED query:
    ``(query_id, dcg, idcg, ndcg)``, each rounded to 6 dp.

    Scale shape: ``results`` is a top-k list (O(queries × k) rows) and
    ``judgments`` is the assessment pool — both evaluation-sized, so
    the join and the per-query ideal-ranking window move slim frames
    only; the corpus never appears. This closes the evaluation axis
    pair: ``ann_recall`` measures set overlap for nearest-neighbor
    lists, this measures graded ranking quality for retrieval lists
    (BM25 / hybrid / fused)."""
    if k < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    res = results.where(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("rank"),
    )
    judg = (
        judgments.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rel_col).cast("double").alias("rel"),
        )
        # duplicate (query, doc) judgments would fan out the DCG join
        # (each retrieved row's gain summed once per duplicate) and give
        # the ideal ranking two slots for one document — collapse to the
        # max-relevance assessment, the standard pooling resolution
        .groupBy("query_id", "doc_id")
        .agg(F.max("rel").alias("rel"))
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(
        F.col("rank") + 1.0
    )
    dcg = (
        res.join(judg, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0.0)))
        .groupBy("query_id")
        .agg(F.sum(gain).alias("dcg"))
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        judg.withColumn("rank", F.row_number().over(w_ideal).cast("long"))
        .where(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain).alias("idcg"))
    )
    return (
        dcg.join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.round("dcg", 6).alias("dcg"),
            F.round(F.coalesce("idcg", F.lit(0.0)), 6).alias("idcg"),
            F.round(
                F.when(
                    F.coalesce("idcg", F.lit(0.0)) > 0.0,
                    F.col("dcg") / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def bm25_search(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_query_terms: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k document retrieval (Robertson-Spärck Jones / Okapi
    BM25 — the lexical-search baseline every RAG/retrieval pipeline
    ships next to its embedding index): score =
    ``Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))``
    with the standard smoothed idf ``ln(1 + (N-df+0.5)/(df+0.5))``.
    ``queries`` carries ``(query_id, terms array<string>)``; terms are
    matched against the corpus tokenization (lowercased whitespace
    words) and deduplicated per query (standard bag-of-terms query).
    Emits ``(query_id, doc_id, bm25 rounded to 6, rank)`` — top-k per
    query, ties broken by ascending doc id (the cos_sim ranking
    convention).

    Scale shape — the INVERTED-INDEX join, not a scan per query: one
    corpus pass builds the postings stream ``(term, doc, tf, |d|)``
    (term-keyed groupBy with map-side combine), df/idf is a
    term-keyed aggregate over postings (bounded by vocabulary), the
    candidate stage is an equi-join of postings against the BROADCAST
    query-term list (queries are small by definition — the
    ``cosine_topk`` contract), and per-(query, doc) partial scores
    hash-aggregate with map-side combine before one keyed top-k
    window (WindowGroupLimit: map tasks emit ≤ k rows per query).
    Corpus statistics N and avgdl ride along as a broadcast 1-row
    frame — no driver-side scalar collect."""
    corpus = spread(corpus)
    toks = corpus.select(
        F.col(id_col), _words(F.col(text_col)).alias("toks")
    ).select(id_col, F.size("toks").alias("dl"), F.explode("toks").alias("t"))
    postings = toks.groupBy("t", id_col, "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = corpus.select(
        F.size(_words(F.col(text_col))).alias("dl")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_t = postings.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    qterms = queries.select(
        F.col(query_id_col), F.explode(F.array_distinct(F.col(terms_col))).alias("t")
    )
    # loud size guard on the broadcast query-term list (queries are
    # small by definition — the cosine_topk contract)
    _guard_model_rows(
        qterms, max_query_terms, "bm25_search", "exploded query-term list"
    )
    scored = (
        postings.join(F.broadcast(qterms), "t")
        .join(df_t, "t")
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    ).where(F.col("rank") <= k)


# Gopher quality-filter rule set (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A)
# — the published document-level filter real pipelines apply before
# anything model-based. Every threshold below is the paper's.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher document-quality filter as ONE shuffle-free select.

    Rules (Rae et al. 2021 App. A, thresholds verbatim), each emitted
    as its own boolean column so the verdict is auditable:

    - ``ok_word_count``     — 50 ≤ words ≤ 100 000
    - ``ok_mean_word_len``  — mean word length in [3, 10]
    - ``ok_symbol_ratio``   — (# + "...") symbol-to-word ratio ≤ 0.1
    - ``ok_bullet_lines``   — ≤ 90% of lines start with a bullet
    - ``ok_ellipsis_lines`` — ≤ 30% of lines end with an ellipsis
    - ``ok_alpha_words``    — ≥ 80% of words contain a letter
    - ``ok_stopwords``      — ≥ 2 distinct Gopher stop words present
    - ``ok_dup_lines``      — ≤ 30% duplicate (repeated) lines
    - ``keep``              — AND of all rules
    - ``fail_reasons``      — comma-joined failed rule names, fixed
      order (empty when kept)

    Every ratio threshold is evaluated with CROSS-MULTIPLIED INTEGER
    arithmetic (e.g. mean word length in [3,10] becomes
    ``3·n_words ≤ Σlen ≤ 10·n_words``) — no float rounding surface, so
    the DuckDB oracle is exact by construction. Zero shuffle, zero
    Python: per-document array/regexp expressions only, embarrassingly
    parallel at 100 TB."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(c)
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.coalesce(
        F.regexp_count(c, F.lit(r"#|\.\.\.")), F.lit(0)
    )
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))

    rules = [
        ("word_count", (n_words >= 50) & (n_words <= 100_000)),
        (
            "mean_word_len",
            (n_words > 0)
            & (3 * n_words <= sum_len)
            & (sum_len <= 10 * n_words),
        ),
        ("symbol_ratio", 10 * n_symbols <= n_words),
        (
            "bullet_lines",
            (n_lines == 0) | (10 * n_bullet <= 9 * n_lines),
        ),
        (
            "ellipsis_lines",
            (n_lines == 0) | (10 * n_ellipsis <= 3 * n_lines),
        ),
        ("alpha_words", 5 * n_alpha >= 4 * n_words),
        ("stopwords", n_stop >= 2),
        ("dup_lines", 10 * n_dup_lines <= 3 * n_lines),
    ]
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        *[ok.alias(f"ok_{name}") for name, ok in rules],
    )
    keep = F.lit(True)
    for name, _ in rules:
        keep = keep & F.col(f"ok_{name}")
    reasons = F.array_join(
        F.filter(
            F.array(
                *[
                    F.when(~F.col(f"ok_{name}"), F.lit(name))
                    for name, _ in rules
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return out.select(
        "*", keep.alias("keep"), reasons.alias("fail_reasons")
    )


# ---------------------------------------------------------------------------
# feature-hashed document vectors
# ---------------------------------------------------------------------------

def hashed_doc_vectors(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-dimension document vectors via the hashing trick
    (Weinberger et al., ICML'09 "Feature Hashing for Large Scale
    Multitask Learning"): every token hashes to one of ``dim``
    buckets with a ±1 sign from an independent hash bit, and the
    document's vector is the signed count per bucket — text-to-vector
    with NO trained model, no vocabulary table, and no dimensionality
    tied to vocabulary size. The output feeds the engine's similarity
    layer directly (``cosine_topk_*`` over the ``vec`` column), giving
    an embedding-free near-dup/retrieval path with sign-cancellation
    keeping the inner product an unbiased kernel estimate.

    EXACT arithmetic end-to-end: buckets/signs from md5 slices (the
    oracle family) and integer signed counts — the vector is a pure
    function of the token multiset, reproducible bit-for-bit in SQL.

    100 TB shape: one slim (id, bucket, ±1) explode, a map-side-
    combining sum per (id, bucket) — at most ``dim`` rows per doc
    survive the partial aggregate — and a per-doc densify into the
    fixed-length array. No vocabulary-sized state anywhere, which is
    the trick's point."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    # single-file corpus scans tokenize+md5 serially otherwise
    # (guide §2.5); no-op at scale
    df = spread(df)
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_words(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "__t"
        ),
        F.size(_words(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "__n"
        ),
    )
    h1 = F.conv(F.substring(F.md5("__t"), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5("__t"), 9, 8), 16, 10).cast("bigint")
    hashed = toks.select(
        "__id",
        "__n",
        F.pmod(h1, F.lit(dim)).cast("int").alias("__b"),
        F.when(F.pmod(h2, F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("__s"),
    )
    per_bucket = hashed.groupBy("__id", "__n", "__b").agg(
        F.sum("__s").alias("__v")
    )
    return (
        per_bucket.groupBy("__id", "__n")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__v"))
            ).alias("__m")
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i), F.lit(0)
                ).cast("long"),
            ).alias("vec"),
        )
    )


# ---------------------------------------------------------------------------
# Cavnar-Trenkle n-gram language identification
# ---------------------------------------------------------------------------

def ngram_lang_id(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    profile_size: int = 50,
    max_langs: int = 512,
) -> DataFrame:
    """Character-n-gram language identification by rank-profile
    distance (Cavnar & Trenkle 1994, "N-Gram-Based Text
    Categorization" — the classic pre-neural lang-ID that textcat and
    early CLD shipped): each language's profile is its
    ``profile_size`` most frequent character bigrams ranked by
    (count desc, gram); a document is scored against every language
    by the out-of-place measure — Σ over the document's own top
    bigrams of |doc_rank − lang_rank|, with grams absent from a
    language's profile paying the maximum ``profile_size`` penalty —
    and labeled with the argmin language (ties to the
    lexicographically first). INTEGER arithmetic end-to-end (counts
    and ranks only — no smoothing, no floats), so the whole
    train+score pipeline is bit-reproducible in SQL.

    Documents shorter than one bigram are dropped (they have no
    profile; the caller sees them missing rather than labeled by
    noise).

    100 TB shape: training reduces the reference to
    languages × profile_size rank rows (two map-side-combining counts
    + WindowGroupLimit top-R) and BROADCASTS them — guarded by
    ``max_langs`` (the lm_perplexity size-guard discipline); the
    corpus side is one slim (doc, gram, rank) profile (top-R per doc,
    WindowGroupLimit again) crossed with the tiny language list and
    aggregated per (doc, language). The corpus text itself is read
    once and never shuffled."""

    def _bigrams(c):
        t = F.lower(c)
        return F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(0))),
                lambda i: t.substr(i, F.lit(2)),
            ),
            lambda g: F.length(g) == 2,
        )

    n_langs = reference.select(lang_col).distinct().count()
    if n_langs > max_langs:
        raise ValueError(
            f"ngram_lang_id: {n_langs} languages exceeds max_langs="
            f"{max_langs}; the rank profiles broadcast, so pass a "
            "reference with a bounded language set (or raise the cap "
            "deliberately)"
        )
    ref_grams = spread(reference).select(
        F.col(lang_col).alias("__lang"),
        F.explode(_bigrams(F.col(text_col))).alias("__g"),
    )
    w_lang = Window.partitionBy("__lang").orderBy(
        F.col("__cnt").desc(), F.col("__g")
    )
    lang_prof = (
        ref_grams.groupBy("__lang", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__lrank", F.row_number().over(w_lang))
        .where(F.col("__lrank") <= profile_size)
        .select("__lang", "__g", "__lrank")
    )
    # the profiles broadcast anyway and are bounded by
    # max_langs × profile_size rows (guarded above): collect them ONCE
    # — the lazy plan evaluated the whole reference-explode subtree
    # twice (language list + profile join, two broadcast builds)
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    from etl_prometheus2clickhouse_spark.localframe import local_df

    prof_schema = StructType(
        [
            StructField("__lang", reference.schema[lang_col].dataType),
            StructField("__g", lang_prof.schema["__g"].dataType),
            StructField("__lrank", IntegerType()),
        ]
    )
    lang_prof = local_df(
        reference.sparkSession,
        [
            (r["__lang"], r["__g"], r["__lrank"])
            for r in lang_prof.collect()
        ],
        prof_schema,
    )
    langs = lang_prof.select("__lang").distinct()

    doc_grams = spread(corpus).select(
        F.col(id_col).alias("__id"),
        F.explode(_bigrams(F.col(text_col))).alias("__g"),
    )
    w_doc = Window.partitionBy("__id").orderBy(
        F.col("__cnt").desc(), F.col("__g")
    )
    doc_prof = (
        doc_grams.groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__drank", F.row_number().over(w_doc))
        .where(F.col("__drank") <= profile_size)
        .select("__id", "__g", "__drank")
    )
    paired = doc_prof.crossJoin(F.broadcast(langs)).join(
        F.broadcast(lang_prof), ["__lang", "__g"], "left"
    )
    dist = paired.groupBy("__id", "__lang").agg(
        F.sum(
            F.coalesce(
                F.abs(F.col("__drank") - F.col("__lrank")),
                F.lit(profile_size),
            )
        ).alias("__dist")
    )
    w_best = Window.partitionBy("__id").orderBy(
        F.col("__dist").asc(), F.col("__lang").asc()
    )
    return (
        dist.withColumn("__rn", F.row_number().over(w_best))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias("pred_lang"),
            F.col("__dist").cast("long").alias("oop_distance"),
        )
    )
