"""Byte-pair-encoding tokenizer: distributed training + JVM-only apply.

Real BPE (Sennrich, Haddow & Birch, ACL 2016, "Neural Machine
Translation of Rare Words with Subword Units") replaces the engine's
"BPE-ish" regex token count with a LEARNED vocabulary: training
iteratively merges the most frequent adjacent symbol pair; encoding
applies the learned merges in rank order.

Spark-first re-expression:

- **Training** (:func:`bpe_train`): the working state is the
  vocabulary-sized ``(word, count)`` table — BPE statistics are
  identical on the word-frequency table and the raw corpus, so one
  map-side-combining word count reduces 100 TB of text to a
  vocabulary-bounded frame up front. Each merge round is ONE
  aggregate: explode adjacent symbol pairs weighted by word count
  (uniform keys, partial combine), take the argmax on the driver
  (count desc, then pair lexicographic — deterministic), apply the
  merge with a single literal ``replace``. ``localCheckpoint`` per
  round cuts the growing lineage, the ``dup_clusters`` iteration
  pattern.

- **Symbolization is a flat string, not an array**: a word's symbol
  sequence is encoded as ``··a··b··<eow>··`` — every symbol wrapped in
  single separators, every boundary therefore carrying TWO.  Merging
  pair (a,b) is then the literal replace ``·a··b·`` → ``·ab·``, which
  consumes one separator from each side and leaves one — so an
  immediately following occurrence still has its boundary, and
  left-to-right non-overlapping ``replace`` semantics (identical in
  the JVM and DuckDB) implement exactly the greedy merge pass.
  Word boundaries in a whole-document encoding carry FOUR separators,
  which the two-separator pattern can never match across — merges
  cannot cross words by construction.

- **Apply** (:func:`bpe_apply`): merges are applied in learned order
  (the original subword-nmt contract: later merges only create longer
  symbols, so earlier-rank pairs can never newly form — one ordered
  pass is exact). The whole document becomes one canonical string and
  the merge table becomes a chain of ``n_merges`` literal JVM
  ``replace`` calls — **zero Python, zero shuffle, no join**: the
  tokenizer is a per-row expression, embarrassingly parallel at any
  scale — in DOCUMENT count. In MERGE count the chain is a Catalyst
  expression tree one node deeper per merge, so it is capped at
  ``MAX_CHAIN_MERGES``; vocabulary-scale tables (16k-32k merges) go
  through :func:`bpe_apply_arrow` — an Arrow-batched, per-batch-
  memoized encoder whose per-word cost is independent of table size.
  Both faces produce identical tokens (pytest parity; crossover
  measurements in BENCH_NOTES.md).

The separator (``\\x01``) and end-of-word mark (``\\x02``) are control
characters that cannot appear in whitespace-tokenized text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.partitioning import spread
from pyspark.sql import types as T

SEP = "\x01"
EOW = "\x02"


def _canonical_word(w: Column) -> Column:
    """word → ``·c··h··a··r··<eow>··`` (single separators around every
    initial character symbol; EOW appended as its own symbol)."""
    return F.concat(
        F.lit(SEP),
        F.regexp_replace(
            F.concat(w, F.lit(EOW)), "(.)", SEP + "$1" + SEP
        ),
        F.lit(SEP),
    )


def _merge_pattern(a: str, b: str) -> tuple[str, str]:
    """Literal search/replace strings for merging pair (a, b)."""
    return f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}"


def _symbols(canon: Column) -> Column:
    """canonical string → symbol array. Word boundaries carry four
    separators and split into an empty element — dropped here."""
    return F.filter(
        F.split(F.btrim(canon, F.lit(SEP)), SEP + SEP),
        lambda s: F.length(s) > 0,
    )


def bpe_train(
    reference: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    max_vocab_words: int = 1_000_000,
    driver_vocab_threshold: int = 65_536,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a reference corpus; returns
    the ordered merge list ``[(a, b), ...]``. Stops early when the best
    remaining pair occurs only once (merging singletons adds no
    compression). The word-frequency table is count-bounded loudly
    (the reference-sized-model contract) because each round collects
    one argmax row from an aggregate over it.

    Two routes, same result (pinned equal by pytest on two corpora):
    a word-frequency table at or under ``driver_vocab_threshold`` rows
    is collected once and the merge loop runs driver-side on the
    canonical strings — BPE rounds are inherently sequential, and for
    a reference-sized vocabulary 16 rounds of cluster round-trips are
    pure scheduling latency (the bounded-train-collect precedent of
    the IVF k-means trainer). Above the threshold the loop stays fully
    distributed: one map-side-combining pair-count aggregate per round
    over the (never-collected) vocabulary table. Pass
    ``driver_vocab_threshold=0`` to force the distributed route."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        _guard_model_rows,
        _words,
    )

    words = (
        reference.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    _guard_model_rows(
        words, max_vocab_words, "bpe_train", "reference word-frequency table"
    )
    if driver_vocab_threshold > 0:
        head = words.limit(driver_vocab_threshold + 1).collect()
        if len(head) <= driver_vocab_threshold:
            return _train_driver_side(
                {r.w: r.cnt for r in head}, n_merges
            )
    vocab = words.select(
        _canonical_word(F.col("w")).alias("canon"), "cnt"
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    # lineage-cut cadence: each round appends ONE literal replace to
    # the plan — trivial depth — so re-materializing every round would
    # just double the job count (localCheckpoint is eager). Cut every
    # 4 rounds: at most 4 chained replaces re-run per aggregate, and
    # the lineage can never grow unboundedly.
    since_cut = 0
    for _ in range(n_merges):
        syms = _symbols(F.col("canon"))
        sz = F.size(syms)
        pairs = F.when(
            sz >= 2,
            F.zip_with(
                F.slice(syms, 1, sz - 1),
                F.slice(syms, 2, sz - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        # argmax in ONE aggregate pass: min_by over the composite
        # ordering struct (-n, a, b) — struct comparison is
        # lexicographic, so this is exactly (count desc, pair asc)
        # without the range-partition sampling job an orderBy+limit
        # would add per round
        best = (
            vocab.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .agg(
                F.min_by(
                    F.struct("n", "a", "b"),
                    F.struct(
                        (-F.col("n")).alias("nn"), F.col("a"), F.col("b")
                    ),
                ).alias("best")
            )
            .collect()
        )
        top = best[0].best
        if top is None or top.n < 2:
            break
        a, b = top.a, top.b
        merges.append((a, b))
        search, repl = _merge_pattern(a, b)
        vocab = vocab.select(
            F.replace(F.col("canon"), F.lit(search), F.lit(repl)).alias(
                "canon"
            ),
            "cnt",
        )
        since_cut += 1
        if since_cut >= 4:
            vocab = vocab.localCheckpoint()
            since_cut = 0
    return merges


def _train_driver_side(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the SAME canonical-string
    representation the distributed path uses (``str.replace`` on
    ``·a··b·`` patterns — mechanically distinct from
    :func:`bpe_reference_merges`'s tuple scan, so the three
    implementations cross-check each other). Word counts fit the
    driver by the ``driver_vocab_threshold`` contract."""
    from collections import Counter

    vocab: list[list] = [
        [
            SEP + SEP + (SEP + SEP).join(list(w) + [EOW]) + SEP + SEP,
            cnt,
        ]
        for w, cnt in word_counts.items()
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for canon, cnt in vocab:
            syms = [s for s in canon.strip(SEP).split(SEP + SEP) if s]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += cnt
        if not pair_counts:
            break
        (a, b), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((a, b))
        search, repl = _merge_pattern(a, b)
        for entry in vocab:
            entry[0] = entry[0].replace(search, repl)
    return merges


# Above this merge count the expression-chain apply is refused: each
# merge adds one literal `replace` node, and a real 16k-32k vocabulary
# would build a Catalyst expression tree thousands deep — codegen/
# analysis blowup long before any row is processed. The Arrow encoder
# (:func:`bpe_apply_arrow`) has NO such limit (its per-word cost is
# independent of table size — rank lookups are dict hits, not a scan
# of the table). Crossover measurements live in BENCH_NOTES.md.
MAX_CHAIN_MERGES = 256


def bpe_apply(
    corpus: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    eow_display: str = "</w>",
) -> DataFrame:
    """Tokenize every document with a learned merge list. Emits
    ``(id, n_tokens, tokens)`` where ``tokens`` is the space-joined
    BPE token stream (EOW rendered as ``eow_display``). Pure per-row
    JVM expressions — the merge chain is ``len(merges)`` literal
    replaces on one canonical string per document. Refuses tables
    over ``MAX_CHAIN_MERGES`` loudly: vocabulary-scale tables go
    through :func:`bpe_apply_arrow` (identical output, pinned by
    pytest parity)."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    if len(merges) > MAX_CHAIN_MERGES:
        raise ValueError(
            f"bpe_apply: {len(merges)} merges exceeds the expression-"
            f"chain limit ({MAX_CHAIN_MERGES}) — a replace chain this "
            "deep blows up Catalyst analysis/codegen; use "
            "bpe_apply_arrow (identical tokens, table-size-independent "
            "per-word cost)"
        )
    doc_canon = F.array_join(
        F.transform(_words(F.col(text_col)), _canonical_word), ""
    )
    for a, b in merges:
        search, repl = _merge_pattern(a, b)
        doc_canon = F.replace(doc_canon, F.lit(search), F.lit(repl))
    toks = F.when(
        F.length(doc_canon) > 0, _symbols(doc_canon)
    ).otherwise(F.array().cast("array<string>"))
    return spread(corpus).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.replace(
            F.array_join(toks, " "), F.lit(EOW), F.lit(eow_display)
        ).alias("tokens"),
    )


def _make_word_encoder(merges: list[tuple[str, str]]):
    """The per-word rank-priority merge kernel shared by the Arrow
    faces (string tokens and id encoding): repeatedly merge every
    occurrence of the lowest-rank pair present, left-to-right —
    equivalent to the sequential replace chain (see
    :func:`bpe_apply_arrow`). Returns a memoizing ``word → symbols``
    closure; build one per Arrow batch so the memo lives exactly as
    long as the batch."""
    ranks: dict[tuple[str, str], int] = {
        (a, b): i for i, (a, b) in enumerate(merges)
    }
    pair_list: list[tuple[str, str]] = [(a, b) for a, b in merges]
    cache: dict[str, list[str]] = {}

    def enc_word(w: str) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w) + [EOW]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = pair_list[best]
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[w] = syms
        return syms

    return enc_word


def _arrow_token_udf(merges: list[tuple[str, str]]):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words_batches: pd.Series) -> pd.Series:
        enc_word = _make_word_encoder(merges)
        out = []
        for words in words_batches:
            toks: list[str] = []
            if words is not None:
                for w in words:
                    toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return _encode


def bpe_apply_arrow(
    corpus: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    eow_display: str = "</w>",
) -> DataFrame:
    """Vocabulary-scale BPE apply: identical output to
    :func:`bpe_apply` (pinned by pytest parity at every chain-
    expressible size), but the merge table is a broadcast dict walked
    by an Arrow-batched encoder instead of a Catalyst replace chain —
    so a real 16k-32k-merge vocabulary is just a bigger dict, not a
    32k-deep expression tree.

    Encoder semantics (public subword-nmt contract): repeatedly merge
    every occurrence of the LOWEST-RANK pair present in the word,
    left-to-right, until none remains. Equivalent to applying the
    merge list sequentially (the replace chain): merging rank k can
    only create pairs containing the new symbol, and any pair
    containing a symbol born at rank k was learned AFTER k — so the
    minimum present rank is non-decreasing and both orders converge to
    the same fixpoint. Per-word results are memoized per Arrow batch
    (natural-language batches repeat most words), and per-word cost is
    O(len · merges-applied) dict lookups — INDEPENDENT of the table
    size, where the chain pays one scan per table row per document.

    Tokenization parity is by construction, not by re-implementation:
    the words array is produced by the SAME ``_words`` JVM expression
    the chain path uses, and only the per-word symbol merging crosses
    into Python."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    _encode = _arrow_token_udf(merges)

    enc = spread(corpus).select(
        F.col(id_col), _encode(_words(F.col(text_col))).alias("__toks")
    )
    return enc.select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.replace(
            F.array_join(F.col("__toks"), " "), F.lit(EOW), F.lit(eow_display)
        ).alias("tokens"),
    )


def bpe_reference_merges(
    texts: list[str], n_merges: int
) -> list[tuple[str, str]]:
    """Independent driver-side reference implementation (plain Python,
    no Spark) of the SAME training contract — used by tests and oracle
    construction to pin the distributed path against a second
    derivation. Tie-break identical: count desc, then (a, b)
    lexicographic ascending."""
    from collections import Counter

    word_counts: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in t.lower().split():
            word_counts[tuple(w) + (EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for syms, cnt in word_counts.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_counts: Counter[tuple[str, ...]] = Counter()
        for syms, cnt in word_counts.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_counts[tuple(out)] += cnt
        word_counts = new_counts
    return merges


def bpe_model_to_json(merges: list[tuple[str, str]]) -> str:
    """Serialize a learned merge list to JSON — the artifact persisted
    next to a tokenized corpus (the PQ/IVFPQ model-persistence
    pattern: tokens without their merge table are not reproducible; a
    loaded model re-tokenizes bit-for-bit). The EOW control mark is
    escaped by JSON itself; ``kind`` guards against feeding the wrong
    artifact back."""
    import json

    return json.dumps(
        {"kind": "bpe", "version": 1, "merges": [list(m) for m in merges]}
    )


def bpe_model_from_json(s: str) -> list[tuple[str, str]]:
    import json

    d = json.loads(s)
    if d.get("kind") != "bpe":
        raise ValueError(f"not a BPE model payload (kind={d.get('kind')!r})")
    return [(a, b) for a, b in d["merges"]]


def bpe_alphabet(
    reference: DataFrame, text_col: str = "text", max_chars: int = 65_536
) -> list[str]:
    """Sorted distinct characters of the reference corpus's lowercased
    whitespace words — the base symbols of the id table. Bounded
    loudly (a real text alphabet is hundreds of code points; millions
    means the input is not text)."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        _guard_model_rows,
        _words,
    )

    chars = (
        reference.select(F.explode(_words(F.col(text_col))).alias("w"))
        .select(
            F.explode(
                F.filter(
                    F.split(F.col("w"), ""), lambda c: F.length(c) > 0
                )
            ).alias("c")
        )
        .distinct()
    )
    _guard_model_rows(chars, max_chars, "bpe_alphabet", "character set")
    return sorted(r.c for r in chars.collect())


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet: list[str]
) -> dict[str, int]:
    """Deterministic token-id table: the sorted base alphabet (EOW
    included) takes ids 0..A-1, merge PRODUCTS take A+rank in learned
    order (the subword-nmt vocab layout). The UNK id is ``len(vocab)``
    by convention — encode maps any symbol containing an out-of-
    alphabet character there instead of failing (a char-level BPE has
    no other unseen-symbol source: every in-alphabet word decomposes
    to base symbols)."""
    vocab: dict[str, int] = {}
    for ch in sorted(set(alphabet) | {EOW}):
        vocab[ch] = len(vocab)
    for a, b in merges:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return vocab


def bpe_encode_ids(
    corpus: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize to TOKEN IDS — what a training pipeline actually ships
    (ids feed sequence packing; strings are a debugging view). Same
    Arrow encoder as :func:`bpe_apply_arrow` (identical token stream),
    then the broadcast vocab dict maps each symbol; unknown symbols
    (out-of-alphabet characters) map to ``len(vocab)``, the UNK id.
    Output: ``(id, n_tokens, ids array<int>)``."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    unk = len(vocab)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode_ids(words_batches: pd.Series) -> pd.Series:
        enc_word = _make_word_encoder(merges)
        out = []
        for words in words_batches:
            ids: list[int] = []
            if words is not None:
                for w in words:
                    ids.extend(
                        vocab.get(s, unk) for s in enc_word(w)
                    )
            out.append(ids)
        return pd.Series(out)

    enc = spread(corpus).select(
        F.col(id_col), _encode_ids(_words(F.col(text_col))).alias("__ids")
    )
    return enc.select(
        id_col,
        F.size("__ids").cast("long").alias("n_tokens"),
        F.col("__ids").alias("ids"),
    )


def pack_token_ids(
    encoded: DataFrame,
    budget: int,
    strata_col: str,
    order_col: str,
    ids_col: str = "ids",
) -> DataFrame:
    """Materialize PACKED TRAINING SEQUENCES from per-document token
    ids: per stratum, documents concatenate in ``order_col`` order and
    the id stream chunks into ``budget``-length sequences (the final
    partial sequence of a stratum is emitted short — padding policy
    belongs to the trainer).

    Scale shape: tokens never explode to rows. A prefix-sum window
    over slim (stratum, order, n) rows places each document; each
    document then emits only its FRAGMENTS — (sequence, slice of its
    own id array) — via one bounded ``sequence()`` explode (a document
    touches ⌈n/budget⌉+1 sequences), and sequences reassemble with one
    groupBy collecting fragments in order. Shuffle volume = the id
    arrays, once.

    Output: ``(strata_col, seq_id, n_ids, ids)``."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.size(F.col(ids_col)).cast("long")
    placed = encoded.select(
        strata_col,
        F.col(order_col),
        F.col(ids_col),
        F.coalesce(F.sum(n).over(w), F.lit(0)).alias("__start"),
    )
    n_here = F.size(F.col(ids_col)).cast("long")
    first_seq = (F.col("__start") / budget).cast("long")
    last_seq = (
        (F.col("__start") + F.greatest(n_here, F.lit(1)) - 1) / budget
    ).cast("long")
    frags = placed.select(
        strata_col,
        F.col(ids_col),
        "__start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    # this fragment covers stream positions [lo, hi) of the document
    lo = F.greatest(
        F.col("seq_id") * budget - F.col("__start"), F.lit(0)
    )
    hi = F.least(
        (F.col("seq_id") + 1) * budget - F.col("__start"),
        F.size(F.col(ids_col)).cast("long"),
    )
    sliced = frags.select(
        strata_col,
        "seq_id",
        F.col("__start").alias("__frag_order"),
        F.slice(F.col(ids_col), lo + 1, F.greatest(hi - lo, F.lit(0))).alias(
            "__frag"
        ),
    ).where(F.size("__frag") > 0)
    out = (
        sliced.groupBy(strata_col, "seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__frag_order").alias("o"),
                                F.col("__frag").alias("f"),
                            )
                        )
                    ),
                    lambda s: s["f"],
                )
            ).alias("ids")
        )
    )
    return out.select(
        strata_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        F.size("ids").cast("long").alias("n_ids"),
        "ids",
    )
