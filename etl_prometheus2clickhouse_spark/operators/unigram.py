"""Unigram-LM (SentencePiece-style) subword tokenizer: distributed
hard-EM training + Arrow-batched Viterbi encode.

The unigram language model (Kudo, ACL 2018, "Subword Regularization")
is the tokenizer most modern LLM pipelines actually ship (SentencePiece
unigram mode). Where BPE greedily merges pairs, unigram-LM keeps a
probability per piece and segments each word with Viterbi — the
minimum total negative-log-likelihood path through the word's
substring lattice.

Spark-first re-expression (mirrors :mod:`.bpe` — training statistics
are identical on the word-frequency table and the raw corpus):

- **Training** (:func:`unigram_train`): one map-side-combining word
  count reduces the corpus to a vocabulary-bounded ``(word, cnt)``
  table up front. Seeding explodes every substring up to
  ``max_piece_len`` as a JVM expression (no Python in the corpus-sized
  pass) and keeps the top candidates by frequency in one aggregate.
  Each hard-EM round is one Arrow-batched segmentation pass over the
  word table (the current piece table rides along as a broadcast-sized
  Python dict — model-sized by the ``max_vocab_words`` guard) plus one
  piece-count aggregate; the M-step renormalization and the final
  frequency prune are driver-side on the vocabulary-bounded piece
  table (the bounded-train-collect precedent of the IVF k-means and
  BPE trainers). A word table at or under ``driver_vocab_threshold``
  rows skips the cluster round-trips entirely and trains driver-side —
  both routes produce the identical piece table (pinned by pytest).

- **Hard EM, not soft EM**: the E-step assigns each word its single
  Viterbi segmentation (count-weighted) rather than expected usages
  under forward-backward. This keeps every statistic an exact integer
  — the piece table is reproducible bit-for-bit across the driver
  route, the distributed route, and the independent reference trainer
  (:func:`unigram_reference_model`), which is what lets the DuckDB
  oracle replay the whole pipeline. The fixed-point differs from soft
  EM in degenerate ties only; the MODEL SHAPE (piece table +
  likelihoods + Viterbi encode) is the SentencePiece contract.

- **Encode** (:func:`unigram_apply`): word-splitting stays a JVM
  expression (:func:`.text._words` — the lower+whitespace contract
  every text operator shares); the per-word Viterbi runs in an
  Arrow-batched ``mapInPandas`` with a per-batch memo, so the per-word
  cost is paid once per DISTINCT word per batch (the
  ``bpe_apply_arrow`` shape). Zero shuffles: tokenization is per-row,
  embarrassingly parallel at any scale.

Exactness contract (what makes the oracle bit-exact): piece NLLs are
computed ONCE at train time (``-ln(count/total)`` on exact integers)
and carried as float64 literals; Viterbi accumulates them with plain
float64 addition in DP-position order and breaks cost ties by the
lexicographically smaller space-joined token string. Any engine that
replays the same additions and comparisons on the same literals — the
DuckDB oracle unrolls the same DP — reproduces the exact segmentation.

Out-of-vocabulary handling: every alphabet character is kept in the
vocabulary by construction, and a character outside the trained
alphabet segments as itself at a fixed ``UNK_NLL`` edge; words longer
than ``MAX_WORD_LEN`` pass through as a single opaque token (they are
out-of-distribution at natural-language word lengths, and bounding the
DP depth is what lets the oracle unroll it).
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.partitioning import spread

# the always-available single-character fallback edge for characters
# outside the trained alphabet — large enough that any in-vocabulary
# segmentation beats it, finite so every word still segments
UNK_NLL = 20.0

# Viterbi DP depth bound: words longer than this pass through as one
# opaque token. 48 covers natural-language words with margin; the
# DuckDB oracle unrolls exactly this many DP levels.
MAX_WORD_LEN = 48


# ---------------------------------------------------------------------------
# Viterbi segmentation (the engine's encoder kernel)
# ---------------------------------------------------------------------------

def viterbi_segment(
    word: str, nll: "dict[str, float]", max_piece_len: int
) -> "list[str]":
    """Minimum-NLL segmentation of one word under the piece table.

    DP over end positions; candidate edges at position ``i`` are every
    in-table piece ending there (length 1..max_piece_len) plus the
    ``UNK_NLL`` single-character edge when the character itself is not
    a piece. Cost ties break on the lexicographically smaller
    space-joined token string — the exact rule the DuckDB oracle
    replays, so keep the comparison on the joined string, not the
    list."""
    if len(word) > MAX_WORD_LEN:
        return [word]
    n = len(word)
    # best[i] = (cost, " tok1 tok2 ...") for word[:i]; the leading
    # space matches the oracle's '' || ' ' || piece accumulation
    best: "list[tuple[float, str] | None]" = [None] * (n + 1)
    best[0] = (0.0, "")
    for i in range(1, n + 1):
        cand: "tuple[float, str] | None" = None
        for k in range(1, min(i, max_piece_len) + 1):
            piece = word[i - k: i]
            c = nll.get(piece)
            if c is None:
                continue
            prev = best[i - k]
            if prev is None:
                continue
            t = (prev[0] + c, prev[1] + " " + piece)
            if cand is None or t < cand:
                cand = t
        ch = word[i - 1: i]
        if ch not in nll:
            prev = best[i - 1]
            if prev is not None:
                t = (prev[0] + UNK_NLL, prev[1] + " " + ch)
                if cand is None or t < cand:
                    cand = t
        best[i] = cand
    final = best[n]
    assert final is not None  # single-char edges make every word reachable
    return final[1].split()


def viterbi_nbest(
    word: str, nll: "dict[str, float]", max_piece_len: int, n: int
) -> "list[list[str]]":
    """The ``n`` best segmentations of one word, ranked by
    ``(cost, joined-token-string)`` — the subword-regularization lattice
    of Kudo ACL'18 §3, DP-exact: keeping the top-``n`` partial paths
    per end position is lossless because the ``(cost, toks)`` order is
    preserved under appending a common suffix (costs add equally, and
    two distinct same-position partials are never string-prefixes of
    each other — their token strings cover the same characters — so
    the first differing character decides both before and after the
    append). Words over ``MAX_WORD_LEN`` have exactly one
    segmentation (the opaque pass-through), so they return a single
    entry. Deterministic: same tie-break rule as
    :func:`viterbi_segment`; ``viterbi_nbest(...)[0]`` equals it."""
    return [t.split() for _, t in _nbest(word, nll, max_piece_len, n)]


def _nbest(
    word: str, nll: "dict[str, float]", max_piece_len: int, n: int
) -> "list[tuple[float, str]]":
    """(cost, ' tok1 tok2 ...') n-best tuples, ascending — the
    sampling face needs the costs; :func:`viterbi_nbest` exposes the
    token lists."""
    if n < 1:
        raise ValueError(f"viterbi_nbest: n must be >= 1, got {n}")
    if len(word) > MAX_WORD_LEN:
        return [(0.0, " " + word)]
    ln = len(word)
    # best[i] = up to n (cost, " tok1 tok2 ...") tuples, ascending
    best: "list[list[tuple[float, str]]]" = [[] for _ in range(ln + 1)]
    best[0] = [(0.0, "")]
    for i in range(1, ln + 1):
        cand: "list[tuple[float, str]]" = []
        for k in range(1, min(i, max_piece_len) + 1):
            piece = word[i - k: i]
            c = nll.get(piece)
            if c is None:
                continue
            for pc, pt in best[i - k]:
                cand.append((pc + c, pt + " " + piece))
        ch = word[i - 1: i]
        if ch not in nll:
            for pc, pt in best[i - 1]:
                cand.append((pc + UNK_NLL, pt + " " + ch))
        cand.sort()
        best[i] = cand[:n]
    assert best[ln]  # single-char edges make every word reachable
    return best[ln]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _em_and_prune(
    word_counts: "dict[str, int]",
    vocab_size: int,
    max_piece_len: int,
    em_iters: int,
    seed_size: int,
    seed_counts: "dict[str, int] | None" = None,
    e_step=None,
) -> "list[tuple[str, float]]":
    """The driver-side core every route shares: seed → hard-EM →
    frequency prune → final NLLs. ``seed_counts`` lets the distributed
    route hand in substring counts it aggregated on the cluster;
    ``e_step(nll) -> dict[piece, count]`` lets it run the segmentation
    pass distributed. Both default to driver-side computation over
    ``word_counts``."""
    if seed_counts is None:
        seed_counts = {}
        for w, c in word_counts.items():
            n = len(w)
            for i in range(n):
                for k in range(1, min(max_piece_len, n - i) + 1):
                    p = w[i:i + k]
                    seed_counts[p] = seed_counts.get(p, 0) + c
    chars = sorted({p for p in seed_counts if len(p) == 1})
    multi = sorted(
        ((p, c) for p, c in seed_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max(0, seed_size - len(chars))]
    counts: "dict[str, int]" = {p: seed_counts[p] for p in chars}
    counts.update(dict(multi))

    if not counts:
        raise ValueError(
            "unigram_train: the reference corpus has no tokens — a "
            "piece table cannot be estimated from an empty vocabulary"
        )

    def _driver_e_step(nll: "dict[str, float]") -> "dict[str, int]":
        new: "dict[str, int]" = {}
        for w, c in word_counts.items():
            for t in viterbi_segment(w, nll, max_piece_len):
                if t in counts:
                    new[t] = new.get(t, 0) + c
        return new

    run_e = e_step or _driver_e_step
    for _ in range(em_iters):
        total = sum(counts.values())
        nll = {
            p: -math.log(c / total) for p, c in counts.items() if c > 0
        }
        new = run_e(nll)
        # pieces the Viterbi stopped using are dropped; alphabet
        # characters always survive (coverage: every in-alphabet word
        # must keep a segmentation)
        counts = {
            p: new.get(p, 0)
            for p in counts
            if new.get(p, 0) > 0 or len(p) == 1
        }
    chars_final = sorted(p for p in counts if len(p) == 1)
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max(0, vocab_size - len(chars_final))]
    kept = {p: max(counts[p], 1) for p in chars_final}
    kept.update({p: c for p, c in multis})
    total = sum(kept.values())
    return sorted(
        (p, -math.log(c / total)) for p, c in kept.items()
    )


def _substrings(w: Column, max_piece_len: int) -> Column:
    """All substrings of ``w`` with length 1..max_piece_len, counted
    positionally — a pure JVM expression (no Python in the seed
    pass)."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_piece_len)),
            lambda k: F.when(
                F.length(w) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(w) - k + 1),
                    lambda i: w.substr(i, k),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def unigram_train(
    reference: DataFrame,
    vocab_size: int = 64,
    text_col: str = "text",
    max_piece_len: int = 6,
    em_iters: int = 4,
    seed_size: int | None = None,
    max_vocab_words: int = 1_000_000,
    driver_vocab_threshold: int = 65_536,
) -> "list[tuple[str, float]]":
    """Train a unigram-LM piece table on a reference corpus; returns
    the piece-sorted ``[(piece, nll), ...]`` model. See the module
    docstring for the algorithm and the two execution routes."""
    from etl_prometheus2clickhouse_spark.operators.text import (
        _guard_model_rows,
        _words,
    )

    seed_size = seed_size if seed_size is not None else vocab_size * 4
    words = (
        reference.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    _guard_model_rows(
        words, max_vocab_words, "unigram_train",
        "reference word-frequency table",
    )
    if driver_vocab_threshold > 0:
        head = words.limit(driver_vocab_threshold + 1).collect()
        if len(head) <= driver_vocab_threshold:
            return _em_and_prune(
                {r.w: r.cnt for r in head}, vocab_size, max_piece_len,
                em_iters, seed_size,
            )
    words = words.localCheckpoint()

    # distributed seed: substring explode (JVM) + one aggregate; the
    # collected candidate table is seed-bounded (top seed_size multis
    # + the alphabet), never word-table-sized
    sub = (
        words.select(
            F.explode(_substrings(F.col("w"), max_piece_len)).alias("p"),
            "cnt",
        )
        .groupBy("p")
        .agg(F.sum("cnt").alias("c"))
    )
    chars = {
        r.p: int(r.c) for r in sub.where(F.length("p") == 1).collect()
    }
    multi = {
        r.p: int(r.c)
        for r in sub.where(F.length("p") > 1)
        .orderBy(F.desc("c"), F.asc("p"))
        .limit(max(0, seed_size - len(chars)))
        .collect()
    }
    seed_counts = {**chars, **multi}

    def e_step(nll: "dict[str, float]") -> "dict[str, int]":
        # one Arrow-batched segmentation pass over the word table; the
        # model dict is broadcast-sized by construction (≤ seed_size)
        mpl = max_piece_len

        def gen(batches: Iterable) -> Iterator:
            import pandas as pd

            for pdf in batches:
                out: "dict[str, int]" = {}
                for w, c in zip(pdf["w"], pdf["cnt"]):
                    for t in viterbi_segment(str(w), nll, mpl):
                        out[t] = out.get(t, 0) + int(c)
                yield pd.DataFrame(
                    {"p": list(out), "c": list(out.values())}
                )

        rows = (
            words.mapInPandas(gen, "p string, c long")
            .groupBy("p")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        return {r.p: int(r.c) for r in rows}

    return _em_and_prune(
        {}, vocab_size, max_piece_len, em_iters, seed_size,
        seed_counts=seed_counts, e_step=e_step,
    )


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def unigram_apply(
    corpus: DataFrame,
    model: "list[tuple[str, float]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Tokenize every document with a trained piece table. Emits
    ``(id, n_tokens, tokens)`` — ``tokens`` is the space-joined piece
    stream across the document's words (same shape as
    :func:`.bpe.bpe_apply`). Word-splitting is the shared JVM
    expression; the Viterbi runs Arrow-batched with a per-batch memo,
    so per-word cost is paid once per distinct word per batch."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    nll = dict(model)
    mpl = (
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in nll), default=1)
    )
    base = spread(corpus).select(
        F.col(id_col).alias("__uid"), _words(F.col(text_col)).alias("__uw")
    )

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        memo: "dict[str, list[str]]" = {}
        for pdf in batches:
            ids, n_toks, toks = [], [], []
            for i, ws in zip(pdf["__uid"], pdf["__uw"]):
                pieces: "list[str]" = []
                for w in ws:
                    w = str(w)
                    got = memo.get(w)
                    if got is None:
                        got = viterbi_segment(w, nll, mpl)
                        memo[w] = got
                    pieces.extend(got)
                ids.append(i)
                n_toks.append(len(pieces))
                toks.append(" ".join(pieces))
            yield pd.DataFrame(
                {"__uid": ids, "n_tokens": n_toks, "tokens": toks}
            )

    out_schema = (
        f"__uid {base.schema['__uid'].dataType.simpleString()}, "
        "n_tokens long, tokens string"
    )
    return base.mapInPandas(gen, out_schema).withColumnRenamed(
        "__uid", id_col
    )


def unigram_word_nbest(
    corpus: DataFrame,
    model: "list[tuple[str, float]]",
    n: int = 3,
    text_col: str = "text",
    max_piece_len: int | None = None,
) -> DataFrame:
    """The ``n``-best segmentations of every DISTINCT word in the
    corpus — the deterministic, oracle-able face of subword
    regularization (the candidate lists :func:`unigram_apply_sampled`
    draws from). Emits ``(w, rank, n_tokens, tokens)``, rank 1-based
    in ``(cost, token-string)`` order; words with fewer than ``n``
    distinct segmentations (including the over-``MAX_WORD_LEN``
    pass-throughs, which have exactly one) emit fewer rows.

    Scale shape: word splitting and the distinct are JVM-side (one
    shuffle on the word — vocabulary-sized, not corpus-sized); the
    n-best DP runs Arrow-batched per distinct word."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    nll = dict(model)
    mpl = (
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in nll), default=1)
    )
    words = corpus.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).distinct()

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ws, ranks, n_toks, toks = [], [], [], []
            for w in pdf["w"]:
                w = str(w)
                for r, (_, t) in enumerate(_nbest(w, nll, mpl, n), 1):
                    seg = t.split()
                    ws.append(w)
                    ranks.append(r)
                    n_toks.append(len(seg))
                    toks.append(" ".join(seg))
            yield pd.DataFrame(
                {"w": ws, "rank": ranks, "n_tokens": n_toks,
                 "tokens": toks}
            )

    return words.mapInPandas(
        gen, "w string, rank int, n_tokens long, tokens string"
    )


def unigram_apply_sampled(
    corpus: DataFrame,
    model: "list[tuple[str, float]]",
    n: int = 4,
    alpha: float = 0.2,
    seed: int = 12345,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Sampled segmentation — the actual regularization training trick
    of Kudo ACL'18: each word OCCURRENCE draws one of its ``n``-best
    segmentations with probability ∝ ``exp(-alpha * cost)`` (α→∞
    recovers Viterbi, α=0 is uniform over the candidates). The draw is
    a pure multiplicative hash of ``(doc position, word position,
    seed)`` — reproducible across runs, partitionings, and cluster
    sizes, NEVER a per-partition RNG — but the output is deliberately
    NOT oracle-paired: sampling has no single right answer to hash,
    so its contract is pinned by pytest instead (every emitted
    segmentation is a member of the word's n-best list; the empirical
    draw frequencies track the model probabilities; large α equals
    :func:`unigram_apply`). Same output shape as ``unigram_apply``."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    nll = dict(model)
    mpl = (
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in nll), default=1)
    )
    base = spread(corpus).select(
        F.col(id_col).alias("__uid"), _words(F.col(text_col)).alias("__uw")
    )
    _MULT, _MOD = 2654435761, 2 ** 32  # Knuth multiplicative (public)

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        import zlib

        memo: "dict[str, tuple[list[list[str]], list[float]]]" = {}
        for pdf in batches:
            ids, n_toks, toks = [], [], []
            for i, ws in zip(pdf["__uid"], pdf["__uw"]):
                # doc-key hash: stable under repartitioning AND across
                # processes (crc32, never Python's salted hash()) —
                # id-based, never position-in-partition
                dkey = zlib.crc32(str(i).encode("utf-8"))
                pieces: "list[str]" = []
                for j, w in enumerate(ws):
                    w = str(w)
                    got = memo.get(w)
                    if got is None:
                        cands = _nbest(w, nll, mpl, n)
                        segs = [t.split() for _, t in cands]
                        weights = [
                            math.exp(-alpha * (c - cands[0][0]))
                            for c, _ in cands
                        ]
                        tot = sum(weights)
                        cum, acc = [], 0.0
                        for x in weights:
                            acc += x / tot
                            cum.append(acc)
                        got = (segs, cum)
                        memo[w] = got
                    segs, cum = got
                    if len(segs) == 1:
                        pieces.extend(segs[0])
                        continue
                    u = (
                        ((dkey + j * 7919 + seed) * _MULT + seed)
                        % _MOD
                    ) / _MOD
                    pick = 0
                    while pick < len(cum) - 1 and u >= cum[pick]:
                        pick += 1
                    pieces.extend(segs[pick])
                ids.append(i)
                n_toks.append(len(pieces))
                toks.append(" ".join(pieces))
            yield pd.DataFrame(
                {"__uid": ids, "n_tokens": n_toks, "tokens": toks}
            )

    out_schema = (
        f"__uid {base.schema['__uid'].dataType.simpleString()}, "
        "n_tokens long, tokens string"
    )
    return base.mapInPandas(gen, out_schema).withColumnRenamed(
        "__uid", id_col
    )


def unigram_vocab(model: "list[tuple[str, float]]") -> "dict[str, int]":
    """Deterministic token-id table: pieces take ids in the model's
    piece-sorted order (the layout :func:`unigram_train` already
    emits). The UNK id is ``len(vocab)`` by convention — encode maps
    out-of-alphabet single-character tokens there (the only unseen-
    token source: every in-alphabet word decomposes to base chars)."""
    return {p: i for i, (p, _) in enumerate(model)}


def unigram_encode_ids(
    corpus: DataFrame,
    model: "list[tuple[str, float]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Tokenize to TOKEN IDS — what a training pipeline actually ships
    (ids feed sequence packing; strings are a debugging view). Same
    Arrow-batched memoized Viterbi as :func:`unigram_apply`, then the
    broadcast vocab maps each piece; out-of-vocabulary tokens (UNK
    single chars, and words over ``MAX_WORD_LEN`` passed through
    opaque) map to ``len(vocab)``. Output ``(id, n_tokens,
    ids array<int>)``."""
    from etl_prometheus2clickhouse_spark.operators.text import _words

    nll = dict(model)
    vocab = unigram_vocab(model)
    unk = len(vocab)
    mpl = (
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in nll), default=1)
    )
    base = spread(corpus).select(
        F.col(id_col).alias("__uid"), _words(F.col(text_col)).alias("__uw")
    )

    def gen(batches: Iterable) -> Iterator:
        import pandas as pd

        memo: "dict[str, list[int]]" = {}
        for pdf in batches:
            ids_col, n_toks, toks = [], [], []
            for i, ws in zip(pdf["__uid"], pdf["__uw"]):
                enc: "list[int]" = []
                for w in ws:
                    w = str(w)
                    got = memo.get(w)
                    if got is None:
                        got = [
                            vocab.get(t, unk)
                            for t in viterbi_segment(w, nll, mpl)
                        ]
                        memo[w] = got
                    enc.extend(got)
                ids_col.append(i)
                n_toks.append(len(enc))
                toks.append(enc)
            yield pd.DataFrame(
                {"__uid": ids_col, "n_tokens": n_toks, "ids": toks}
            )

    out_schema = (
        f"__uid {base.schema['__uid'].dataType.simpleString()}, "
        "n_tokens long, ids array<int>"
    )
    return base.mapInPandas(gen, out_schema).withColumnRenamed(
        "__uid", id_col
    )


# ---------------------------------------------------------------------------
# independent reference trainer (the oracle's model source)
# ---------------------------------------------------------------------------

def unigram_reference_model(
    texts: "list[str]",
    vocab_size: int = 64,
    max_piece_len: int = 6,
    em_iters: int = 4,
    seed_size: int | None = None,
) -> "list[tuple[str, float]]":
    """Plain-Python unigram-LM trainer over raw texts — NO Spark, no
    shared kernels with the engine path (its Viterbi is a separate
    backpointer-style DP): a drift in the distributed trainer or the
    engine's segmenter changes the piece table or the tokens and fails
    the value hash. Same algorithm spec as :func:`unigram_train` (the
    module docstring)."""
    seed_size = seed_size if seed_size is not None else vocab_size * 4
    wc: "dict[str, int]" = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1

    def segment(word, table):
        # backpointer DP (deliberately a different mechanization from
        # viterbi_segment's accumulated-string tuples; identical spec:
        # float64 edge sums, ties to the lexicographically smaller
        # space-joined token string)
        if len(word) > MAX_WORD_LEN:
            return [word]
        n = len(word)
        cost = [None] * (n + 1)
        path = [None] * (n + 1)
        cost[0], path[0] = 0.0, ""
        for i in range(1, n + 1):
            for k in range(1, min(i, max_piece_len) + 1):
                piece = word[i - k:i]
                pc = table.get(piece)
                if pc is None or cost[i - k] is None:
                    continue
                c2 = cost[i - k] + pc
                t2 = path[i - k] + " " + piece
                if (
                    cost[i] is None
                    or (c2, t2) < (cost[i], path[i])
                ):
                    cost[i], path[i] = c2, t2
            ch = word[i - 1]
            if ch not in table and cost[i - 1] is not None:
                c2 = cost[i - 1] + UNK_NLL
                t2 = path[i - 1] + " " + ch
                if cost[i] is None or (c2, t2) < (cost[i], path[i]):
                    cost[i], path[i] = c2, t2
        return path[n].split()

    from collections import Counter

    seed: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i:i + k]] += c
    alphabet = sorted(p for p in seed if len(p) == 1)
    keep_multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max(0, seed_size - len(alphabet))]
    cnt = {p: seed[p] for p in alphabet}
    cnt.update(dict(keep_multi))
    for _ in range(em_iters):
        total = sum(cnt.values())
        table = {
            p: -math.log(c / total) for p, c in cnt.items() if c > 0
        }
        used: Counter = Counter()
        for w, c in wc.items():
            for t in segment(w, table):
                if t in cnt:
                    used[t] += c
        cnt = {
            p: used.get(p, 0)
            for p in cnt
            if used.get(p, 0) > 0 or len(p) == 1
        }
    chars_final = sorted(p for p in cnt if len(p) == 1)
    multis = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:max(0, vocab_size - len(chars_final))]
    kept = {p: max(cnt[p], 1) for p in chars_final}
    kept.update(dict(multis))
    total = sum(kept.values())
    return sorted((p, -math.log(c / total)) for p, c in kept.items())


def unigram_reference_segment(
    word: str, model: "list[tuple[str, float]]",
    max_piece_len: int | None = None,
) -> "list[str]":
    """The reference trainer's segmenter exposed for parity tests."""
    nll = dict(model)
    mpl = (
        max_piece_len
        if max_piece_len is not None
        else max((len(p) for p in nll), default=1)
    )
    if len(word) > MAX_WORD_LEN:
        return [word]
    n = len(word)
    cost: "list[float | None]" = [None] * (n + 1)
    path: "list[str | None]" = [None] * (n + 1)
    cost[0], path[0] = 0.0, ""
    for i in range(1, n + 1):
        for k in range(1, min(i, mpl) + 1):
            piece = word[i - k:i]
            pc = nll.get(piece)
            if pc is None or cost[i - k] is None:
                continue
            c2, t2 = cost[i - k] + pc, path[i - k] + " " + piece
            if cost[i] is None or (c2, t2) < (cost[i], path[i]):
                cost[i], path[i] = c2, t2
        ch = word[i - 1]
        if ch not in nll and cost[i - 1] is not None:
            c2, t2 = cost[i - 1] + UNK_NLL, path[i - 1] + " " + ch
            if cost[i] is None or (c2, t2) < (cost[i], path[i]):
                cost[i], path[i] = c2, t2
    return path[n].split()


__all__ = [
    "UNK_NLL",
    "MAX_WORD_LEN",
    "unigram_train",
    "unigram_apply",
    "unigram_apply_sampled",
    "unigram_encode_ids",
    "unigram_vocab",
    "unigram_word_nbest",
    "unigram_reference_model",
    "unigram_reference_segment",
    "viterbi_nbest",
    "viterbi_segment",
]
