"""Deduplication operators — exact and near-dup — for training-data
pipelines at 100 TB (engine extension; BASELINE.json north star).

Design for scale:

- **Exact dedup** hashes content to 64/128 bits and groups on the hash —
  one shuffle on a uniformly-distributed key (no skew by construction);
  at 100 TB this is the canonical map-side-combine-friendly job.
- **MinHash + LSH** computes per-document signatures entirely JVM-side
  (shingle → xxhash64 with per-permutation seeds → array_min), then
  *bands* signatures so near-duplicates collide in buckets. The only
  shuffle is the band-bucket self-join; candidate pairs are verified
  with exact Jaccard. Bucket sizes are data-bounded (cap via
  ``max_bucket``) so a degenerate bucket (e.g. boilerplate) can't
  produce a quadratic explosion — the classic large-scale failure mode.
- **SimHash** packs a 64-bit signature (vectorized Pandas UDF over
  JVM-computed shingle hashes) and generates candidates by exact-match
  on 16-bit chunks (Hamming ≤ 3 ⇒ some chunk matches — pigeonhole), so
  there is never an all-pairs comparison.
- **N-gram Jaccard** without LSH is supported only *blocked* (caller
  provides a blocking key); unblocked all-pairs is O(n²) and
  deliberately not offered.

References for the technique family: Broder's MinHash resemblance
estimation, Charikar's SimHash (public literature; see PAPERS.md).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.partitioning import spread
from pyspark.sql import types as T

# Persisted intermediates are recorded against the innermost ACTIVE
# scope (a stack of per-scope lists), so a scope frees exactly what was
# registered inside it — not a length-mark slice of a shared global
# list, which under-releases when release_cached() removes an entry
# registered before a nested scope's mark. Outside any scope nothing
# is registered globally (no unbounded growth in unscoped use); the
# result's ``_cached_deps`` attribute still lets release_cached() free
# them. The earlier attribute-only contract silently broke the moment
# a caller did result.select(...) — the new Python object doesn't
# carry the attribute — which is exactly what every catalog entry does.
_SCOPE_STACK: list[list[DataFrame]] = []


def release_cached(df: DataFrame) -> None:
    """Unpersist intermediate frames an operator cached for plan reuse.

    Operator results carry their persisted dependencies; call after
    materializing (collect/write) to free them. No-op for DataFrames
    without cached dependencies. Prefer :func:`cached_scope`, which
    needs no attribute plumbing and survives re-selection."""
    for dep in getattr(df, "_cached_deps", ()):
        _release(dep)


def _release(dep: DataFrame) -> None:
    try:
        dep.unpersist()
    except Exception:  # session already stopped — nothing to free
        pass
    # drop it from whichever scope recorded it so scope exit doesn't
    # re-release (and an inner scope's own entries stay its own)
    for entries in _SCOPE_STACK:
        try:
            entries.remove(dep)
            return
        except ValueError:
            continue


def _active_spark():
    """The session whose block manager a scope sweeps — the active
    session of this thread if any (foreachBatch bodies run on the
    stream execution thread), else the process-default session."""
    try:
        from pyspark.sql import SparkSession

        return (
            SparkSession.getActiveSession()
            or SparkSession._instantiatedSession
        )
    except Exception:
        return None


def _persistent_rdd_ids() -> "set[int] | None":
    spark = _active_spark()
    if spark is None:
        return None
    try:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}
    except Exception:
        return None


def _sweep_new_persistent_rdds(before: "set[int] | None") -> None:
    """Unpersist every RDD that became persistent during the scope.

    ``_release`` frees the frames operators *registered*, but
    ``localCheckpoint()`` pins MEMORY_AND_DISK blocks that no registry
    sees: they stay in the block manager until a driver GC lets the
    ContextCleaner find them. A long-lived session (the bench suite, a
    streaming job running for days) accumulates those blocks across
    queries/micro-batches — storage pressure a fresh-JVM probe never
    reproduces. Sweeping at scope exit is safe by the scope contract
    (results are materialized inside the block); diff-based against
    the entry snapshot so outer scopes' pins — e.g. a stream-lifetime
    reference model read by every per-batch scope — survive inner
    scope exits."""
    if before is None:
        return
    spark = _active_spark()
    if spark is None:
        return
    try:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in before:
                m.get(k).unpersist(False)
    except Exception:
        pass


@contextmanager
def cached_scope() -> Iterator[None]:
    """Free every intermediate persisted by operators inside the block.

    Materialize results (collect/write) INSIDE the block — after exit
    their cached inputs are gone and any re-run recomputes them::

        with cached_scope():
            pairs = minhash_lsh_pairs(docs)
            pairs.write.parquet(out)

    This is the long-lived-session contract: N queries under N scopes
    leave zero persisted partitions behind (pinned by
    tests/test_dedup.py). Scopes nest — each scope releases exactly
    the intermediates registered while it was innermost, regardless of
    interleaved release_cached() calls; single-threaded by design,
    like the driver-side plan building it wraps. Exit additionally
    sweeps any RDD that became persistent inside the scope and was
    never registered — ``localCheckpoint()`` pins, which otherwise
    outlive the query until a driver GC (see
    :func:`_sweep_new_persistent_rdds`)."""
    entries: list[DataFrame] = []
    _SCOPE_STACK.append(entries)
    before = _persistent_rdd_ids()
    try:
        yield
    finally:
        _SCOPE_STACK.pop()
        while entries:
            _release(entries.pop())
        _sweep_new_persistent_rdds(before)


def _register_cached(dep: DataFrame) -> None:
    if _SCOPE_STACK:
        _SCOPE_STACK[-1].append(dep)


def _with_cached_deps(df: DataFrame, deps: list[DataFrame]) -> DataFrame:
    df._cached_deps = deps  # type: ignore[attr-defined]
    for dep in deps:
        _register_cached(dep)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _keep_one_per_key(df: DataFrame, key_cols: list[str], order_col: str | None) -> DataFrame:
    """One row per key via an aggregate with map-side partial combine.

    ``order_col`` picks the minimum-ordered row deterministically via
    ``min_by``; without it the pick is arbitrary (``dropDuplicates``),
    which is cheapest and fine when survivors are content-identical.

    Plan note: ``min_by`` over a struct buffer physically lands as
    SortAggregate (struct buffers aren't hash-map mutable), i.e. a
    per-partition sort on both sides of the exchange — but the partial
    aggregate still collapses duplicates BEFORE the shuffle, so shuffle
    volume is one survivor per key. The window/row_number alternative
    shuffles and sorts EVERY row; at 100 TB that difference dominates
    the local sorts."""
    out_cols = [c for c in df.columns if c not in key_cols]
    if order_col is None:
        return df.dropDuplicates(key_cols).drop(*key_cols)
    agg = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*out_cols), F.col(order_col)).alias("__row")
    )
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in out_cols])


def exact_dedup(
    df: DataFrame, cols: Sequence[str], order_col: str | None = None
) -> DataFrame:
    """Keep one row per distinct content hash over ``cols``.

    ``xxhash64`` + ``md5`` double-hash: a 64-bit + 128-bit pair makes
    accidental collisions at 100 TB-row counts negligible while keeping
    the shuffle key compact and uniformly distributed (no skew by
    construction). ``order_col`` makes the surviving row deterministic
    (lowest value wins) at the same single-shuffle cost."""
    keyed = df.select(
        "*",
        F.xxhash64(*cols).alias("__h64"),
        F.md5(F.concat_ws("\x1f", *cols)).alias("__h128"),
    )
    return _keep_one_per_key(keyed, ["__h64", "__h128"], order_col)


def distinct_by_fingerprint(
    df: DataFrame, text_col: str = "text", order_col: str | None = None
) -> DataFrame:
    """Whitespace-insensitive exact dedup: one row per normalized-text
    md5 (lowercase, runs of whitespace collapsed)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return _keep_one_per_key(
        df.withColumn("__fp", F.md5(norm)), ["__fp"], order_col
    )


def dup_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected near-dup pair list —
    the cluster-resolution step between pair generation (MinHash /
    SimHash / embedding near-dup) and "keep one document per cluster".

    Output: one row per node that appears in any pair,
    ``(node, component)`` with ``component`` = the minimum node id
    reachable through the pair graph — the canonical deterministic
    cluster label (transitively closed: A~B, B~C puts A and C in one
    cluster even if the pair generator never compared them).

    Min-label propagation: every node starts labeled with itself; each
    round replaces a node's label with the minimum over itself and its
    neighbors' labels; the unique fixpoint is min-reachable-id. Rounds
    are driver-iterated DataFrame joins (labels and the symmetrized
    edge list are persisted and swapped per round, lineage cut by the
    materializing convergence count), so the shuffle volume per round
    is O(edges) and the round count is the cluster diameter — near-dup
    clusters are shallow in practice; pathological chains are cut off
    loudly at ``max_iterations``. The large-star/small-star
    optimization (halving diameter per round) drops in here if a
    deployment meets deep chains at 100 TB.
    """
    sym = pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
    edges = (
        sym.unionByName(
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    _register_cached(edges)
    # localCheckpoint, NOT persist: persist caches partitions but the
    # LOGICAL plan still nests one join deeper per round, and Catalyst
    # tree processing over N self-referencing rounds explodes
    # super-linearly (measured: an 11-round chain never finished
    # analysis). Checkpointing replaces each round's plan with a leaf,
    # so round cost stays flat; the blocks are reclaimed by the
    # ContextCleaner when the frame is dropped.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the change flag rides INSIDE the checkpointed frame (labels
        # only ever decrease, so "changed" = "decreased"): convergence
        # is then a scan of the already-materialized blocks instead of
        # a second join against the previous round
        lowered = F.least(F.col("label"), F.coalesce("nbr_label", "label"))
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                lowered.alias("label"),
                (lowered < F.col("label")).alias("__chg"),
            )
            .localCheckpoint()
        )
        changed = stepped.where("__chg").count()
        labels = stepped.drop("__chg")
        if changed == 0:
            break
    else:
        _release(edges)
        raise RuntimeError(
            f"dup_components did not converge in {max_iterations} rounds — "
            "a pathologically deep duplicate chain; raise max_iterations "
            "or switch to a star-contraction variant"
        )
    out = labels.select("node", F.col("label").alias("component"))
    # edges was registered with the scope at creation (so the failure
    # path above stays covered); only attach the attribute here to
    # avoid a duplicate scope entry
    out._cached_deps = [edges]  # type: ignore[attr-defined]
    return out


def dup_components_auto(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    driver_edge_threshold: int = 65_536,
) -> DataFrame:
    """:func:`dup_components` with a bounded driver fast path — the
    ``bpe_train`` ``driver_vocab_threshold`` pattern applied to
    closure: near-dup PAIR sets are tiny relative to the corpus (the
    generators cap buckets and verify exactly), and below
    ``driver_edge_threshold`` edges a min-label union-find on the
    driver beats N iterated join/checkpoint rounds of cluster
    round-trips by an order of magnitude. Above the threshold the
    distributed propagation runs unchanged. Same output contract
    and values as :func:`dup_components` (pinned by pytest on both
    routes); pass ``driver_edge_threshold=0`` to force distributed."""
    if driver_edge_threshold > 0:
        head = pairs.select(
            F.col(left).alias("a"), F.col(right).alias("b")
        ).limit(driver_edge_threshold + 1).collect()
        if len(head) <= driver_edge_threshold:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                a, b = row.a, row.b
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            comp_min: dict = {}
            for n in parent:
                r = find(n)
                if r not in comp_min or n < comp_min[r]:
                    comp_min[r] = n
            from etl_prometheus2clickhouse_spark.localframe import (
                local_df,
            )

            spark = pairs.sparkSession
            # Arrow-backed: the labels feed a partitioned write in the
            # index paths — an RDD-scan plan would pay a Python-worker
            # spin-up per downstream job
            return local_df(
                spark,
                [(n, comp_min[find(n)]) for n in sorted(parent)],
                pairs.select(
                    F.col(left).alias("node"),
                    F.col(right).alias("component"),
                ).schema,
            )
    return dup_components(pairs, left, right)


def dup_components_twostar(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — same contract as :func:`dup_components`
    (``(node, component)``, component = min reachable id), different
    convergence behavior: each large+small round roughly SQUARES the
    effective star contraction, so rounds grow O(log d) in the cluster
    diameter d where min-label propagation needs O(d) rounds. The
    drop-in for deployments whose duplicate chains run deep (e.g.
    boilerplate families chained through thousands of mutations).

    Per round, both stars are one symmetrize + one per-node min + one
    join re-emit — O(edges) shuffle, same as a propagation round; each
    intermediate edge set is ``localCheckpoint``-ed so the logical plan
    stays flat (same lineage lesson as ``dup_components``).

    large-star: every node connects its LARGER neighbors to its
    current minimum (min of itself and all neighbors); small-star
    orients each edge to its larger endpoint and connects that node
    plus its smaller neighbors to their collective minimum. At the
    fixpoint the edge set IS the star (child → component-min) mapping.
    """
    raw = pairs.select(F.col(left).alias("u"), F.col(right).alias("v"))
    base = (
        raw.where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # node set from the UNFILTERED pairs: a node appearing only in
    # self-loop pairs still belongs in the output (labeled with itself),
    # matching dup_components' contract exactly
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        out = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def _small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = oriented.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_edges = m.select("u", F.col("m").alias("v"))
        out = nbrs.unionByName(self_edges)
        return out.where(F.col("u") != F.col("v")).distinct()

    edges = base
    for _ in range(max_iterations):
        ls = _large_star(edges).localCheckpoint()
        ss = _small_star(ls).localCheckpoint()
        # converged only when E is a fixpoint of BOTH stars (the SoCC'14
        # theorem guarantees a simultaneous fixpoint is a union of
        # min-rooted stars; a small-star-only check is unsound — a
        # monotone chain {(3,2),(2,1)} is small-star-stable but not
        # contracted), i.e. edges == ls == ss. All three frames are
        # DISTINCT sets, so three-way set equality is ONE aggregate
        # job: tag each set with a bit, sum bits per (u, v) key, and
        # the sets are equal iff every key sums to 7. That replaces
        # the r6 check's four actions per round (two counts + two
        # exceptAll shuffles over 2×edges each) with a single shuffle
        # over 3×edges — measured 1.5-1.7× per-round on a 2048-node
        # planted chain (BENCH_NOTES.md round 7).
        n_diff = (
            edges.select("u", "v", F.lit(1).alias("__m"))
            .unionByName(ls.select("u", "v", F.lit(2).alias("__m")))
            .unionByName(ss.select("u", "v", F.lit(4).alias("__m")))
            .groupBy("u", "v")
            .agg(F.sum("__m").alias("__m"))
            .where(F.col("__m") != 7)
            .count()
        )
        edges = ss
        if n_diff == 0:
            break
    else:
        raise RuntimeError(
            f"dup_components_twostar did not converge in {max_iterations} "
            "rounds — raise max_iterations"
        )
    # fixpoint edges: (node → component root) for every non-root node;
    # roots (and any isolated node in the input) label themselves
    out = nodes.join(
        edges.select(F.col("u").alias("node"), F.col("v").alias("root")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("root", "node").alias("component")
    )
    return out


# ---------------------------------------------------------------------------
# shingling + Jaccard
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text (JVM-only:
    split → sequence → slice → concat)."""
    tokens = F.filter(F.split(F.lower(text), r"\W+"), lambda t: F.length(t) > 0)
    k = F.size(tokens) - (n - 1)
    return F.when(k <= 0, F.array_distinct(F.array(F.concat_ws(" ", tokens)))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            )
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two arrays (treated as sets)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_distinct(a: Column, b: Column) -> Column:
    """Exact Jaccard for arrays ALREADY deduplicated (as the shingle
    builders guarantee): union = |a| + |b| - |a∩b| from O(1) array
    lengths, skipping ``array_union``'s per-pair merge+dedup
    allocation — the hot verify path of the candidate rescorers.
    Identical values to :func:`jaccard` on distinct inputs (same
    integer division)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a).cast("double") + F.size(b).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 64-bit hashes of word n-gram shingles — the fast path
    for MinHash/SimHash: no shingle strings ever materialize.

    Implementation note (measured 17×): the obvious formulations —
    ``transform(sequence(1,k), i -> ...slice/concat or element_at...)``
    — are pathologically slow because Catalyst's project collapse
    inlines the token-split expression into the lambda body, re-running
    the regex split for every shingle position. Here the token array is
    shifted ``n`` times with top-level ``slice`` calls (each evaluated
    once per row) and the shifts are folded pairwise with ``zip_with``
    hashing, so per-position work is just a hash of two longs. The
    rolling ``xxhash64(…xxhash64(t_i), t_{i+1}…)`` chain is a
    deterministic tuple hash; collisions merely merge two shingles
    (negligible at 2^64)."""
    tokens = F.filter(F.split(F.lower(text), r"\W+"), lambda t: F.length(t) > 0)
    size = F.size(tokens)
    k = size - (n - 1)
    whole = F.array_distinct(F.array(F.xxhash64(F.concat_ws(" ", tokens))))
    cur = F.transform(tokens, lambda t: F.xxhash64(t))
    for j in range(1, n):
        shifted = F.slice(tokens, j + 1, F.greatest(size - j, F.lit(1)))
        cur = F.zip_with(cur, shifted, lambda h, t: F.xxhash64(h, t))
    return F.when(k <= 0, whole).otherwise(
        F.array_distinct(F.slice(cur, 1, F.greatest(k, F.lit(1))))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    df_stats: dict | None = None,
) -> DataFrame:
    """Blocked exact n-gram-Jaccard near-dup pairs.

    ``block_col`` is REQUIRED: it bounds the candidate space (pairs only
    form within a block). Without one, the self-join degenerates to an
    O(n²) all-pairs scan — the textbook 100 TB scale-killer — so that is
    refused rather than silently executed. At scale the block is an LSH
    bucket (see :func:`minhash_lsh_pairs`); the blocked-exact variant
    exists as an oracle-checkable deterministic operator.
    Output: (id_a, id_b, jaccard_sim), id_a < id_b.

    ``max_df`` caps the per-(block, shingle) document frequency in the
    inverted index — the stop-shingle / prefix filter from the exact
    set-similarity-join literature. A boilerplate shingle shared by a
    whole block otherwise fans out O(block²) for that one join key (on
    real web text boilerplate is the COMMON case, not the degenerate
    one); with the cap, every key fans out at most max_df²/2 candidate
    rows. Semantics under the cap are one-sided: capped shingles are
    removed from the INTERSECTION count only (per-doc set sizes — and
    therefore the union — stay exact), so ``jaccard_sim`` is a lower
    bound of the true similarity and the output is a SUBSET of the
    exact result. A pair is missed only if df-heavy shingles carry it
    over the threshold — the pairs near-dup pipelines route through
    :func:`minhash_lsh_pairs` anyway. Pass ``df_stats`` (a dict) to get
    ``capped_shingle_keys`` / ``max_df_seen`` filled in instead of
    capping silently; with ``max_df=None`` the result is exact.
    """
    if block_col is None:
        raise ValueError(
            "ngram_jaccard_pairs requires block_col: unblocked all-pairs "
            "Jaccard is O(n²) — use minhash_lsh_pairs for unblocked input"
        )
    if threshold <= 0:
        raise ValueError(
            "ngram_jaccard_pairs requires threshold > 0: the inverted-"
            "index join never enumerates zero-overlap pairs"
        )
    if max_df is not None and max_df < 2:
        raise ValueError(
            "ngram_jaccard_pairs max_df must be >= 2: a shingle needs "
            "df 2 to witness any pair at all"
        )
    # Inverted-index formulation (the classic exact set-similarity
    # join): explode each document's HASHED shingle set (array<long>
    # via shingle_hashes — set sizes equal the string-shingle sets' up
    # to 2^-64 collisions), equi-join on (block, shingle-hash) with
    # id_a < id_b, and count matches per pair — the intersection size.
    # Union is then |A|+|B|-|A∩B| from per-doc sizes carried through
    # the aggregation keys. Only pairs sharing at least one shingle are
    # ever materialized (sound for any threshold > 0), so the cost is
    # O(shingle collisions), not O(block²) pairwise intersects —
    # measured 30× on the 2059-doc en block at sf0.1 (73 s → 2.4 s)
    # and it is the shape that survives a 100× block: one shuffle on an
    # evenly-hashed (block, shingle) key plus a map-side-combining
    # count keyed by pair; ``max_df`` (above) bounds the one remaining
    # hot-key fan-out.
    df = spread(df)  # serial single-split scans otherwise (guide §2.5)
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("sh"),
        F.col(block_col).alias("blk"),
    ).withColumn("n_sh", F.size("sh").cast("double"))
    ex = (
        sh.select(
            "id", "blk", "n_sh", F.explode_outer("sh").alias("h")
        )
        .where(F.col("h").isNotNull())
    )
    deps: list[DataFrame] = []
    if max_df is not None:
        # document frequency per inverted-index key: one map-side-
        # combining count (same shape as the minhash bucket cap); the
        # filtered index is persisted because the self-join consumes
        # it twice and would otherwise recompute shingling + the df
        # join per branch
        dfreq = ex.groupBy("blk", "h").agg(
            F.count(F.lit(1)).alias("__df")
        )
        if df_stats is not None:
            # persisted so the eager stats aggregate and the index
            # join share one shingle pass instead of two
            dfreq = dfreq.persist()
            deps.append(dfreq)
            _register_cached(dfreq)
            row = dfreq.agg(
                F.coalesce(
                    F.sum(F.when(F.col("__df") > max_df, F.lit(1))),
                    F.lit(0),
                ).alias("capped"),
                F.coalesce(F.max("__df"), F.lit(0)).alias("max_df_seen"),
            ).first()
            df_stats["capped_shingle_keys"] = int(row["capped"])
            df_stats["max_df_seen"] = int(row["max_df_seen"])
        ex = (
            ex.join(
                dfreq.where(F.col("__df") <= max_df), ["blk", "h"]
            )
            .drop("__df")
            .persist()
        )
        deps.append(ex)
        _register_cached(ex)
    a, b = ex.alias("a"), ex.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    union = F.col("n_a") + F.col("n_b") - F.col("inter")
    out = (
        co.select(
            "id_a",
            "id_b",
            (F.col("inter") / union).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    if deps:
        # already scope-registered above; attach the attribute only
        out._cached_deps = deps  # type: ignore[attr-defined]
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_EMPTY_SENTINEL = 2**63 - 1


def _minhash_sig_udf(num_hashes: int, seed: int):
    """Vectorized signature kernel: ``num_hashes`` affine permutations
    ``h -> a_i*h + b_i (mod 2^64, a_i odd — a bijection)`` of the
    per-shingle base hashes, min'd per permutation with numpy."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(hs: pd.Series) -> pd.Series:
        # Per-document outer product, deliberately NOT batch-flattened:
        # at realistic shingle densities (hundreds per document) each
        # row's (num_hashes × n_shingles) multiply-add is already a
        # vector op big enough to amortize numpy dispatch, and it stays
        # cache-resident (64×250×8 ≈ 128 KB). The flatten-everything +
        # minimum.reduceat formulation was measured (round 6) at
        # 7-17 ms vs 6.6 ms per 156-doc batch standalone and 2.5×
        # slower end-to-end in the bench — the batch-wide intermediate
        # (tens of MB × 32 concurrent workers) turns a compute kernel
        # memory-bandwidth-bound. Batch-flattening only pays when
        # documents are tiny (few shingles), which shingled text never
        # is.
        empty = [_EMPTY_SENTINEL] * num_hashes
        out = []
        with np.errstate(over="ignore"):
            for h in hs:
                if h is None or len(h) == 0:
                    out.append(empty)
                    continue
                arr = np.asarray(h, dtype=np.int64).astype(np.uint64)
                perms = arr[None, :] * a[:, None] + b[:, None]  # mod 2^64
                out.append(perms.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def minhash_signature(sh: Column, num_hashes: int = 64, seed: int = 42) -> Column:
    """``num_hashes``-element MinHash signature of a shingle array.

    Base hash per shingle is ``xxhash64`` (JVM, once per shingle);
    permutations are affine maps of that hash, min'd inside ONE
    Arrow-vectorized pandas UDF. A pure-expression formulation
    (``transform(sequence(0,63), i -> array_min(transform(sh, ...)))``)
    is 70× slower in practice: Catalyst's project collapse inlines the
    *shingle-construction* expression into each of the 64 lambda bodies,
    recomputing tokenization 64× per row. The UDF node is an optimizer
    barrier, so shingles and base hashes are computed exactly once.
    Empty shingle sets get +inf sentinels, as before."""
    hs = F.transform(sh, lambda s: F.xxhash64(s))
    return _minhash_sig_udf(num_hashes, seed)(hs)


def band_buckets(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding of a MinHash signature: array of ``bands`` structs
    ``(band, bucket)`` where ``bucket`` is the 64-bit hash of that
    band's signature slice. Factored out so the one-shot pair join
    (:func:`minhash_lsh_pairs`) and the persisted band index
    (operators/dedup_index.py) band IDENTICALLY by construction —
    a new shard probing an old index must land in the same buckets
    the index was built with."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("bucket"),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    bucket_stats: dict | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    banding: ``bands`` bands × ``num_hashes/bands`` rows; two docs become
    candidates iff some band matches (P ≈ 1-(1-s^r)^b).

    Scale shape: shingles are 64-bit tuple hashes (no shingle strings
    ever materialize); the band explode and bucket self-join carry ONLY
    ``(id, band, bucket)`` — 24 bytes/row — never the shingle-hash
    arrays, which shuffle exactly once, in the verification join against
    the deduped candidate pairs (exact Jaccard over the hash sets).
    Buckets larger than ``max_bucket`` are
    dropped (at 100 TB a boilerplate bucket of 10⁶ docs would otherwise
    emit 10¹² pairs); pass ``bucket_stats`` (a dict) to have
    ``dropped_entries`` / ``max_bucket_size`` filled in instead of
    dropping silently — one cheap eager aggregate over the persisted
    (id, band, bucket) frame, which the candidate join then reuses from
    cache. (An ``observe`` can't deliver these: the self-join
    duplicates / cache-replaces the CollectMetrics node and the
    Observation never resolves.)
    Output: (id_a, id_b, jaccard_sim) with jaccard_sim ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    # Shingle-hash table: computed from one corpus scan and persisted —
    # three plan branches consume it (signature→bands, and both sides of
    # the verification join); without the persist each branch re-scans
    # and re-tokenizes the corpus.
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("sh"),
    ).persist()
    sig = sh.withColumn("sig", _minhash_sig_udf(num_hashes, 42)(F.col("sh")))

    banded = sig.select(
        "id",
        F.explode(band_buckets(F.col("sig"), bands, rows_per_band)).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # cap pathological buckets before the self-join; persist the slim
    # (id, band, bucket) frame so the self-join's two branches don't
    # recompute signatures. Bucket sizes come from a groupBy + join
    # back, NOT a window count: the window formulation shuffles AND
    # sorts every band row, while the size table is tiny (one row per
    # non-empty bucket) so AQE broadcasts it and the band rows never
    # shuffle for sizing at all.
    bucket_sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    sized_all = banded.join(bucket_sizes, ["band", "bucket"]).persist()
    if bucket_stats is not None:
        row = sized_all.agg(
            F.coalesce(
                F.sum(F.when(F.col("bucket_n") > max_bucket, F.lit(1))), F.lit(0)
            ).alias("dropped_entries"),
            F.coalesce(F.max("bucket_n"), F.lit(0)).alias("max_bucket_size"),
        ).first()
        bucket_stats["dropped_entries"] = int(row["dropped_entries"])
        bucket_stats["max_bucket_size"] = int(row["max_bucket_size"])
    sized = sized_all.where(F.col("bucket_n") <= max_bucket)

    a, b = sized.alias("a"), sized.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # same pair from multiple bands
    )
    # single shingle shuffle: verify candidates against the (id, sh) table
    verified = (
        candidates.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        ).join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
        )
    )
    out = verified.select(
        "id_a",
        "id_b",
        jaccard_distinct(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
    ).where(F.col("jaccard_sim") >= threshold)
    return _with_cached_deps(out, [sh, sized_all])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-shingle 64-bit hashes (Charikar): bit b of
    the signature is the sign of Σ_doc(±1 per shingle bit b).

    Kernel shape (measured, round 7, 156-doc × ~250-shingle batches):
    per document, ``np.unpackbits`` over the hashes' little-endian byte
    view yields the (n_shingles × 64) bit matrix in one C call, a
    column sum gives the bit counts, and the signature packs as a
    masked sum of the 64 powers of two — no per-bit Python loop. The
    r6 kernel (int64 shift-matrix + 64-iteration packing loop) measured
    14.8 ms/batch; this one 4.2 ms. A batch-flattened
    ``add.reduceat`` variant was measured and REJECTED at 7.7 ms —
    same verdict as the MinHash kernel: the batch-wide bit matrix
    turns a cache-resident per-doc kernel memory-bandwidth-bound."""
    import numpy as np

    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            continue
        # '<i8' pins the byte view little-endian: a no-copy view on LE
        # hosts, an explicit byteswap on BE — signatures stay identical
        # across mixed-endianness clusters (the r6 shift-matrix kernel
        # was endian-free; the byte view must not regress that)
        arr = np.ascontiguousarray(np.asarray(hs, dtype=np.int64), dtype="<i8")
        bits = np.unpackbits(
            arr.view(np.uint8), bitorder="little"
        ).reshape(len(arr), 64)
        counts = bits.sum(axis=0, dtype=np.int64)
        # bit b set iff strictly more ones than zeros (ties → 0), as
        # before: counts*2 > n  ⇔  counts*2 - n > 0
        sig = weights[counts * 2 > len(arr)].sum(dtype=np.uint64)
        out[i] = sig.view(np.int64)
    return pd.Series(out)


def simhash(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, simhash64) — tuple-hashed shingles JVM-side (no shingle
    strings materialized), bit-packing in a vectorized Pandas UDF."""
    df = spread(df)  # serial single-split scans otherwise (guide §2.5)
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("hs"),
    )
    return sh.select("id", _simhash_from_hashes(F.col("hs")).alias("simhash64"))


def _simhash_chunks(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) for ``max_hamming + 1`` pigeonhole chunks of the
    64-bit signature: if Hamming(a,b) ≤ H, at most H chunks differ, so
    with H+1 chunks at least one is identical — candidate recall is
    GUARANTEED for the requested radius, never probabilistic. Widths
    split 64 as evenly as possible."""
    n_chunks = max_hamming + 1
    if n_chunks > 64:
        raise ValueError("max_hamming must be < 64")
    base, rem = divmod(64, n_chunks)
    if base == 0:
        raise ValueError(f"max_hamming={max_hamming} leaves zero-width chunks")
    chunks, shift = [], 0
    for c in range(n_chunks):
        width = base + (1 if c < rem else 0)
        chunks.append((shift, width))
        shift += width
    return chunks


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Candidate generation by pigeonhole over ``max_hamming + 1`` chunks
    (:func:`_simhash_chunks`): distance ≤ H guarantees ≥ 1 identical
    chunk, so candidates come from equi-joins on chunk value — never an
    all-pairs scan, and recall within the radius is exact (a fixed
    4-chunk split would silently miss distance-4.. pairs). Wider radii
    mean narrower chunks (64/(H+1) bits), i.e. coarser buckets — at
    scale keep H small (real simhash near-dup is H ≤ 4) or cap buckets.
    """
    # slim persisted frame: the chunk self-join's two branches would
    # otherwise each re-scan the corpus and recompute signatures
    sig = simhash(df, id_col, text_col, n).persist()
    chunked = sig.select(
        "id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash64"), shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for c, (shift, width) in enumerate(_simhash_chunks(max_hamming))
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash64", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))

    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash64").alias("s_a"),
            F.col("b.simhash64").alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
    return _with_cached_deps(out, [sig])


def simhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """SimHash-bucketed near-dup pairs verified with exact Jaccard.

    Same candidate generation as :func:`simhash_near_pairs` (pigeonhole
    chunks — guaranteed recall within the Hamming radius), but each
    candidate is rescored with exact n-gram Jaccard over the shingle
    hash sets and only pairs ≥ ``threshold`` are emitted. The output is
    therefore a *deterministic exact-similarity* result (a subset of
    the exact all-pairs Jaccard set, equal to it whenever the Hamming
    radius covers every true pair) — oracle-checkable against plain
    SQL, unlike the raw Hamming distances. Output:
    (id_a, id_b, jaccard_sim)."""
    df = spread(df)  # serial single-split scans otherwise (guide §2.5)
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), n).alias("sh"),
    ).persist()
    sig = sh.select("id", _simhash_from_hashes(F.col("sh")).alias("simhash64"))
    chunked = sig.select(
        "id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash64"), shift)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for c, (shift, width) in enumerate(_simhash_chunks(max_hamming))
                ]
            )
        ).alias("cv"),
    ).select(
        "id", "simhash64", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val")
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    # the Hamming cut runs ON the chunk join (a bit_count over two longs
    # already in hand) BEFORE the dedup and the shingle join: wide radii
    # mean narrow chunks and big candidate sets, and carrying millions
    # of false candidates into an array-intersect verify is exactly the
    # cost this filter deletes (21s → ~1s at sf0.1)
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(
            F.bit_count(
                F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))
            )
            <= max_hamming
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    out = verified.select(
        "id_a",
        "id_b",
        jaccard_distinct(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
    ).where(F.col("jaccard_sim") >= threshold)
    return _with_cached_deps(out, [sh])


def resolve_near_duplicates(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "propagation",
) -> DataFrame:
    """The dedup DECISION step — the missing last stage between
    near-dup pair generation (ANY of this module's generators:
    MinHash/SimHash/n-gram Jaccard, or the embedding near-dup) and a
    training corpus: resolve the pair set to connected components
    (:func:`dup_components`, or the two-star contraction with
    ``algorithm="twostar"``) and annotate EVERY corpus row with its
    ``component_id`` (its own id when untouched by any pair) and
    ``is_canonical`` (true iff the row is its cluster's minimum-id
    representative — exactly one per cluster, all singletons kept).
    Filtering ``is_canonical`` yields the deduplicated corpus;
    keeping the annotation instead of silently dropping rows is
    deliberate — real pipelines audit what was removed and why.

    Scale shape: the component frame is slim (one (node, component)
    row per clustered doc — typically a small fraction of the
    corpus), but NOT assumed broadcastable: the merge is an equi-join
    on the id, which co-partitions with a corpus already bucketed by
    id at 100 TB. No other shuffle beyond the component resolution
    itself."""
    comp = (
        dup_components_twostar(pairs)
        if algorithm == "twostar"
        else dup_components(pairs)
    ).withColumnRenamed("node", id_col)
    out = corpus.join(comp, id_col, "left")
    return (
        out.withColumn(
            "component_id", F.coalesce(F.col("component"), F.col(id_col))
        )
        .drop("component")
        .withColumn(
            "is_canonical", F.col(id_col) == F.col("component_id")
        )
    )


def _ws_tokens(c: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — the text-module
    convention (operators/text.py:_words), NOT this module's ``\\W+``
    shingle split: exact-substring dedup reconstructs cleaned text
    from surviving token positions, so tokenization must be invertible
    up to whitespace normalization (``\\W+`` destroys punctuation)."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)


def _positional_shingle_hashes(toks: Column, n: int) -> Column:
    """Rolling 64-bit hash of every n-token window, IN POSITION ORDER
    (one array slot per window start; no dedup) — the positional
    sibling of :func:`shingle_hashes`, same shifted-``zip_with``
    construction so the tokenizer output is consumed once per row, not
    once per window. Empty array when fewer than ``n`` tokens. A
    chain collision merges two distinct windows (probability ~2⁻⁶⁴ per
    pair) — see :func:`exact_substring_spans` for what that means."""
    size = F.size(toks)
    k = size - (n - 1)
    cur = F.transform(toks, lambda t: F.xxhash64(t))
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(1)))
        cur = F.zip_with(cur, shifted, lambda h, t: F.xxhash64(h, t))
    return F.when(k >= 1, F.slice(cur, 1, F.greatest(k, F.lit(1)))).otherwise(
        F.array().cast("array<bigint>")
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
) -> DataFrame:
    """Exact substring duplication: every maximal token span covered
    by ``min_len``-token windows that occur MORE THAN ONCE in the
    corpus (across documents or repeated within one — both are
    duplication), as one row per merged span:
    ``(id, span_start, span_end, span_len)`` with token positions
    0-based and ``span_end`` exclusive.

    This is the span-finding half of exact substring deduplication
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — suffix-array ExactSubstr at 50-token
    granularity). The reference algorithm builds a corpus-wide suffix
    array; a monolithic suffix array is exactly what a 1000-executor
    cluster cannot share, so the Spark-first re-expression is the
    fixed-width rolling-window equivalent: any duplicated substring of
    ≥ ``min_len`` tokens contains a duplicated ``min_len``-token
    window, so the union of duplicated windows covers the same maximal
    spans the suffix array finds (boundaries differ by < min_len at
    span edges — the published trade-off of windowed vs suffix
    methods).

    Scale shape, stage by stage:

    1. window hashes per doc — JVM-only rolling hash, no Python, no
       shuffle; ``posexplode`` emits slim ``(id, pos, hash)`` rows
       (24 bytes, never the window text).
    2. duplicated-hash set — ONE hash-keyed groupBy with map-side
       combine on a uniform 64-bit key (no skew by construction);
       ``count ≥ 2`` keeps only duplicated windows.
    3. hits — equi-join positions × duplicated hashes on the hash
       (co-partitioned with stage 2's output; at 100 TB this is the
       canonical shuffle-join and the hash set is NOT assumed
       broadcastable — boilerplate-heavy corpora make it large).
    4. span merge — gaps-and-islands per document (running
       ``max(pos+L)`` window, island = cumsum of gap starts), a
       per-doc-partitioned window over ONLY the duplicated positions
       (a small fraction of the corpus), never the full token stream.

    Window-hash collisions (~2⁻⁶⁴/pair) would mark a non-duplicated
    span — at the catalog's data scale the expected count is < 10⁻¹⁰
    and the DuckDB oracle (which groups by the window STRING) would
    catch one as a hash mismatch; corpora where that risk matters
    re-verify flagged spans with one extra join on the span text."""
    base = spread(df).select(
        F.col(id_col).alias("id"), _ws_tokens(F.col(text_col)).alias("toks")
    )
    pos = base.select(
        "id",
        F.posexplode(_positional_shingle_hashes(F.col("toks"), min_len)).alias(
            "pos", "h"
        ),
    )
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("h")
    )
    hits = pos.join(dup, "h").select("id", "pos")
    return merge_hit_spans(hits, min_len, id_col)


def merge_hit_spans(
    hits: DataFrame, min_len: int, id_col: str = "doc_id"
) -> DataFrame:
    """Gaps-and-islands merge of duplicated-window start positions
    into maximal spans — the final stage of
    :func:`exact_substring_spans`, factored out so the incremental
    face (operators/dedup_index.py ``substring_increment``) merges its
    probe hits through the identical window plan. ``hits`` carries
    ``(id, pos)``; output one row per merged span."""
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + min_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "island",
        F.sum(
            (prev_end.isNull() | (F.col("pos") > prev_end)).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + min_len).cast("long").alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
) -> DataFrame:
    """Document-level exact substring deduplication: cut every
    duplicated span (:func:`exact_substring_spans`) out of every
    document, Lee et al.'s ExactSubstr removal policy (drop the
    duplicated bytes, keep the unique remainder — their measured-best
    variant vs dropping whole documents). Emits one row per input
    document: ``(id, n_tokens, dup_tokens, dup_frac, clean_text)``
    with ``clean_text`` the surviving tokens space-joined (documents
    with no duplicated span pass through with ``dup_tokens = 0``;
    fully-duplicated documents emit an empty string — the caller
    filters, the operator doesn't silently drop).

    The span join back to the corpus is a slim equi-join on the id
    (spans exist only for documents with duplication); the cut itself
    is a JVM ``filter`` lambda over token positions — O(tokens ×
    spans-per-doc) per document, spans-per-doc bounded by
    tokens/min_len. Whitespace inside the document is normalized to
    single spaces by reconstruction; that is the documented contract
    (token-level dedup), not a loss bug."""
    spans = exact_substring_spans(df, id_col, text_col, min_len)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col), _ws_tokens(F.col(text_col)).alias("toks")
    )
    joined = base.join(per_doc, id_col, "left").select(
        id_col,
        "toks",
        F.coalesce(
            "spans",
            F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
        ).alias("spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
    )
    n_tokens = F.size("toks").cast("long")
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        id_col,
        n_tokens.alias("n_tokens"),
        "dup_tokens",
        F.when(
            n_tokens > 0,
            F.round(F.col("dup_tokens") / n_tokens, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet stage)
# ---------------------------------------------------------------------------

def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level paragraph deduplication — the CCNet pre-LM stage
    (Wenzek et al., LREC'20 §3: paragraphs are deduplicated across
    the whole crawl before language-ID and perplexity filtering).

    Every document is split on ``sep``; across the WHOLE corpus each
    distinct (trimmed, non-empty) paragraph survives exactly once, in
    its first occurrence ordered by ``(id, position)``; later
    occurrences are dropped and each document is reassembled from its
    surviving paragraphs in original order. Emits one row per input
    document ``(id, n_paras, n_kept, text)``; a document whose every
    paragraph was seen earlier comes back with ``n_kept = 0`` and
    empty text (CCNet drops those downstream — keeping the row lets
    the caller decide).

    100 TB shape: paragraph TEXT shuffles exactly once. The winner
    election runs on a slim ``(id, pos, xxhash64(para))`` projection —
    24-byte rows, uniformly keyed by construction — as a
    ``min(struct(id, pos))`` hash-aggregate per hash (map-side partial
    collapses same-partition duplicates before the exchange), then
    collapses to one ``(id, kept_positions[])`` row per surviving
    document. Only that slim frame joins back to the original
    documents on ``id``, and reassembly is a pure expression over the
    re-split array (``filter`` with the position lambda), so there is
    no exploded-text re-aggregation shuffle at all. Collision note: a
    64-bit collision would wrongly drop a distinct paragraph; the
    catalog oracle groups by the paragraph STRING itself, so value
    equality doubles as the no-collision witness (same pattern as
    exact_substring_dedup)."""
    # NB: lambda, not bare F.trim — Spark 4's trim() grew an optional
    # second parameter, and transform() would feed it the element
    # INDEX as the trim-character set
    arr = F.transform(
        F.split(F.col(text_col), F.lit(sep)), lambda p: F.trim(p)
    )
    slim = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(arr).alias("__pos", "__para"),
        )
        .filter(F.length("__para") > 0)
        .select("__id", "__pos", F.xxhash64("__para").alias("__h"))
    )
    winners = slim.groupBy("__h").agg(
        F.min(F.struct("__id", "__pos")).alias("__win")
    )
    kept_pos = (
        winners.select(
            F.col("__win.__id").alias("__id"),
            F.col("__win.__pos").alias("__pos"),
        )
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list("__pos")).alias("__kept_pos"))
    )
    out = df.join(
        kept_pos, df[id_col] == kept_pos["__id"], "left"
    ).drop("__id")
    pos_set = F.coalesce("__kept_pos", F.array().cast("array<int>"))
    kept_paras = F.filter(
        arr, lambda p, i: F.array_contains(pos_set, i)
    )
    return out.select(
        id_col,
        F.size(F.filter(arr, lambda p: F.length(p) > 0))
        .cast("long")
        .alias("n_paras"),
        F.size(pos_set).cast("long").alias("n_kept"),
        F.array_join(kept_paras, sep).alias("text"),
    )
