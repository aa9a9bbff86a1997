"""Deterministic distinct-count sketching (engine extension).

K-minimum-values (KMV / bottom-k) cardinality estimation: hash every
value uniformly into [0, 2^32), keep the k smallest DISTINCT hashes per
group, and estimate ``|distinct| ~= (k-1) * 2^32 / h_(k)`` from the
k-th smallest hash (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002 — the classic bottom-k estimator HLL
descends from).

Unlike ``approx_count_distinct`` (HLL++, whose register merges are
implementation-specific), KMV over a fixed public hash (md5 prefix) is
a pure function of the input SET — the same estimate on any engine, in
any execution order. That makes it the rare *approximate* operator
whose result is exactly reproducible by an ANSI-SQL oracle.

Scale shape: one distinct aggregation on (group, hash) with map-side
combine — identical to the dedup scan shape — then a per-group bottom-k
via ``row_number() <= k``, which Spark >= 3.5 executes with
WindowGroupLimit (the k-limit is pushed below the shuffle, so each map
task emits at most k rows per group, never the full distinct set), then
a k-row-per-group final aggregate. Bounded memory at any cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^32 and (k-1) * 2^32 are exactly representable doubles, so the
# estimate is a single IEEE division — bit-identical cross-engine.
_HASH_SPACE = float(2**32)


HASH_FAMILIES = ("md5", "xxhash64")


def uniform_hash32(col, family: str = "md5") -> "F.Column":
    """Deterministic uniform hash into [0, 2^32), **for integer and
    string columns only** (doubles and timestamps render to strings
    differently per engine, silently diverging the hash inputs;
    callers with such types must cast with explicit, engine-agreed
    semantics first — :func:`kmv_distinct` enforces this).

    Two families:

    - ``"md5"`` (default): the first 8 hex digits of md5 of the
      value's canonical string form. Public and engine-independent
      (DuckDB: ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::
      UBIGINT``) — the family every oracle-verified catalog entry
      uses, because the sketch result is then a pure function of the
      input set reproducible on any engine.
    - ``"xxhash64"``: ``pmod(xxhash64(string), 2^32)`` — one JVM
      codegen intrinsic instead of a cryptographic digest + hex
      parse, roughly an order of magnitude cheaper per row; the
      production family for cluster runs where no cross-engine oracle
      is being computed. NOT cross-engine reproducible, and sketch
      ESTIMATES DIFFER between families (each family samples a
      different hash order) — both are equally valid estimates of the
      same underlying quantity, but artifacts built with different
      families must never be merged or probed together, which the
      sketch operators enforce via carried ``hash_family`` metadata.
    """
    if family == "md5":
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
        ).cast("bigint")
    if family == "xxhash64":
        return F.pmod(F.xxhash64(col.cast("string")), F.lit(2**32)).cast(
            "bigint"
        )
    raise ValueError(
        f"unknown hash family {family!r}; expected one of {HASH_FAMILIES}"
    )


# types whose CAST(v AS STRING) is identical across Spark and DuckDB —
# the only ones uniform_hash32 may see (see its docstring). date
# ('YYYY-MM-DD') and boolean ('true'/'false') render identically in
# both engines; doubles/timestamps/decimals do not.
_HASHABLE_TYPES = ("byte", "short", "int", "bigint", "string", "date", "boolean")


def _check_reserved(cols: list[str], reserved: tuple[str, ...], op: str) -> None:
    """Input columns may not collide with an operator's internal
    names — a silent overwrite corrupts results (same contract the
    samplers enforce)."""
    clash = sorted(set(cols) & set(reserved))
    if clash:
        raise ValueError(
            f"{op} reserves column name(s) {clash}; rename them on the "
            "input frame first"
        )


def _validate_kmv_args(df: DataFrame, value_col: str, k: int) -> None:
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    vtype = df.schema[value_col].dataType.simpleString()
    if vtype not in _HASHABLE_TYPES:
        raise ValueError(
            f"kmv value column {value_col!r} has type {vtype}; "
            "uniform_hash32 is engine-stable only for integer/string "
            "types — cast explicitly (e.g. to bigint or string) first"
        )


def _distinct_hashes(
    df: DataFrame, group_cols: list[str], value_col: str,
    family: str = "md5",
) -> DataFrame:
    """(group..., h): distinct per-group hashes of non-NULL values.

    NULL values are excluded, matching SQL COUNT(DISTINCT) — and a
    NULL hash would also rank engine-dependently (Spark ASC puts nulls
    first, DuckDB last), a silent cross-engine divergence."""
    h = uniform_hash32(F.col(value_col), family)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )


def _bottom_k(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Keep the k smallest ``h`` per group — WindowGroupLimit pushes
    the limit below the shuffle, so map tasks emit ≤ k rows/group."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _kmv_estimate(
    bottom_k: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    agg = bottom_k.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(F.col("n_k") < k, F.col("n_k").cast("double")).otherwise(
        F.lit((k - 1) * _HASH_SPACE) / F.col("kth_hash")
    )
    return agg.withColumn("est_distinct", est)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-group KMV distinct-count estimate (one-shot).

    Returns one row per group: ``n_k`` (hashes retained, == k unless
    the group has fewer distinct hashes), ``kth_hash`` (the largest
    retained hash), and ``est_distinct`` — the bottom-k estimate, or
    the exact distinct-hash count when the group is smaller than k
    (where the sketch IS the exact answer).
    """
    _validate_kmv_args(df, value_col, k)
    _check_reserved(group_cols, ("h", "rn"), "kmv_distinct")
    distinct_h = _distinct_hashes(df, group_cols, value_col, hash_family)
    return _kmv_estimate(_bottom_k(distinct_h, group_cols, k), group_cols, k)


def kmv_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    batch_col: str,
    k: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Serialized KMV partial per (group, batch): the bottom-k distinct
    hashes as a sorted ``array<long>`` — the mergeable artifact that
    makes sketches pay at 100 TB. Each ingestion window (``batch_col``:
    a date, a file id, a micro-batch id) sketches its own slice down to
    ≤ k longs per group; corpus-level cardinality then comes from
    :func:`kmv_merge` over O(batches × k) rows instead of a re-scan of
    every batch — the incremental-window lifecycle the engine's
    Prometheus ETL already runs (plans/lifecycle.py).

    Scale shape per batch: identical to :func:`kmv_distinct` (distinct
    agg with map-side combine, WindowGroupLimit bottom-k), with
    ``batch_col`` joined into the grouping key.
    """
    _validate_kmv_args(df, value_col, k)
    keys = [*group_cols, batch_col]
    _check_reserved(
        keys, ("h", "rn", "sketch", "k", "hash_family"),
        "kmv_partial_sketches",
    )
    distinct_h = _distinct_hashes(df, keys, value_col, hash_family)
    return (
        _bottom_k(distinct_h, keys, k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        # the k the partial was truncated to rides WITH the artifact:
        # a merge at a larger k cannot reconstruct the global bottom-k
        # from tighter partials, and kmv_merge validates against this
        # column so the mismatch fails loud instead of silently
        # underestimating
        .withColumn("k", F.lit(int(k)))
        # the family rides too: bottom-k sets from different hash
        # orders are incomparable, so kmv_merge validates it
        .withColumn("hash_family", F.lit(str(hash_family)))
    )


def kmv_merge(
    partials: DataFrame,
    group_cols: list[str],
    k: int = 64,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge per-batch KMV partials into the per-group estimate.

    Exact by construction — not an approximation of the one-shot
    sketch: every one of a group's k globally-smallest distinct hashes
    is necessarily within the bottom-k of whichever batch contains it,
    so ``bottom_k(∪ batches' bottom-k) == bottom_k(∪ batches)`` and
    the merged ``(n_k, kth_hash, est_distinct)`` equals
    :func:`kmv_distinct` on the union of the batches (pinned by the
    ``kmv_merge`` catalog entry, whose oracle is the ONE-SHOT SQL).

    Cost: explode + distinct + bottom-k over O(batches × k) rows per
    group — independent of the corpus size the partials summarize.
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    _check_reserved(group_cols, ("h", "rn"), "kmv_merge")
    sk = F.col(sketch_col)
    if "k" in partials.columns:
        # exactness precondition: every partial must have been
        # truncated at >= the merge k, or the global bottom-k is not
        # reconstructible — fail at the offending row, not silently
        sk = F.when(
            F.col("k") < k,
            F.raise_error(
                F.concat(
                    F.lit("kmv_merge: partial sketch built with k="),
                    F.col("k").cast("string"),
                    F.lit(f" cannot be merged at k={int(k)}"),
                )
            ).cast(partials.schema[sketch_col].dataType),
        ).otherwise(sk)
    if "hash_family" in partials.columns:
        # bottom-k sets sampled under different hash orders are
        # incomparable — merging them yields a nonsense estimate, so a
        # mixed-family (or family-less) union fails loud. Same slim
        # agg + broadcast-cross pattern as bloom_merge/cms_merge.
        fam = partials.agg(
            F.count(F.lit(1)).alias("__np"),
            F.count("hash_family").alias("__nf"),
            F.min("hash_family").alias("__f1"),
            F.max("hash_family").alias("__f2"),
        )
        partials = partials.crossJoin(F.broadcast(fam))
        sk = F.when(
            (F.col("__nf") != F.col("__np"))
            | (F.col("__f1") != F.col("__f2")),
            F.raise_error(
                F.concat(
                    F.lit(
                        "kmv_merge: partials mix (or are missing) hash "
                        "families ("
                    ),
                    F.coalesce(F.col("__f1"), F.lit("NULL")),
                    F.lit(" vs "),
                    F.coalesce(F.col("__f2"), F.lit("NULL")),
                    F.lit(")"),
                )
            ).cast(partials.schema[sketch_col].dataType),
        ).otherwise(sk)
    ex = (
        partials.select(*group_cols, F.explode(sk).alias("h"))
        .distinct()
    )
    return _kmv_estimate(_bottom_k(ex, group_cols, k), group_cols, k)


def histogram_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bucket_width: float,
    batch_col: str,
) -> DataFrame:
    """Serialized quantile-sketch partial per (group, batch): a
    fixed-width histogram ``(group…, batch, bucket, cnt)`` — the
    mergeable companion to :func:`quantile_threshold_filter`'s
    histogram method, for corpus quantiles that accumulate across
    ingestion windows. State per batch is O(value range/bucket_width),
    independent of row count; the merge (:func:`histogram_merge_quantile`)
    is a count sum — EXACT by construction, unlike GK/t-digest merges
    whose results are merge-order dependent. Rank error of the final
    quantile is bounded by one bucket width, same deterministic
    contract as the one-shot filter."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    _check_reserved(
        [*group_cols, batch_col], ("bucket", "cnt"),
        "histogram_partial_sketches",
    )
    v = F.col(value_col)
    return (
        df.where(v.isNotNull())
        .groupBy(
            *group_cols,
            batch_col,
            F.floor(v / bucket_width).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge_quantile(
    partials: DataFrame,
    group_cols: list[str],
    phi: float,
    bucket_width: float,
) -> DataFrame:
    """Merge histogram partials and locate the per-group φ-quantile.

    Returns one row per group: ``n_total``, ``q_bucket`` (the smallest
    bucket whose cumulative count reaches ``ceil(phi × n_total)``) and
    ``q_lo = q_bucket × bucket_width`` — the bucket edge at or under
    the true quantile, over-approximating by at most one bucket width
    (identical semantics to :func:`quantile_threshold_filter`'s
    threshold, so the two faces agree). Because the merge is a plain
    count sum, the result EQUALS the one-shot histogram over the
    union of the batches — the catalog entry's oracle is therefore
    the one-shot SQL over raw data.

    Scale shape: one map-side-combining sum keyed on (group, bucket)
    over O(batches × buckets) partial rows, then windows over the
    merged HISTOGRAM only (sketch-sized state, never data)."""
    if not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    _check_reserved(
        group_cols,
        ("bucket", "cnt", "n_total", "q_bucket", "q_lo", "__cum"),
        "histogram_merge_quantile",
    )
    merged = partials.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = merged.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_tot).alias("n_total"),
    )
    return (
        cum.where(F.col("__cum") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .groupBy(*group_cols)
        .agg(
            F.min("n_total").alias("n_total"),
            F.min("bucket").alias("q_bucket"),
        )
        .withColumn(
            "q_lo", F.col("q_bucket") * F.lit(float(bucket_width))
        )
    )


def _bloom_position(col, r: int, m_bits: int, family: str = "md5"):
    """Position of hash r for a value: same salted hash family as the
    CMS rows (``"{r}:" + value``), mod the bit-space."""
    return (
        uniform_hash32(F.concat(F.lit(f"{r}:"), col.cast("string")), family)
        % m_bits
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 16384,
    k_hashes: int = 4,
    batch_col: str | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Deterministic Bloom-membership sketch: the distinct set of bit
    positions lit by the values' ``k_hashes`` salted md5 hashes,
    serialized as a sorted ``array<long>`` — one row (or one row per
    ``batch_col`` ingestion batch). The fourth member of the engine's
    mergeable-sketch family (KMV = cardinality, CMS = frequency,
    histogram = quantiles, Bloom = membership): ship the position set
    instead of the member values — at most ``k_hashes × |set|`` longs,
    bounded by ``m_bits`` — and probe any corpus against it with
    :func:`bloom_probe`. Classic one-sided guarantee: a true member
    always hits; a non-member hits with probability ~(k·n/m)^k —
    deterministic either way over the public hash, so the oracle
    reproduces every hit and false positive exactly.

    Scale shape: explode to k positions per value, one distinct
    (shuffle keyed on ≤ m_bits values), one bounded collect per
    batch. Merge across batches = position-set union
    (:func:`bloom_merge`), exact by construction."""
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("need m_bits >= 2 and k_hashes >= 1")
    _validate_kmv_args(df, value_col, k=2)  # same hashable-type contract
    keys = [batch_col] if batch_col is not None else []
    _check_reserved(
        keys, ("p", "bloom", "m_bits", "k_hashes", "hash_family"),
        "bloom_build",
    )
    v = F.col(value_col)
    pos = F.explode(
        F.array(
            *[
                _bloom_position(v, r, m_bits, hash_family)
                for r in range(k_hashes)
            ]
        )
    ).alias("p")
    positions = (
        df.where(v.isNotNull()).select(*keys, pos).distinct()
    )
    return (
        positions.groupBy(*keys)
        .agg(F.sort_array(F.collect_list("p")).alias("bloom"))
        .withColumn("m_bits", F.lit(int(m_bits)))
        .withColumn("k_hashes", F.lit(int(k_hashes)))
        .withColumn("hash_family", F.lit(str(hash_family)))
    )


def bloom_merge(partials: DataFrame) -> DataFrame:
    """Union per-batch Bloom position sets into one sketch row —
    exact: the union of lit positions IS the position set of the
    unioned inputs. Parameter rows must agree on (m_bits, k_hashes);
    mixed parameters make positions incomparable, so that fails loud.
    An EMPTY partials frame also fails loud: a global agg over zero
    rows would emit ``bloom=[]`` with NULL parameters — a sketch whose
    geometry can no longer be validated downstream (bloom_probe's
    parameter check would silently pass on NULLs). An intentionally
    empty benchmark set should be built with :func:`bloom_build`
    (no ``batch_col``), which pins the parameters on its one row."""
    merged = (
        partials.select(F.explode("bloom").alias("p"))
        .distinct()
    )
    # parameters and the empty-input check come from the RAW partial
    # rows (a partial whose position array is empty still carries its
    # geometry and must participate in agreement validation); the
    # exploded side only collects positions. Both aggs are one slim
    # row, crossed broadcast — still a single plan.
    params = partials.agg(
        F.count(F.lit(1)).alias("__n_partials"),
        # count() skips NULLs — a NULL geometry hides from min/max, so
        # require every partial row to carry all three parameters
        F.count("m_bits").alias("__nm"),
        F.count("k_hashes").alias("__nk"),
        F.count("hash_family").alias("__nf"),
        F.min("m_bits").alias("m_bits"),
        F.max("m_bits").alias("__m2"),
        F.min("k_hashes").alias("k_hashes"),
        F.max("k_hashes").alias("__k2"),
        F.min("hash_family").alias("hash_family"),
        F.max("hash_family").alias("__f2"),
    )
    out = (
        merged.agg(
            F.sort_array(F.collect_set("p")).alias("bloom"),
        )
        .crossJoin(F.broadcast(params))
        .select(
            F.when(
                F.col("__n_partials") == 0,
                F.raise_error(
                    F.lit(
                        "bloom_merge: no partial sketches to merge — an "
                        "empty benchmark set must be built via bloom_build "
                        "without batch_col so its parameters stay pinned"
                    )
                ).cast("array<bigint>"),
            )
            .when(
                (F.col("__nm") != F.col("__n_partials"))
                | (F.col("__nk") != F.col("__n_partials"))
                | (F.col("__nf") != F.col("__n_partials"))
                | (F.col("m_bits") != F.col("__m2"))
                | (F.col("k_hashes") != F.col("__k2"))
                | (F.col("hash_family") != F.col("__f2")),
                F.raise_error(
                    F.lit(
                        "bloom_merge: partials disagree on (or are missing) "
                        "(m_bits, k_hashes, hash_family)"
                    )
                ).cast("array<bigint>"),
            )
            .otherwise(F.col("bloom"))
            .alias("bloom"),
            "m_bits",
            "k_hashes",
            "hash_family",
        )
    )
    return out


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 16384,
    k_hashes: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Probe every row's value against a (broadcast) Bloom sketch row:
    adds ``bloom_hit`` — TRUE iff all ``k_hashes`` positions are lit.
    True members always hit (no false negatives); deterministic false
    positives at ~(k·n/m)^k. The probe is a single-row broadcast
    nested-loop join plus JVM ``array_contains`` — no shuffle of the
    probed corpus, the right shape for 'filter 100 TB against a
    benchmark set'. NULL values never hit.

    The sketch frame is validated inside the plan: its carried
    ``(m_bits, k_hashes)`` must equal the probe parameters (positions
    computed at a different geometry would silently break the
    no-false-negative guarantee — contaminated docs would pass), a
    multi-row frame (unmerged per-batch partials) fails loud, and a
    zero-row frame probes as all-miss (the empty set has no members)."""
    if "bloom_hit" in df.columns or "bloom" in df.columns:
        raise ValueError(
            "bloom_probe reserves column names ['bloom', 'bloom_hit']; "
            "rename them on the input frame first"
        )
    # collapse the sketch to exactly one validated row: >1 rows means
    # the caller passed unmerged partials (first() would pick one
    # nondeterministically); 0 rows collapses to an empty position set
    # (all-miss); carried geometry disagreeing with the probe
    # parameters breaks the guarantee, so it raises at the row
    sk = bloom.agg(
        F.count(F.lit(1)).alias("__n"),
        F.first("bloom").alias("bloom"),
        F.min("m_bits").alias("__m"),
        F.min("k_hashes").alias("__k"),
        F.min("hash_family").alias("__f"),
    ).select(
        F.when(
            F.col("__n") > 1,
            F.raise_error(
                F.lit(
                    "bloom_probe: sketch frame has multiple rows — merge "
                    "per-batch partials with bloom_merge first"
                )
            ).cast("array<bigint>"),
        )
        .when(
            (F.col("__n") == 1)
            & (
                F.col("__m").isNull()
                | F.col("__k").isNull()
                | F.col("__f").isNull()
                | (F.col("__m") != F.lit(int(m_bits)))
                | (F.col("__k") != F.lit(int(k_hashes)))
                | (F.col("__f") != F.lit(str(hash_family)))
            ),
            F.raise_error(
                F.concat(
                    F.lit(
                        "bloom_probe: sketch built at "
                        "(m_bits, k_hashes, hash_family)=("
                    ),
                    F.coalesce(F.col("__m").cast("string"), F.lit("NULL")),
                    F.lit(", "),
                    F.coalesce(F.col("__k").cast("string"), F.lit("NULL")),
                    F.lit(", "),
                    F.coalesce(F.col("__f"), F.lit("NULL")),
                    F.lit(
                        f") but probed at ({int(m_bits)}, {int(k_hashes)}, "
                        f"{hash_family}) — mismatched geometry voids the "
                        "no-false-negative guarantee"
                    ),
                )
            ).cast("array<bigint>"),
        )
        .otherwise(
            F.coalesce(F.col("bloom"), F.array().cast("array<bigint>"))
        )
        .alias("bloom")
    )
    v = F.col(value_col)
    hit = F.lit(True)
    for r in range(k_hashes):
        hit = hit & F.array_contains(
            F.col("bloom"), _bloom_position(v, r, m_bits, hash_family)
        )
    joined = df.crossJoin(F.broadcast(sk))
    return joined.withColumn(
        "bloom_hit", F.when(v.isNotNull(), hit).otherwise(F.lit(False))
    ).drop("bloom")


def cms_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    phi: float,
    depth: int = 3,
    width: int = 1024,
    hash_family: str = "md5",
) -> DataFrame:
    """Approximate heavy hitters over an UNBOUNDED item domain via a
    count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
    the companion to the exact ``top_k_words`` face, for key domains
    too large to count exactly.

    Input is an occurrence frame (one row per item occurrence, e.g.
    exploded words); output is one row per (group, item) whose CMS
    estimate reaches ``ceil(phi × group_total)``:
    ``(group…, item, n_occurrences, est_count)`` with the classic
    one-sided guarantee ``est_count ≥ n_occurrences`` (hash collisions
    only ever ADD), so every TRUE φ-heavy hitter is present —
    false negatives are impossible; collisions can only admit extra
    near-heavy items. Both columns are emitted so the error is
    auditable row by row (and oracle-verified: the whole pipeline is a
    pure function of the input multiset over the public md5 hash —
    deterministic on any engine, same discipline as :func:`kmv_distinct`).

    Scale shape — the point of the sketch: counting state is the CMS
    itself, ``groups × depth × width`` counters built by ONE map-side-
    combining aggregation whose key cardinality is independent of the
    vocabulary. The per-item estimate then comes from ``depth``
    BROADCAST hash joins against the counter table (each occurrence
    computes its buckets and probes the broadcast map — no shuffle),
    and only the surviving occurrences (≤ groups/φ true heavies plus
    collision admits) reach the final exact (group, item) count. The
    vocabulary-sized shuffle of the exact operator never happens.
    """
    _check_cms_args(df, group_cols, item_col, phi, depth, width,
                    "cms_heavy_hitters")
    occ = df.where(F.col(item_col).isNotNull()).select(
        *group_cols, item_col
    )
    cms = _cms_counters(occ, group_cols, item_col, depth, width, hash_family)
    return _cms_probe(
        occ, cms, group_cols, item_col, phi, depth, width, hash_family
    )


def _check_cms_args(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    phi: float | None,
    depth: int,
    width: int,
    op: str,
    batch_col: str | None = None,
) -> None:
    if phi is not None and not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    keys = [*group_cols, item_col]
    if batch_col is not None:
        keys.append(batch_col)
    _check_reserved(
        keys,
        ("r", "bucket", "cnt", "depth", "width", "hash_family",
         "__est", "__total",
         *(f"__b{r}" for r in range(depth)),
         *(f"__c{r}" for r in range(depth))),
        op,
    )
    itype = df.schema[item_col].dataType.simpleString()
    if itype not in _HASHABLE_TYPES:
        raise ValueError(
            f"{op} item column {item_col!r} has type "
            f"{itype}; uniform_hash32 is engine-stable only for "
            "integer/string types — cast explicitly first"
        )


def _cms_bucket(item_col: str, r: int, width: int, family: str = "md5"):
    """Per-row hash: row index salted into the hash input — the same
    salted construction as the Bloom positions, in either family."""
    return uniform_hash32(
        F.concat(F.lit(f"{r}:"), F.col(item_col).cast("string")), family
    ) % width


def _cms_counters(
    occ: DataFrame,
    keys: list[str],
    item_col: str,
    depth: int,
    width: int,
    family: str = "md5",
) -> DataFrame:
    """CMS counter build: one corpus scan, depth× explode, then a
    map-side-combining count on (keys, r, bucket) — at most
    |keys-domain| × depth × width distinct counters regardless of
    vocabulary. ``keys`` is the group columns, optionally plus an
    ingestion-batch column (the partial-sketch face)."""
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_bucket(item_col, r, width, family).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rb")
    return (
        occ.select(*keys, rb)
        .select(*keys, "rb.r", "rb.bucket")
        .groupBy(*keys, "r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_probe(
    occ: DataFrame,
    cms: DataFrame,
    group_cols: list[str],
    item_col: str,
    phi: float,
    depth: int,
    width: int,
    family: str = "md5",
) -> DataFrame:
    """Shared probe: each occurrence computes its depth buckets and
    takes the min counter via depth BROADCAST joins (inner — an item's
    own occurrences guarantee its buckets exist); the φ threshold
    joins as a broadcast one-row-per-group frame. All map-side — the
    vocabulary-sized shuffle of the exact operator never happens.

    ``cms`` must be the (group…, r, bucket, cnt) counter table of the
    SAME corpus ``occ`` scans (one-shot build or merged partials —
    identical by linearity)."""
    # persisted: the probe consumes the counter table depth+1 times
    # (one branch per broadcast join, plus totals) and would otherwise
    # recompute it per branch; the frame is sketch-sized. Registered
    # with the dedup cached_scope lifecycle so catalog/bench runs
    # free it.
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        _register_cached,
    )

    cms = cms.persist()
    # group totals fall out of the sketch itself — row 0's counters
    # partition the group's occurrences, so their sum IS the total;
    # one aggregation over sketch-sized state instead of a second
    # corpus scan (measured: the extra scan was ~25% of entry wall)
    totals = (
        cms.where(F.col("r") == 0)
        .groupBy(*group_cols)
        .agg(F.sum("cnt").alias("__total"))
    )
    _register_cached(cms)

    probed = occ
    for r in range(depth):
        cms_r = cms.where(F.col("r") == r).select(
            *group_cols,
            F.col("bucket").alias(f"__b{r}"),
            F.col("cnt").alias(f"__c{r}"),
        )
        probed = probed.withColumn(
            f"__b{r}", _cms_bucket(item_col, r, width, family)
        ).join(F.broadcast(cms_r), [*group_cols, f"__b{r}"])
    est = F.least(*[F.col(f"__c{r}") for r in range(depth)])
    surv = (
        probed.join(F.broadcast(totals), list(group_cols))
        .withColumn("__est", est)
        .where(
            F.col("__est") >= F.ceil(F.lit(phi) * F.col("__total"))
        )
    )
    out = surv.groupBy(*group_cols, item_col).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        # every occurrence of an item carries the identical estimate
        F.min("__est").alias("est_count"),
    )
    out._cached_deps = [cms]  # type: ignore[attr-defined]
    return out


def cms_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    batch_col: str,
    depth: int = 3,
    width: int = 1024,
    hash_family: str = "md5",
) -> DataFrame:
    """Serialized CMS partial per (group, batch): the
    ``(group…, batch, r, bucket, cnt)`` counter table with the sketch
    geometry (``depth``, ``width``) riding on every row — the
    frequency member of the engine's mergeable-sketch family (KMV =
    cardinality, histogram = quantiles, Bloom = membership). Each
    ingestion window counts its own slice into depth × width counters;
    corpus-level heavy hitters then come from :func:`cms_merge` +
    :func:`cms_heavy_hitters_from_sketch` over O(batches × depth ×
    width) counter rows instead of a re-scan of every batch. The merge
    is EXACT by linearity (counters are sums), so the merged sketch is
    bit-identical to the one-shot build over the unioned batches.

    Scale shape per batch: identical to the one-shot build — one
    map-side-combining count keyed on (group, batch, r, bucket),
    cardinality independent of the vocabulary."""
    _check_cms_args(df, group_cols, item_col, None, depth, width,
                    "cms_partial_sketches", batch_col=batch_col)
    occ = df.where(F.col(item_col).isNotNull()).select(
        *group_cols, batch_col, item_col
    )
    return (
        _cms_counters(
            occ, [*group_cols, batch_col], item_col, depth, width,
            hash_family,
        )
        .withColumn("depth", F.lit(int(depth)))
        .withColumn("width", F.lit(int(width)))
        .withColumn("hash_family", F.lit(str(hash_family)))
    )


def cms_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge per-batch CMS partials into the per-group counter table —
    EXACT by linearity: a counter is a count, so summing per-batch
    counters yields precisely the one-shot counter over the unioned
    batches (no approximation is introduced by merging; the estimate
    error stays the one-shot CMS bound). Geometry rows must agree on
    (depth, width) — counters at different geometries are
    incomparable, so disagreement (or a missing geometry) fails loud
    at the first merged row, the same contract as
    :func:`bloom_merge` / :func:`kmv_merge`.

    Cost: one map-side-combining sum keyed on (group, r, bucket) over
    O(batches × depth × width) sketch rows — independent of the corpus
    the partials summarize."""
    _check_reserved(group_cols, ("r", "bucket", "cnt"), "cms_merge")
    params = partials.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count("depth").alias("__nd"),
        F.count("width").alias("__nw"),
        F.count("hash_family").alias("__nf"),
        F.min("depth").alias("depth"),
        F.max("depth").alias("__d2"),
        F.min("width").alias("width"),
        F.max("width").alias("__w2"),
        F.min("hash_family").alias("hash_family"),
        F.max("hash_family").alias("__f2"),
    )
    bad = (
        (F.col("__nd") != F.col("__n"))
        | (F.col("__nw") != F.col("__n"))
        | (F.col("__nf") != F.col("__n"))
        | (F.col("depth") != F.col("__d2"))
        | (F.col("width") != F.col("__w2"))
        | (F.col("hash_family") != F.col("__f2"))
    )
    checked = params.select(
        F.when(
            bad,
            F.raise_error(
                F.lit(
                    "cms_merge: partials disagree on (or are missing) "
                    "(depth, width, hash_family)"
                )
            ).cast("int"),
        )
        .otherwise(F.col("depth"))
        .alias("depth"),
        "width",
        "hash_family",
    )
    merged = partials.groupBy(*group_cols, "r", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    # the validated geometry rides on every merged row (broadcast
    # single-row frame) so downstream probes can re-validate
    return merged.crossJoin(F.broadcast(checked))


def cms_heavy_hitters_from_sketch(
    df: DataFrame,
    sketch: DataFrame,
    group_cols: list[str],
    item_col: str,
    phi: float,
    depth: int = 3,
    width: int = 1024,
    hash_family: str = "md5",
) -> DataFrame:
    """Heavy hitters probed against a PRE-BUILT (merged) CMS counter
    table instead of a fresh one-shot build — the consumption face of
    :func:`cms_partial_sketches` / :func:`cms_merge`. ``df`` is the
    occurrence frame the sketch summarizes (the probe still needs one
    corpus scan to enumerate candidate items; what the sketch saves is
    the counting state and the re-aggregation of every earlier batch).
    Because the merge is exact, output is identical to
    :func:`cms_heavy_hitters` on the same corpus.

    The sketch's carried geometry must equal (``depth``, ``width``) —
    buckets computed at a different geometry probe the wrong counters,
    so a mismatch (or an empty / mixed-geometry sketch frame) fails
    loud. The check is a bounded driver-side read of ONE aggregate row
    over the sketch-sized frame — deliberately not an in-plan
    raise_error, because an empty sketch empties the probe's broadcast
    joins and AQE's empty-relation propagation would eliminate the
    raising subtree before it ever evaluated (verified in test)."""
    _check_cms_args(df, group_cols, item_col, phi, depth, width,
                    "cms_heavy_hitters_from_sketch")
    occ = df.where(F.col(item_col).isNotNull()).select(
        *group_cols, item_col
    )
    # persisted BEFORE the geometry check: when the sketch is the
    # composed merge of fresh partials (the cms_merge_hh shape), its
    # subtree re-scans the occurrence corpus per action — the check's
    # .first(), the probe's counter materialization, and the derived
    # cms persist would each pay a full corpus explode. Pinning the
    # sketch-sized frame once caps the whole face at the two corpus
    # scans CMS fundamentally needs (build + probe). A DERIVED
    # projection is pinned, not the caller's object (persist returns
    # self — pinning ``sketch`` directly would silently clobber a
    # storage level the caller established independently). Registered
    # with the cached_scope lifecycle like every operator
    # intermediate, and attached to the result's _cached_deps below so
    # unscoped callers can release_cached() it.
    from etl_prometheus2clickhouse_spark.operators.dedup import (
        _register_cached,
        _release,
    )

    # geometry columns first: a REORDERED projection, because an
    # identity select canonicalizes to the caller's plan and the
    # plan-keyed CacheManager would treat "our" pin and the caller's
    # as one entry
    geo = ["depth", "width", "hash_family"]
    sketch = sketch.select(
        *geo, *[c for c in sketch.columns if c not in geo]
    ).persist()
    _register_cached(sketch)
    g = sketch.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("depth").alias("d"),
        F.max("depth").alias("d2"),
        F.min("width").alias("w"),
        F.max("width").alias("w2"),
        F.min("hash_family").alias("f"),
        F.max("hash_family").alias("f2"),
    ).first()
    if (
        g["n"] == 0
        or g["d"] is None
        or g["w"] is None
        or g["f"] is None
        or g["d"] != g["d2"]
        or g["w"] != g["w2"]
        or g["f"] != g["f2"]
        or g["d"] != int(depth)
        or g["w"] != int(width)
        or g["f"] != str(hash_family)
    ):
        _release(sketch)  # the failure path must not leak the pin
        raise ValueError(
            "cms_heavy_hitters_from_sketch: sketch geometry "
            f"(depth, width, hash_family)=({g['d']}, {g['w']}, {g['f']}) "
            f"does not match probe ({int(depth)}, {int(width)}, "
            f"{hash_family}), or the sketch is empty/mixed (rows={g['n']})"
        )
    cms = sketch.select(*group_cols, "r", "bucket", "cnt")
    out = _cms_probe(
        occ, cms, group_cols, item_col, phi, depth, width, hash_family
    )
    # extend (don't re-register) the deps _cms_probe attached, so
    # unscoped release_cached(result) frees the sketch pin too
    out._cached_deps = list(getattr(out, "_cached_deps", ())) + [sketch]
    return out


def quantile_threshold_filter(
    df: DataFrame,
    value_col: str,
    phi: float,
    bucket_width: int,
) -> DataFrame:
    """Keep rows at or above the corpus-level ``phi``-quantile of a
    numeric column, located via a fixed-width histogram — the global-
    percentile filter ("drop everything under the corpus p90 length")
    without a global sort.

    Pass 1 is one map-side-combining aggregation into
    ``value div bucket_width`` bins: state is O(value range /
    bucket_width), independent of row count. The cumulative scan and
    threshold pick run as window/agg over the HISTOGRAM (thousands of
    rows at most — the single-partition window is over sketch state,
    never data). The threshold joins back as a broadcast single-row
    frame, so no scalar ever passes through the driver and the whole
    filter is one plan.

    Threshold semantics (deterministic, oracle-exact): the kept set is
    ``value >= lo(b*)`` where ``b*`` is the smallest bucket whose
    cumulative count reaches ``ceil(phi * total)`` — i.e. the bucket
    edge UNDER the true quantile, an over-inclusive bound off by at
    most one bucket width. Integer bucket math end to end; the one
    float op (``ceil(phi*total)``) is a single IEEE multiply both
    engines share.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    v = F.col(value_col)
    # NULL values fall outside any quantile and would create a NULL
    # histogram bucket whose sort position is engine-dependent
    df = df.where(v.isNotNull())
    hist = df.groupBy(
        F.floor(v / bucket_width).cast("long").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    cum = hist.select(
        "__b",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(w_tot).alias("__total"),
    )
    thr = cum.where(
        F.col("__cum") >= F.ceil(F.lit(phi) * F.col("__total"))
    ).agg(F.min("__b").alias("__thr_b"))
    return (
        df.crossJoin(F.broadcast(thr))
        .where(v >= F.col("__thr_b") * bucket_width)
        .drop("__thr_b")
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# alpha_m bias-correction constants (Flajolet et al. 2007, §4): the
# small-m table values, then the closed form.
def _hll_alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )


def _hll_register_rows(
    df: DataFrame, group_cols: list[str], value_col: str,
    p: int, hash_family: str,
) -> DataFrame:
    """(group, register, rho) per input row. Register = top p bits of
    the 32-bit hash; rho = 1 + leading zeros of the remaining
    (32-p)-bit window. Bit length via base-2 string conversion —
    ``conv`` (Spark) and ``bin`` (DuckDB) both render minimal binary
    strings, so the arithmetic is engine-exact with no float log2."""
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} outside [4, 16]")
    wbits = 32 - p
    h = uniform_hash32(F.col(value_col), hash_family)
    reg = F.shiftright(h, wbits).cast("int")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    bit_len = F.length(F.conv(w.cast("string"), 10, 2))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - bit_len)
        .cast("int")
    )
    return df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))


def _hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int
) -> DataFrame:
    """Per-group estimate from (group, reg, mrho) register rows.

    The harmonic sum Σ 2^-M_j is kept as the EXACT integer
    Σ 2^(33-M_j) (every term dyadic, M_j ≤ 33), empty registers
    contributing 2^33 each; the estimate is then one injected-literal
    double division + round — deterministic across engines because
    every operand is either an exact integer or the same parsed
    decimal constant. The low-cardinality linear-counting branch
    (E ≤ 2.5m, V > 0; Flajolet §4) uses ln(), whose last-ulp behavior
    libms do not guarantee identical — callers wanting a cross-engine
    byte-exact result should size p so no group lands there (the
    ``corrected`` column makes the regime auditable)."""
    m = 1 << p
    c_harm = _hll_alpha(m) * m * m * float(1 << 33)
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_filled"),
        # shiftleft's DSL binding takes only a literal bit count; the
        # SQL form accepts the per-row column
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 33 - mrho)")
        ).alias("__harm_part"),
    )
    v_empty = (F.lit(m) - F.col("__n_filled")).cast("long")
    harm = (
        F.col("__harm_part") + v_empty * F.lit(1 << 33)
    ).cast("long")
    raw = F.lit(c_harm) / F.col("harmonic_scaled")
    corrected = (raw <= F.lit(2.5 * m)) & (F.col("v_empty") > 0)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty"))
    return (
        per.select(
            *group_cols,
            F.lit(m).alias("m"),
            v_empty.alias("v_empty"),
            harm.alias("harmonic_scaled"),
        )
        .withColumn("corrected", corrected)
        .withColumn(
            "est_distinct",
            F.round(F.when(corrected, linear).otherwise(raw), 4),
        )
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (Flajolet et al.
    2007) — the fixed-size counterpart of :func:`kmv_distinct`.

    Where KMV keeps k hash VALUES (distinct-agg + bottom-k: two
    shuffle-side sorts), HLL keeps only ``m = 2**p`` 5-bit register
    maxima: the whole pass is ONE map-side-combining max-aggregate
    over (group, register) — no distinct, no window, no sort — and
    per-group state is m integers regardless of cardinality. That is
    the 100 TB trade: σ ≈ 1.04/√m relative error for a sketch whose
    size never grows and whose merge is an element-wise max.

    Emits exact integer state (``m``, ``v_empty``,
    ``harmonic_scaled``) alongside the rounded ``est_distinct`` and
    the ``corrected`` flag (see :func:`_hll_estimate` on the linear-
    counting branch and cross-engine determinism)."""
    _check_reserved(group_cols, ("reg", "rho", "mrho"), "hll_distinct")
    rows = _hll_register_rows(df, group_cols, value_col, p, hash_family)
    regs = rows.groupBy(*group_cols, "reg").agg(
        F.max("rho").alias("mrho")
    )
    return _hll_estimate(regs, group_cols, p)


def hll_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    batch_col: str,
    p: int = 4,
    hash_family: str = "md5",
) -> DataFrame:
    """Dense per-(group, batch) HLL register vector — the mergeable
    artifact (cf. :func:`kmv_partial_sketches`): ``sketch[j]`` is
    register j's max rho (0 = never hit), always exactly ``2**p``
    entries. ``p`` and ``hash_family`` ride with the artifact and
    :func:`hll_merge` fails loud on mismatch — register vectors from
    different geometries or hash orders are incomparable."""
    keys = [*group_cols, batch_col]
    _check_reserved(
        keys, ("reg", "rho", "mrho", "sketch", "p", "hash_family"),
        "hll_partial_sketches",
    )
    m = 1 << p
    rows = _hll_register_rows(df, keys, value_col, p, hash_family)
    regs = rows.groupBy(*keys, "reg").agg(F.max("rho").alias("mrho"))
    return (
        regs.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("reg", "mrho"))
            ).alias("__regmap")
        )
        .select(
            *keys,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.coalesce(
                    F.element_at("__regmap", j), F.lit(0)
                ).cast("int"),
            ).alias("sketch"),
            F.lit(int(p)).alias("p"),
            F.lit(str(hash_family)).alias("hash_family"),
        )
    )


def hll_merge(
    partials: DataFrame,
    group_cols: list[str],
    p: int = 4,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge per-batch HLL partials into the per-group estimate —
    EXACT by construction (max of per-batch register maxima == the
    register maxima of the union), so the merged result equals
    :func:`hll_distinct` on the union of the batches; the catalog
    pins this by checking the merge face against the one-shot SQL
    oracle. Cost: element-wise max over O(batches) fixed-size
    vectors per group — independent of corpus size."""
    # bounded collect: one row per distinct (p, family) pair carried
    # by the artifacts — 1 in any well-formed input
    meta = partials.select("p", "hash_family").distinct().collect()
    if len(meta) != 1 or meta[0]["p"] != p:
        raise ValueError(
            f"hll_merge(p={p}): partials carry mixed or mismatched "
            f"geometry/family {sorted((r['p'], r['hash_family']) for r in meta)}"
        )
    exploded = partials.select(
        *group_cols, F.posexplode(sketch_col).alias("reg", "rho")
    )
    regs = (
        exploded.where(F.col("rho") > 0)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mrho"))
    )
    return _hll_estimate(regs, group_cols, p)


def kmv_jaccard(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_family: str = "md5",
) -> DataFrame:
    """Pairwise set-overlap estimation between groups from their KMV
    sketches (Beyer et al. SIGMOD'07 §5: the bottom-k of A∪B is
    contained in bottom-k(A) ∪ bottom-k(B), and the fraction of it
    lying in BOTH sketches is an unbiased Jaccard estimator) — "how
    much do these sources/strata share" answered from k longs per
    group instead of a pairwise distinct join.

    For every group pair (g_a < g_b): ``n_k`` (merged bottom-k size),
    ``n_overlap`` (merged hashes present in both sketches),
    ``jaccard_est`` = n_overlap/n_k (6 dp), ``est_union`` (the KMV
    estimator on the merged sketch, 4 dp; exact when the union has
    < k distinct hashes) and ``est_intersect`` = jaccard_est ·
    est_union (4 dp). Deterministic: every number is a pure function
    of the input sets under the md5 family, so the SQL oracle
    reproduces estimates bit-for-bit.

    100 TB shape: the corpus-sized work is the SAME single
    distinct-scan + WindowGroupLimit bottom-k as :func:`kmv_distinct`
    (one pass however many groups); the pairwise stage then runs on
    G sketch rows of k longs each — array arithmetic on broadcast-
    scale data. G² pair fan-out is the explicit knob: group by
    source/domain/language strata (tens to thousands), not by
    document."""
    dh = _distinct_hashes(df, [group_col], value_col, hash_family)
    sk = (
        _bottom_k(dh, [group_col], k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    a = sk.select(
        F.col(group_col).alias("g_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col(group_col).alias("g_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    merged = F.slice(
        F.array_sort(F.array_union("sk_a", "sk_b")), 1, k
    )
    out = pairs.select(
        "g_a",
        "g_b",
        merged.alias("__m"),
        F.array_intersect(
            F.array_intersect(merged, "sk_a"), "sk_b"
        ).alias("__both"),
    )
    n = F.size("__m")
    kth = F.element_at("__m", n)
    est_union = F.round(
        F.when(n < k, n.cast("double")).otherwise(
            F.lit((k - 1) * _HASH_SPACE) / kth
        ),
        4,
    )
    jac = F.round(F.size("__both") / n, 6)
    return out.select(
        "g_a",
        "g_b",
        n.cast("long").alias("n_k"),
        F.size("__both").cast("long").alias("n_overlap"),
        jac.alias("jaccard_est"),
        est_union.alias("est_union"),
        F.round(jac * est_union, 4).alias("est_intersect"),
    )


def quantile_bucket_labels(
    df: DataFrame,
    value_col: str,
    phis: Sequence[float],
    labels: Sequence[str],
    bucket_width: int = 1,
    scale: int = 1,
    out_col: str = "bucket",
) -> DataFrame:
    """Label every row with its corpus-level quantile band — the
    multi-threshold generalization of
    :func:`quantile_threshold_filter`, and the CCNet head/middle/tail
    split when ``phis=(1/3, 2/3)`` (Wenzek et al. LREC'20 §4.4: the
    corpus is cut into perplexity terciles and the tail dropped or
    down-weighted).

    Same no-global-sort construction: one map-side-combining
    histogram over ``floor(value·scale / bucket_width)`` bins, the
    cumulative scan and ALL threshold picks as one window/aggregate
    over histogram state, thresholds joined back as a broadcast
    single-row frame. Band semantics are integer-exact on bins: a row
    is in band i iff its bin is below the smallest bin whose
    cumulative count reaches ``ceil(phi_i · total)`` (ties at a
    threshold bin go to the higher band — the same over-inclusive
    edge rule as the filter, off by at most one bucket width).
    ``scale`` lifts fractional values (perplexities, ratios) onto the
    integer bin grid."""
    if len(labels) != len(phis) + 1:
        raise ValueError(
            f"need len(labels) == len(phis)+1, got {len(labels)} labels "
            f"for {len(phis)} thresholds"
        )
    if sorted(phis) != list(phis) or not all(0 < p < 1 for p in phis):
        raise ValueError("phis must be strictly increasing within (0, 1)")
    if bucket_width < 1 or scale < 1:
        raise ValueError("bucket_width and scale must be >= 1")
    v = F.col(value_col)
    df = df.where(v.isNotNull())
    b = F.floor(v * scale / bucket_width).cast("long")
    binned = df.withColumn("__b", b)
    hist = binned.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "__b",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(Window.partitionBy()).alias("__total"),
    )
    thr = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.lit(float(p)) * F.col("__total")),
                    F.col("__b"),
                )
            ).alias(f"__thr{i}")
            for i, p in enumerate(phis)
        ]
    )
    label = F.lit(labels[-1])
    for i in range(len(phis) - 1, -1, -1):
        label = F.when(
            F.col("__b") < F.col(f"__thr{i}"), F.lit(labels[i])
        ).otherwise(label)
    return (
        binned.crossJoin(F.broadcast(thr))
        .withColumn(out_col, label)
        .drop("__b", *[f"__thr{i}" for i in range(len(phis))])
    )
