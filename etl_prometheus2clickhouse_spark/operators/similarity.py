"""Embedding similarity search (engine extension; BASELINE.json north star).

Two tiers, same contract:

- :func:`cosine_topk_bruteforce` — exact top-k by cosine. The join is
  ``broadcast(queries) × corpus`` (no shuffle of the big side; the
  corpus streams through one stage), then a per-query top-k window.
  Correct at any scale where queries are small; the per-row cost is a
  fused zip_with/aggregate dot product inside codegen.
- :func:`cosine_topk_lsh` — random-hyperplane LSH: ``nbits`` sign bits
  from dot products with seeded Gaussian planes, banded into buckets;
  only bucket-colliding (query, doc) pairs get exact scoring. This is
  the 100 TB path: candidate generation is an equi-join on bucket id,
  and the planes are a driver-seeded constant broadcast with the plan.
- :func:`cosine_topk_ivf` / :func:`cosine_topk_pq` — the other two
  classic ANN scale shapes: probe-limited inverted-file search, and
  product-quantization ADC over a compressed code table (m lookups per
  corpus vector, no float vectors in the scan).
- :func:`embedding_near_dup_pairs` — corpus self near-dup via the same
  hyperplane bucketing.
- :func:`embedding_near_dup_block_gemm` — EXACT all-pairs near-dup as
  a tiled block outer product (BLAS constants, bounded task memory).

Kernel placement: per-pair/per-candidate scoring that Catalyst can
fuse stays JVM-side (the fold in :func:`cosine`); dense bulk kernels —
signature bits, batch scoring, block tiles — are Arrow-batched numpy
GEMMs (measured 3-70× over per-element interpreted folds; see each
function's docstring). Parameterization matters more than kernel
speed: signature width must grow with corpus size or candidate volume
degenerates to all-pairs (scripts/scale_smoke.py records the numbers).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from etl_prometheus2clickhouse_spark.localframe import local_df

from etl_prometheus2clickhouse_spark.operators.dedup import (

    _register_cached,
    _with_cached_deps,
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two double arrays (0 when either norm
    is 0)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda v: v.cast("double"))


def _unit(vec: Column) -> Column:
    """Vector scaled to unit norm (zero vector stays zero, so a dot of
    unit vectors reproduces :func:`cosine`'s 0-for-zero-norm contract).

    Normalizing ONCE per corpus row turns candidate rescoring into a
    single fused dot product instead of dot + two norms — 3 of the 4
    array traversals per candidate pair disappear, which is the hot
    path when LSH banding is tuned for high recall (large candidate
    sets)."""
    n = _norm(vec)
    return F.when(n > 0, F.transform(vec, lambda x: x / n)).otherwise(vec)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query.

    Output: (query_id, neighbor_id, cosine_sim, rank), rank 1..k,
    neighbor ≠ query, ties broken by neighbor_id ascending
    (deterministic — oracle-checkable).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qvec")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k neighbors per query, scored with BLAS.

    Same contract as :func:`cosine_topk_bruteforce`, but the scoring
    stage is a ``mapInPandas`` matrix multiply: the (small) normalized
    query matrix is captured in the task closure, each Arrow batch of
    corpus vectors becomes one ``(batch × dim) @ (dim × q)`` GEMM, and
    only ``(query_id, neighbor_id, cosine_sim)`` rows leave the stage.
    This is the 100 TB scorer — per-row cost is a vectorized dot
    product instead of an interpreted JVM array fold (the fold is kept
    in :func:`cosine_topk_bruteforce` for bit-exact oracle parity).
    Top-k selection stays the same per-query window.
    """
    import pandas as pd

    # The queries-are-small contract made explicit: the query matrix is
    # collected to the driver and shipped in every task closure, so an
    # unbounded query side would silently OOM driver/executors. limit()
    # bounds the scan itself; the count check turns overflow into a
    # loud error instead of a truncated answer.
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qvec")
        )
        # null-vector rows can never score; filter BEFORE the limit so
        # they don't count toward max_queries (a query side with few
        # usable vectors but many null rows must not overflow)
        .where(F.col("qvec").isNotNull())
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk_arrow: query side exceeds max_queries="
            f"{max_queries}; broadcast-GEMM requires a small query set "
            "(raise max_queries only with matching driver/executor memory)"
        )
    if not q_rows:
        schema = "query_id bigint, neighbor_id bigint, cosine_sim double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qvec for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = np.inf  # zero-norm query → all sims 0
    q_unit = (q_mat / q_norm[:, None]).T  # dim × q

    def _score(batches):
        for pdf in batches:
            # a null corpus vector would make np.asarray raise deep in
            # the task; skip those rows (contract: null vec = no match)
            mask = pdf["cvec"].notna()
            if not mask.all():
                pdf = pdf[mask]
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            c = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["cvec"]]
            )
            if len(c) == 0:
                continue
            norms = np.linalg.norm(c, axis=1)
            norms[norms == 0] = np.inf
            sims = (c / norms[:, None]) @ q_unit  # batch × q
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_c),
                    "neighbor_id": np.tile(ids, n_q),
                    "cosine_sim": sims.T.ravel(),
                }
            )

    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cvec")
        )
        .mapInPandas(
            _score, "query_id bigint, neighbor_id bigint, cosine_sim double"
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constant; becomes
    a folded literal array in the plan)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def _bucket_bits_udf(planes: list[list[float]]):
    """Sign-bit strings for a vector column, one Arrow-batched GEMM.

    The expression formulation (one ``aggregate(zip_with(...))`` fold
    per plane) is interpreted per-element per-plane — at 64 planes it
    dominated the whole LSH job (202s of a 20k-vector smoke vs ~3s as
    a batch matmul). Same lesson as the MinHash signature kernel: the
    per-vector signature is a dense dot against a constant matrix —
    exactly what one ``(batch × dim) @ (dim × nbits)`` GEMM does.
    Null/empty vectors get all-zero bits (sign of an empty dot),
    matching the old expression's null→"0" behavior."""
    from pyspark.sql import types as T

    P = np.asarray(planes, dtype=np.float64).T  # dim × nbits
    nbits = P.shape[1]
    zero = "0" * nbits

    @F.pandas_udf(T.StringType())
    def bits(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        out = pd.Series([zero] * len(vs), index=vs.index)
        if mask.any():
            M = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in vs[mask]]
            )
            signs = (M @ P) >= 0
            chars = np.where(signs, "1", "0")
            out[mask] = ["".join(row) for row in chars]
        return out

    return bits


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucketing → banded candidate
    join → exact cosine on candidates only.

    A query and doc are candidates iff some band of sign bits matches.
    Recall rises with ``bands``; cost is the bucket-join fan-out. Output
    schema matches :func:`cosine_topk_bruteforce` (ranks over retrieved
    candidates — per-query result may have < k rows on low recall).
    """
    planes = _hyperplanes(dim, nbits, seed)

    # Band rows carry ONLY (id, band, bucket); vectors never ride the
    # explode×bands fan-out — they join back once against the deduped
    # candidate set (queries stay broadcast throughout).
    cb = _banded_ids(corpus, id_col, vec_col, planes, bands, "neighbor_id")
    qb = _banded_ids(queries, id_col, vec_col, planes, bands, "query_id")
    cand = (
        cb.join(
            F.broadcast(qb),
            (cb.band == qb.band)
            & (cb.bucket == qb.bucket)
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _unit(_as_double(vec_col)).alias("cvec")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), _unit(_as_double(vec_col)).alias("qvec")
    )
    scored = (
        cand.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _train_centroids(
    X: np.ndarray, n_cells: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Spherical k-means over a sample matrix, driver-side numpy.

    Bit-reproducible by construction: seeded init, fixed iteration
    count, and single-threaded numpy reductions over a deterministic
    row order — a DISTRIBUTED k-means would make centroid bits (and
    thus cell boundaries and result hashes) depend on partition-order
    float summation. Empty cells re-seed from the sample."""
    rng = np.random.default_rng(seed)
    init = rng.permutation(len(X))[:n_cells]
    C = X[init].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members) == 0:
                C[c] = X[int(rng.integers(0, len(X)))]
                continue
            m = members.sum(axis=0)
            norm = np.linalg.norm(m)
            if norm > 0:
                C[c] = m / norm
    return C


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    train_sample: int = 4096,
    seed: int = 42,
    centroids: str = "kmeans",
) -> DataFrame:
    """Approximate top-k via an inverted file (IVF): partition the
    corpus into ``n_cells`` Voronoi cells around coarse centroids, let
    each query probe only its ``n_probe`` nearest cells, and score
    exactly inside the probed cells.

    This is the other classic ANN scale shape next to LSH
    (:func:`cosine_topk_lsh`): one corpus pass assigns every vector to
    a cell (a single ``(batch × dim) @ (dim × n_cells)`` GEMM against
    the broadcast centroid matrix), the candidate join is an equi-join
    on ``cell``, and the scored volume is ``~n_probe/n_cells`` of the
    corpus per query. At 100 TB the corpus would be *written
    partitioned by cell* so a probe prunes file listings; the coarse
    quantizer is trained driver-side on a bounded deterministic sample
    (the ``train_sample`` lowest ids — the offline-k-means shape; see
    :func:`_train_centroids` for why the training is not distributed).
    Recall rises with ``n_probe``; ``n_probe == n_cells`` degenerates
    to exact brute-force. Output schema matches
    :func:`cosine_topk_bruteforce`.

    ``centroids="kmeans"`` (default) trains spherical k-means on the
    sample; ``"first"`` uses the sample's first ``n_cells`` unit
    vectors directly (cell ``i`` = vector of the ``i``-th smallest
    id). "first" exists because it is *SQL-expressible*: the catalog's
    oracle replicates the whole IVF computation (assign → probe →
    rescore → rank) in DuckDB against the same centroid set, checking
    the distributed implementation against an independent single-node
    one — an algorithmic-parity oracle, the right check for an ANN
    operator whose recall is approximate by design.
    """
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    n_cells = min(n_cells, len(X))
    if centroids == "first":
        C = X[:n_cells].T  # dim×cells, already unit-normalized
    else:
        C = _train_centroids(X, n_cells, seed=seed).T  # dim×cells

    def _stack(vals: pd.Series) -> np.ndarray:
        # one C-level memcpy per row into a (batch × dim) matrix —
        # the per-row work is data movement only; all arithmetic
        # happens in the single GEMM below
        return np.vstack([np.asarray(v, dtype=np.float64) for v in vals])

    def _cells_udf(n_top: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def cells(vs: pd.Series) -> pd.Series:
            # one (batch × dim) @ (dim × cells) GEMM per Arrow batch;
            # stable argsort on the negated sims keeps the tie-break
            # (equal sim → lower cell id) of the scalar formulation
            mask = vs.notna().to_numpy()
            vals: list = [[0]] * len(vs)
            if mask.any():
                sims = _stack(vs[mask]) @ C
                top = np.argsort(-sims, axis=1, kind="stable")[:, :n_top]
                rows = iter(top)
                vals = [
                    [int(c) for c in next(rows)] if m else [0] for m in mask
                ]
            return pd.Series(vals)

        return cells

    @F.pandas_udf(T.IntegerType())
    def _cell1(vs: pd.Series) -> pd.Series:
        # scalar top-1 variant: keeping assignment a plain int column
        # lets the join's implicit not-null filter apply to the UDF
        # output directly — an element_at(array, 1) projection gets
        # the UDF planned twice (once under the filter, once in the
        # projection), doubling the corpus-side GEMM work. argmax
        # returns the FIRST maximum, matching the stable-argsort
        # tie-break of the probe-side kernel.
        mask = vs.notna().to_numpy()
        res = np.zeros(len(vs), dtype=np.int32)
        if mask.any():
            sims = _stack(vs[mask]) @ C
            res[mask] = sims.argmax(axis=1)
        return pd.Series(res)

    corpus_cells = vecs.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        _cell1(F.col("vec")).alias("cell"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), _unit(_as_double(vec_col)).alias("qvec")
    )
    query_cells = qvecs.select(
        "query_id",
        "qvec",
        F.explode(_cells_udf(n_probe)(F.col("qvec"))).alias("cell"),
    )
    scored = (
        corpus_cells.join(F.broadcast(query_cells), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _train_pq_codebooks(
    X: np.ndarray, m: int, k_codes: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks over a sample matrix,
    driver-side numpy — deterministic for the same reasons as
    :func:`_train_centroids` (seeded init, fixed iterations, one
    reduction order). Returns (m, k_codes, dim/m)."""
    n, dim = X.shape
    ds = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k_codes, ds))
    for j in range(m):
        sub = X[:, j * ds : (j + 1) * ds]
        C = sub[rng.permutation(n)[:k_codes]].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k_codes):
                members = sub[assign == c]
                if len(members) == 0:
                    C[c] = sub[int(rng.integers(0, n))]
                else:
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


class PQModel(NamedTuple):
    """A trained product quantizer: the driver-side artifact shared by
    :func:`pq_encode` (build time) and :func:`cosine_topk_pq_codes`
    (query time). ``codebooks`` is (m, k_codes, dim/m); ``cnorm2`` is
    the precomputed ``||c||²`` per (subspace, code) — the x-independent
    half of the L2 encode objective."""

    dim: int
    m: int
    k_codes: int
    codebooks: np.ndarray  # m × k_codes × ds
    cnorm2: np.ndarray  # m × k_codes

    @property
    def ds(self) -> int:
        return self.dim // self.m


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
    codebooks: str = "kmeans",
) -> PQModel:
    """Train a product quantizer on a bounded deterministic sample of
    the corpus (the ``train_sample`` lowest ids — the offline-training
    shape; see :func:`_train_centroids` for why training is driver-side
    numpy, not distributed). ``codebooks="first"`` slices codebooks out
    of the sample's ``k_codes`` lowest-id unit vectors — the
    SQL-expressible variant the catalog oracles replicate."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    ds = dim // m
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    k_codes = min(k_codes, len(X))
    if codebooks == "first":
        B = np.stack(
            [X[:k_codes, j * ds : (j + 1) * ds] for j in range(m)]
        )  # m × k_codes × ds
    else:
        B = _train_pq_codebooks(X, m, k_codes, seed=seed)
    return PQModel(dim, m, k_codes, B, (B**2).sum(axis=2))


def _pq_assign(Xb: np.ndarray, model: PQModel) -> np.ndarray:
    """Encode a (n × dim) unit-vector matrix to (n × m) code ids.

    argmin over codes of ``||c||² − 2 x·c`` (the x-independent L2
    objective), ROUNDED to 6 digits before the argmin so near-tied
    codes resolve identically here and in the SQL oracles regardless
    of each side's float summation order (round-9 advice,
    catalog:1860); np.argmin takes the FIRST minimum → lowest code id
    on (rounded) ties, matching the oracle's (distance, code) order."""
    m, ds = model.m, model.ds
    codes = np.empty((Xb.shape[0], m), dtype=np.int32)
    for j in range(m):
        sub = Xb[:, j * ds : (j + 1) * ds]
        obj = np.round(
            model.cnorm2[j][None, :] - 2.0 * (sub @ model.codebooks[j].T), 6
        )
        codes[:, j] = np.argmin(obj, axis=1)
    return codes


def _pq_adc_scores(
    codes: np.ndarray, lut: np.ndarray, n_q: int
) -> np.ndarray:
    """ADC: approx score of every (query, row) as m LUT lookups summed
    in fixed subspace order, rounded to 6 digits so candidate-cut ties
    resolve identically across implementations (same rationale as
    :func:`_pq_assign`)."""
    m = codes.shape[1]
    approx = np.zeros((n_q, codes.shape[0]))
    for j in range(m):
        approx += lut[:, j, :][:, codes[:, j]]
    return np.round(approx, 6)


def pq_model_to_json(model: PQModel) -> str:
    """Serialize a :class:`PQModel` to JSON — the artifact to persist
    NEXT TO the code table :func:`pq_encode` wrote (codes without
    their codebooks are meaningless; a loaded model reproduces
    encode/ADC bit-for-bit because float64 round-trips exactly
    through repr-precision JSON)."""
    import json

    return json.dumps(
        {
            "kind": "pq",
            "dim": model.dim,
            "m": model.m,
            "k_codes": model.k_codes,
            "codebooks": model.codebooks.tolist(),
        }
    )


def pq_model_from_json(s: str) -> PQModel:
    import json

    d = json.loads(s)
    if d.get("kind") != "pq":
        raise ValueError(f"not a PQ model payload (kind={d.get('kind')!r})")
    B = np.asarray(d["codebooks"], dtype=np.float64)
    return PQModel(d["dim"], d["m"], d["k_codes"], B, (B**2).sum(axis=2))


def ivfpq_model_to_json(model: IVFPQModel) -> str:
    """Serialize an :class:`IVFPQModel` (coarse centroids + PQ
    codebooks + residual flag) — persist next to the cell-partitioned
    table :func:`ivfpq_encode` wrote."""
    import json

    return json.dumps(
        {
            "kind": "ivfpq",
            "coarse": model.coarse.tolist(),
            "residuals": model.residuals,
            "pq": {
                "dim": model.pq.dim,
                "m": model.pq.m,
                "k_codes": model.pq.k_codes,
                "codebooks": model.pq.codebooks.tolist(),
            },
        }
    )


def ivfpq_model_from_json(s: str) -> IVFPQModel:
    import json

    d = json.loads(s)
    if d.get("kind") != "ivfpq":
        raise ValueError(
            f"not an IVFPQ model payload (kind={d.get('kind')!r})"
        )
    B = np.asarray(d["pq"]["codebooks"], dtype=np.float64)
    pq = PQModel(
        d["pq"]["dim"], d["pq"]["m"], d["pq"]["k_codes"], B,
        (B**2).sum(axis=2),
    )
    return IVFPQModel(
        np.asarray(d["coarse"], dtype=np.float64), pq, bool(d["residuals"])
    )


_KEY_MIN = np.int64(np.iinfo(np.int64).min)
_KEY_SCALE = np.int64(1) << 32


class _RunningTopC:
    """Running per-query top-C accumulator for the ADC scans.

    The naive formulation loops over queries per Arrow batch
    (concatenate + lexsort each) — fine at 10 queries, the partition
    bottleneck at 10k (batch retrieval: dedup-against-index workloads
    put the WHOLE corpus shard on the query side). This accumulator is
    fully vectorized: because ADC scores are pre-rounded to 6 digits
    (:func:`_pq_adc_scores`) and bounded (unit-vector dots, |score| ≤
    m+1), each (score, id) collapses into ONE int64 composite key
    ``round(score·10⁶)·2³² − id`` whose total order is exactly
    (score desc, id asc) — so one ``argpartition`` per batch over the
    (n_q × (C+batch)) key matrix maintains the running top-C with the
    SAME boundary-tie semantics the SQL oracles state. Measured vs
    the per-query lexsort loop (20 batches × 10k rows, C=100): 3.3×
    at n_q=100, 1.4× at n_q=2000 — at large n_q both formulations are
    dominated by the O(n_q × batch) element-wise work, so the
    vectorized form is equal-or-faster everywhere and removes the
    interpreter from the per-batch path (BENCH_NOTES round 9). The
    per-partition output is a SET (the global candidate cut re-ranks),
    so unordered argpartition selection is sufficient — but the set at
    the C boundary is tie-exact by the key construction.

    The composite key requires ids in [0, 2³²) and |score| < 1000
    (else int64 would overflow); violations fail LOUD with the remedy
    (map exotic id spaces to dense ids upstream) rather than silently
    degrading — the house fail-as-yourself contract."""

    def __init__(self, q_ids: np.ndarray, C: int):
        n_q = len(q_ids)
        self.q_ids = q_ids
        self.C = C
        self.keys = np.full((n_q, C), _KEY_MIN, dtype=np.int64)

    def update(
        self, approx: np.ndarray, ids: np.ndarray, mask: np.ndarray
    ) -> None:
        """Fold one batch in: ``approx`` (n_q × n) pre-rounded scores,
        ``ids`` (n,) candidate ids, ``mask`` (n_q × n) eligibility
        (probe membership / self-exclusion); masked cells never enter
        the top-C."""
        if len(ids) == 0:
            return
        if not (
            ids.min() >= 0
            and ids.max() < (1 << 32)
            and np.abs(approx).max() < 1000.0
        ):
            raise ValueError(
                "ADC top-C: candidate ids must lie in [0, 2^32) and "
                "|score| < 1000 (map exotic id spaces to dense ids "
                "upstream, e.g. zipWithIndex)"
            )
        a_int = np.rint(approx * 1e6).astype(np.int64)
        k = a_int * _KEY_SCALE - ids[None, :]
        k = np.where(mask, k, _KEY_MIN)
        comb = np.concatenate([self.keys, k], axis=1)
        if comb.shape[1] > self.C:
            # partition WITHOUT negating: -INT64_MIN overflows back to
            # INT64_MIN and would rank every sentinel as a top key
            cut = comb.shape[1] - self.C
            part = np.argpartition(comb, cut, axis=1)[:, cut:]
            self.keys = np.take_along_axis(comb, part, axis=1)
        else:
            self.keys = comb

    def _row(self, qi: int) -> tuple[np.ndarray, np.ndarray]:
        k = self.keys[qi]
        k = k[k != _KEY_MIN]
        a = -((-k) // _KEY_SCALE)  # ceil(k / 2^32)
        return (a / 1e6), (a * _KEY_SCALE - k)

    def emit(self) -> "pd.DataFrame":
        """All per-query survivors as one partial frame."""
        qcol, icol, scol = [], [], []
        for qi, q in enumerate(self.q_ids):
            sims, ids = self._row(qi)
            qcol.append(np.full(len(ids), q, dtype=np.int64))
            icol.append(ids)
            scol.append(sims)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(qcol) if qcol else [],
                "neighbor_id": np.concatenate(icol) if icol else [],
                "approx_sim": np.concatenate(scol) if scol else [],
            }
        )


def _codes_matrix(values, m: int, packed: bool) -> np.ndarray:
    """Decode a pandas Series of code rows to an (n × m) int32 matrix
    — ``packed`` rows are m-byte binary strings (one uint8 per code),
    unpacked rows are smallint arrays."""
    if packed:
        return (
            np.frombuffer(b"".join(values), dtype=np.uint8)
            .reshape(-1, m)
            .astype(np.int32)
        )
    return np.vstack([np.asarray(c, dtype=np.int32) for c in values])


def pq_encode(
    corpus: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    packed: bool = False,
) -> DataFrame:
    """Materialize the PQ code table: one ``(id, codes array<smallint>)``
    row per corpus vector — the artifact that realizes PQ's 100 TB
    economics. Encoding is a BUILD-time corpus pass (m small GEMMs per
    Arrow batch); persisted once (``.write.parquet``), every subsequent
    query scans m small ints per vector via
    :func:`cosine_topk_pq_codes` instead of re-reading (and
    re-encoding) the float vectors — at dim=1024 float64 that is a
    ~1000× scan-volume reduction (m=8, one byte-range code each; the
    array<smallint> schema keeps the oracle face simple — a production
    table would pack codes into a single binary column).

    Encoding normalizes exactly like the query path (:func:`_unit`),
    so codes from this table reproduce :func:`cosine_topk_pq`'s
    inline-encoded scores bit-for-bit (pinned by the
    ``cosine_topk_pq_codes`` catalog entry sharing the inline entry's
    oracle).

    ``packed=True`` stores each row's codes as ONE m-byte binary
    value (one uint8 per code; requires ``k_codes <= 256``) instead
    of an ``array<smallint>`` — the denser production layout (a
    parquet list carries repetition-level overhead per element; the
    binary column is exactly m bytes + definition level).
    :func:`cosine_topk_pq_codes` accepts either representation,
    dispatching on the column type."""
    if packed and model.k_codes > 256:
        raise ValueError(
            f"packed codes need k_codes <= 256 (got {model.k_codes})"
        )
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )

    def _encode(batches):
        for pdf in batches:
            pdf = pdf[pdf["vec"].notna()]
            if len(pdf) == 0:
                continue
            Xb = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            codes = _pq_assign(Xb, model)
            if packed:
                rows = [row.tobytes() for row in codes.astype(np.uint8)]
            else:
                rows = list(codes.astype(np.int16))
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "codes": rows})

    schema = (
        "id bigint, codes binary"
        if packed
        else "id bigint, codes array<smallint>"
    )
    return vecs.mapInPandas(_encode, schema)


def _collect_query_luts(
    queries: DataFrame,
    model: PQModel,
    id_col: str,
    vec_col: str,
    max_queries: int,
    op: str,
):
    """Driver-side query LUTs (bounded, loud on overflow): returns
    (q_ids int64[], q_unit q×dim, lut q×m×k_codes) or None when the
    query side is empty. Null-vector rows are filtered BEFORE the
    limit so they never count toward max_queries."""
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qvec")
        )
        .where(F.col("qvec").isNotNull())
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{op}: query side exceeds max_queries={max_queries}; "
            "ADC ships one m x k_codes LUT per query in the task closure"
        )
    if not q_rows:
        return None
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qvec for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(q_mat, axis=1)
    qn[qn == 0] = np.inf
    q_unit = q_mat / qn[:, None]
    m, ds = model.m, model.ds
    # LUT[q, j, c] = q̂_j · c_{j,c}: every ADC score is m lookups here
    lut = np.stack(
        [
            q_unit[:, j * ds : (j + 1) * ds] @ model.codebooks[j].T
            for j in range(m)
        ],
        axis=1,
    )  # q × m × k_codes
    return q_ids, q_unit, lut


def _pq_rescore_topk(
    corpus_vecs: DataFrame,
    cand: DataFrame,
    q_ids: np.ndarray,
    q_unit: np.ndarray,
    k: int,
) -> DataFrame:
    """Exact rescore + final top-k shared by every ADC variant:
    candidates are bounded (queries × n_candidates rows) by
    construction, so both joins broadcast and the corpus side never
    shuffles."""
    qdf = local_df(
        corpus_vecs.sparkSession,
        [(int(q), [float(x) for x in v]) for q, v in zip(q_ids, q_unit)],
        "query_id bigint, qvec array<double>",
    )
    scored = (
        corpus_vecs.select(
            F.col("id").alias("neighbor_id"), F.col("vec").alias("cvec")
        )
        .join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def _candidate_cut(partial: DataFrame, n_candidates: int) -> DataFrame:
    """Global candidate cut over per-partition ADC top-C partials:
    re-applies the same (approx desc, id asc) order globally."""
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id")
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 4,
    k_codes: int = 16,
    n_candidates: int = 50,
    train_sample: int = 4096,
    seed: int = 42,
    codebooks: str = "kmeans",
    max_queries: int = 10_000,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with asymmetric
    distance computation (ADC) — the compressed-domain ANN scale shape
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011) next to LSH and IVF.

    Unit-normalized vectors are split into ``m`` subspaces; each
    subvector is quantized to its nearest (L2) of ``k_codes`` codebook
    centroids, so a vector compresses to ``m`` small ints. Each query
    precomputes a lookup table of subspace-centroid inner products;
    the approximate cosine of any corpus vector is ``m`` table lookups
    summed (no per-vector float math). The scan emits per-partition
    top-``n_candidates`` per query (bounded output: partitions x
    queries x C — no full scored set ever materializes), the global
    candidate cut re-applies the same (approx desc, id asc) order, and
    exact rescoring + the final top-k run on candidates only. Recall
    rises with ``n_candidates``/``k_codes``; ``n_candidates >=
    |corpus|`` degenerates to exact-rescored-everything.

    This variant ENCODES INSIDE THE SCAN — it reads the float vectors
    and quantizes each batch on the fly, so it is the
    no-prior-artifacts face (one-off queries, or a corpus that has no
    persisted code table yet). The compressed-domain economics PQ is
    *for* — scanning m bytes/vector instead of the float vectors on
    every repeated query — live in the :func:`pq_encode` →
    :func:`cosine_topk_pq_codes` pair: build the code table once,
    persist it, and query-time scans never touch the vector column
    except for the bounded candidate rescore.

    ``codebooks="kmeans"`` (default) trains per-subspace k-means on a
    bounded deterministic sample; ``"first"`` slices the codebooks out
    of the sample's ``k_codes`` lowest-id unit vectors — the
    SQL-expressible variant, letting the catalog oracle replicate the
    ENTIRE pipeline (normalize → encode → LUT → ADC scan → candidate
    cut → rescore → rank) independently in DuckDB, the same
    algorithmic-parity check :func:`cosine_topk_ivf` established.
    Output schema matches :func:`cosine_topk_bruteforce`.
    """
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    model = pq_train(
        corpus,
        dim,
        m,
        k_codes,
        id_col=id_col,
        vec_col=vec_col,
        train_sample=train_sample,
        seed=seed,
        codebooks=codebooks,
    )
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    q = _collect_query_luts(
        queries, model, id_col, vec_col, max_queries, "cosine_topk_pq"
    )
    if q is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, "
            "cosine_sim double, rank int"
        )
    q_ids, q_unit, lut = q
    n_q = len(q_ids)
    C_cut = n_candidates

    def _scan(batches):
        """Per-partition ADC scan: encode each corpus batch (m small
        GEMMs, :func:`_pq_assign`), score against every query LUT
        (:func:`_pq_adc_scores`), keep a running per-query top-C
        (:class:`_RunningTopC` — one vectorized argpartition per
        batch, exact boundary ties), emit once."""
        acc = _RunningTopC(q_ids, C_cut)
        for pdf in batches:
            pdf = pdf[pdf["vec"].notna()]
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Xb = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            approx = _pq_adc_scores(_pq_assign(Xb, model), lut, n_q)
            acc.update(approx, ids, ids[None, :] != q_ids[:, None])
        yield acc.emit()

    partial = vecs.mapInPandas(
        _scan, "query_id bigint, neighbor_id bigint, approx_sim double"
    )
    cand = _candidate_cut(partial, C_cut)
    return _pq_rescore_topk(vecs, cand, q_ids, q_unit, k)


def cosine_topk_pq_codes(
    code_table: DataFrame,
    model: PQModel,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_candidates: int = 50,
    max_queries: int = 10_000,
) -> DataFrame:
    """Approximate top-k via ADC over a PERSISTED PQ code table — the
    query-time face of the :func:`pq_encode` build step, and the shape
    that realizes PQ's actual economics (Jégou TPAMI'11 §III): the
    candidate-generating scan reads ``code_table`` — ``(id, codes)``,
    m small ints per vector — and NEVER the float vector column, so a
    repeated query against a 100 TB float corpus scans only the ~0.1%
    -sized code table. The float vectors are touched exactly once per
    query set, by the exact rescore join, which is bounded at queries
    × n_candidates rows and broadcast (predicate pushdown on
    neighbor_id makes it an id-probe, not a scan, on an indexed/
    bucketed corpus table).

    ``code_table`` is typically ``spark.read.parquet(...)`` over what
    :func:`pq_encode` wrote; ``model`` must be the SAME quantizer that
    encoded it (codebook mismatch produces garbage scores — persist
    the model next to the table). Scores, candidate cuts, tie-breaks,
    and output schema are identical to :func:`cosine_topk_pq` with the
    same model: the ``cosine_topk_pq_codes`` catalog entry pins that
    equality against the inline entry's own DuckDB oracle
    (plans/catalog.py: ORACLE_COSINE_TOPK_PQ)."""
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    q = _collect_query_luts(
        queries, model, id_col, vec_col, max_queries, "cosine_topk_pq_codes"
    )
    if q is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, "
            "cosine_sim double, rank int"
        )
    q_ids, q_unit, lut = q
    n_q = len(q_ids)
    C_cut = n_candidates
    m = model.m
    packed = isinstance(
        code_table.schema["codes"].dataType, T.BinaryType
    )

    def _scan(batches):
        acc = _RunningTopC(q_ids, C_cut)
        for pdf in batches:
            pdf = pdf[pdf["codes"].notna()]
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = _codes_matrix(pdf["codes"], m, packed)
            approx = _pq_adc_scores(codes, lut, n_q)
            acc.update(approx, ids, ids[None, :] != q_ids[:, None])
        yield acc.emit()

    # the candidate scan touches ONLY the code table columns — select
    # them explicitly so column pruning reaches the parquet scan even
    # if the caller's table carries extras
    partial = code_table.select("id", "codes").mapInPandas(
        _scan, "query_id bigint, neighbor_id bigint, approx_sim double"
    )
    cand = _candidate_cut(partial, C_cut)
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    return _pq_rescore_topk(vecs, cand, q_ids, q_unit, k)


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 64,
    n_probe: int = 8,
    m: int = 4,
    k_codes: int = 16,
    n_candidates: int = 50,
    train_sample: int = 4096,
    seed: int = 42,
    quantizers: str = "kmeans",
    max_queries: int = 10_000,
    residuals: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF + PQ composed (IVFADC — Jégou
    TPAMI'11 §IV, the standard production ANN shape at 100 TB): a
    coarse quantizer partitions the corpus into ``n_cells`` Voronoi
    cells, every vector is PQ-encoded to ``m`` small ints, and a query
    ADC-scans ONLY the code rows of its ``n_probe`` nearest cells —
    both prunings compose, so the scanned volume is
    ``(n_probe/n_cells) × m bytes/vector`` of the corpus.

    The build pass emits ``(id, cell, codes)`` in one corpus scan (one
    cell-assignment GEMM + m encode GEMMs per Arrow batch); at 100 TB
    that table is written *partitioned by cell* so a probe prunes file
    listings before any I/O (same note as :func:`cosine_topk_ivf`).
    Query time: probe cells + LUTs are driver-side constants in the
    task closure; the scan masks each batch to probed cells per query,
    ADC-scores the survivors, and keeps a bounded per-partition top-
    ``n_candidates``; global cut + exact rescore as in
    :func:`cosine_topk_pq`.

    ``residuals=False`` quantizes the RAW unit vectors;
    ``residuals=True`` is the proper IVFADC refinement (Jégou §IV-A):
    each vector is encoded as its residual ``x̂ − c(cell)`` against a
    SHARED residual codebook, and the ADC score becomes
    ``q̂·c(cell) + Σ_j LUT[j, code_j]`` — the coarse term is exact per
    cell and the codebook only has to cover the (much tighter)
    residual distribution, which is where the recall gain comes from.
    Cost shape is unchanged: one extra subtraction per corpus row at
    build time and one precomputed ``q̂·C`` row per query (already
    needed for probing) at query time. Recall/parameter trade-offs
    for both modes are pinned in tests/test_similarity.py.

    ``quantizers="first"`` makes BOTH quantizers SQL-expressible
    (coarse cells = the sample's first ``n_cells`` unit vectors,
    codebooks = first ``k_codes`` sample vectors — or their residuals
    when ``residuals=True``), so the catalog oracle replicates
    assign → probe → encode → ADC → candidate cut → rescore → rank
    end-to-end in DuckDB. Output schema matches
    :func:`cosine_topk_bruteforce`."""
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    ivf_model = ivfpq_train(
        corpus,
        dim,
        n_cells=n_cells,
        m=m,
        k_codes=k_codes,
        id_col=id_col,
        vec_col=vec_col,
        train_sample=train_sample,
        seed=seed,
        quantizers=quantizers,
        residuals=residuals,
    )
    C, model = ivf_model.coarse, ivf_model.pq
    n_cells = C.shape[1]
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    q = _collect_query_luts(
        queries, model, id_col, vec_col, max_queries, "cosine_topk_ivfpq"
    )
    if q is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, "
            "cosine_sim double, rank int"
        )
    q_ids, q_unit, lut = q
    n_q = len(q_ids)
    C_cut = n_candidates
    # probe sets: stable argsort keeps the (sim desc, cell asc)
    # tie-break of cosine_topk_ivf's probe kernel; the same q̂·C rows
    # supply the exact coarse term of the residual ADC score
    q_cell_sims = q_unit @ C  # n_q × cells
    probe_sets = np.argsort(-q_cell_sims, axis=1, kind="stable")[:, :n_probe]
    probe_masks = np.zeros((n_q, n_cells), dtype=bool)
    for qi in range(n_q):
        probe_masks[qi, probe_sets[qi]] = True

    def _scan(batches):
        """Build + probe in one pass (encode-in-scan face): assign the
        batch to cells (one GEMM — argmax takes the FIRST max, lowest
        cell on ties), PQ-encode it (residuals against the assigned
        centroid when enabled), then per query ADC-score only the
        rows whose cell is probed."""
        acc = _RunningTopC(q_ids, C_cut)
        for pdf in batches:
            pdf = pdf[pdf["vec"].notna()]
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Xb = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            cells = (Xb @ C).argmax(axis=1)
            codes = _pq_assign(Xb - C.T[cells] if residuals else Xb, model)
            approx = _pq_adc_scores(codes, lut, n_q)
            if residuals:
                # q̂·x̂ ≈ q̂·c(cell) + q̂·r̂: add the exact coarse term,
                # re-rounded so ties keep resolving like the oracle
                approx = np.round(approx + q_cell_sims[:, cells], 6)
            mask = probe_masks[:, cells] & (ids[None, :] != q_ids[:, None])
            acc.update(approx, ids, mask)
        yield acc.emit()

    partial = vecs.mapInPandas(
        _scan, "query_id bigint, neighbor_id bigint, approx_sim double"
    )
    cand = _candidate_cut(partial, C_cut)
    return _pq_rescore_topk(vecs, cand, q_ids, q_unit, k)


class IVFPQModel(NamedTuple):
    """A trained IVFADC index model: the coarse quantizer (dim ×
    n_cells unit centroids), the PQ model (raw-vector or residual
    codebooks), and which of the two encodings the codebooks were
    trained for. Shared by :func:`ivfpq_encode` (build time) and
    :func:`cosine_topk_ivfpq_codes` (query time) — persist it next to
    the code table; mixing models and tables produces garbage scores."""

    coarse: np.ndarray  # dim × n_cells
    pq: PQModel
    residuals: bool


def ivfpq_train(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 64,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
    quantizers: str = "kmeans",
    residuals: bool = False,
) -> IVFPQModel:
    """Train the IVFADC pair (coarse quantizer + PQ codebooks) on a
    bounded deterministic sample — the factored-out build-time half of
    :func:`cosine_topk_ivfpq`, for callers that persist the code table
    with :func:`ivfpq_encode` instead of encoding in-scan."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    n_cells = min(n_cells, len(X))
    k_codes = min(k_codes, len(X))
    ds = dim // m
    if quantizers == "first":
        C = X[:n_cells].T
    else:
        C = _train_centroids(X, n_cells, seed=seed).T
    enc_X = X - C.T[(X @ C).argmax(axis=1)] if residuals else X
    if quantizers == "first":
        B = np.stack(
            [enc_X[:k_codes, j * ds : (j + 1) * ds] for j in range(m)]
        )
    else:
        B = _train_pq_codebooks(enc_X, m, k_codes, seed=seed)
    return IVFPQModel(
        C, PQModel(dim, m, k_codes, B, (B**2).sum(axis=2)), residuals
    )


def ivfpq_encode(
    corpus: DataFrame,
    model: IVFPQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    packed: bool = False,
) -> DataFrame:
    """Materialize the IVFADC index table: one ``(id, cell, codes)``
    row per corpus vector. Persist it PARTITIONED BY CELL —
    ``.write.partitionBy("cell").parquet(path)`` — and a query's probe
    set becomes a PARTITION FILTER: Spark prunes non-probed cell
    directories at file-listing time, so the scan touches
    ``(n_probe/n_cells) × m smallints`` per corpus vector of I/O —
    both prunings (probe × code compression) realized as storage
    layout, which is exactly the "at 100 TB the table is written
    partitioned by cell" note on :func:`cosine_topk_ivfpq`, made
    literal (scripts/scale_smoke.py asserts PartitionFilters +
    ReadSchema on the real plan). ``packed=True`` stores codes as one
    m-byte binary per row (see :func:`pq_encode`)."""
    if packed and model.pq.k_codes > 256:
        raise ValueError(
            f"packed codes need k_codes <= 256 (got {model.pq.k_codes})"
        )
    C = model.coarse
    pq = model.pq
    residuals = model.residuals
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )

    def _encode(batches):
        for pdf in batches:
            pdf = pdf[pdf["vec"].notna()]
            if len(pdf) == 0:
                continue
            Xb = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            cells = (Xb @ C).argmax(axis=1)
            codes = _pq_assign(Xb - C.T[cells] if residuals else Xb, pq)
            if packed:
                rows = [row.tobytes() for row in codes.astype(np.uint8)]
            else:
                rows = list(codes.astype(np.int16))
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "codes": rows,
                }
            )

    schema = (
        "id bigint, cell int, codes binary"
        if packed
        else "id bigint, cell int, codes array<smallint>"
    )
    return vecs.mapInPandas(_encode, schema)


def _ivfpq_code_candidates(
    code_table: DataFrame,
    model: IVFPQModel,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int,
    n_candidates: int,
    max_queries: int,
    op: str,
):
    """ADC candidate generation over a persisted cell-partitioned code
    table, WITHOUT the rescore: returns ``(cand, q_ids, q_unit)`` where
    ``cand`` is the bounded (query_id, neighbor_id) candidate frame, or
    ``None`` when the query side is empty. Factored out so callers can
    choose the rescore source (caller-supplied corpus, or the index's
    own id-bucketed vector table pruned to the candidates' prefixes —
    operators/ann_index.py)."""
    C = model.coarse
    pq = model.pq
    residuals = model.residuals
    n_cells = C.shape[1]
    q = _collect_query_luts(queries, pq, id_col, vec_col, max_queries, op)
    if q is None:
        return None
    q_ids, q_unit, lut = q
    n_q = len(q_ids)
    C_cut = n_candidates
    q_cell_sims = q_unit @ C
    probe_sets = np.argsort(-q_cell_sims, axis=1, kind="stable")[:, :n_probe]
    probe_masks = np.zeros((n_q, n_cells), dtype=bool)
    for qi in range(n_q):
        probe_masks[qi, probe_sets[qi]] = True
    all_probed = sorted({int(c) for row in probe_sets for c in row})
    m = pq.m
    packed = isinstance(code_table.schema["codes"].dataType, T.BinaryType)

    def _scan(batches):
        acc = _RunningTopC(q_ids, C_cut)
        for pdf in batches:
            pdf = pdf[pdf["codes"].notna()]
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            codes = _codes_matrix(pdf["codes"], m, packed)
            approx = _pq_adc_scores(codes, lut, n_q)
            if residuals:
                approx = np.round(approx + q_cell_sims[:, cells], 6)
            mask = probe_masks[:, cells] & (ids[None, :] != q_ids[:, None])
            acc.update(approx, ids, mask)
        yield acc.emit()

    # the probe-union filter is what partition pruning pushes to the
    # file listing on a partitionBy("cell") table
    partial = (
        code_table.select("id", "cell", "codes")
        .where(F.col("cell").isin(all_probed))
        .mapInPandas(
            _scan, "query_id bigint, neighbor_id bigint, approx_sim double"
        )
    )
    return _candidate_cut(partial, C_cut), q_ids, q_unit


_IVFPQ_TOPK_SCHEMA = (
    "query_id bigint, neighbor_id bigint, cosine_sim double, rank int"
)


def cosine_topk_ivfpq_codes(
    code_table: DataFrame,
    model: IVFPQModel,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 8,
    n_candidates: int = 50,
    max_queries: int = 10_000,
) -> DataFrame:
    """IVFADC over a PERSISTED cell-partitioned code table — the
    query-time face of :func:`ivfpq_encode`. The probe-set union
    across all queries is pushed as a ``cell IN (...)`` filter BEFORE
    the scan, so on a ``partitionBy("cell")`` table Spark prunes
    non-probed directories at listing time and the candidate scan
    reads only probed cells' ``(id, cell, codes)`` rows — never the
    float vectors (those are touched only by the bounded broadcast
    rescore). Scores, cuts, and tie-breaks are identical to
    :func:`cosine_topk_ivfpq` with the same model."""
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    res = _ivfpq_code_candidates(
        code_table, model, queries, id_col, vec_col,
        n_probe, n_candidates, max_queries, "cosine_topk_ivfpq_codes",
    )
    if res is None:
        return corpus.sparkSession.createDataFrame([], _IVFPQ_TOPK_SCHEMA)
    cand, q_ids, q_unit = res
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    return _pq_rescore_topk(vecs, cand, q_ids, q_unit, k)


def _banded_ids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    bands: int,
    id_alias: str,
) -> DataFrame:
    """(id, band, bucket) rows — the slim frame for candidate joins."""
    per_band = len(planes) // bands
    return (
        df.select(F.col(id_col).alias(id_alias), _as_double(vec_col).alias("__v"))
        .withColumn("__bits", _bucket_bits_udf(planes)(F.col("__v")))
        .select(
            id_alias,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.substring(
                            F.col("__bits"), b * per_band + 1, per_band
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        )
        .select(
            id_alias,
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )


def embedding_near_dup_bruteforce(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact all-pairs cosine near-dup (id_a < id_b, cosine ≥ threshold).

    O(n²) by construction — the correctness baseline the LSH variant is
    measured against; at scale use :func:`embedding_near_dup_pairs`."""
    v = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_block_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    blocks: int = 16,
) -> DataFrame:
    """EXACT all-pairs cosine near-dup as a tiled block outer product —
    the scale-correct shape for exact similarity self-joins.

    The corpus is hashed into ``blocks`` chunks; each upper-triangle
    chunk pair becomes one task that runs a single
    ``(n_a × d) @ (d × n_b)`` GEMM and emits only the pairs ≥
    ``threshold``. Work is inherently O(n²) (that's what *exact* costs)
    but with optimal constants: vectorized BLAS instead of a per-pair
    interpreted fold, each block's matrix shuffled ``blocks`` times
    (the standard replication cost of a block outer product), per-task
    memory bounded by two blocks — no driver collect, no all-pairs row
    explosion before scoring. Size ``blocks`` so n/blocks vectors fit
    comfortably in a task (~100k × dim doubles).

    Same contract as :func:`embedding_near_dup_bruteforce`
    (id_a < id_b, cosine ≥ threshold).
    """
    import pandas as pd

    v = corpus.select(
        F.col(id_col).alias("id"),
        _unit(_as_double(vec_col)).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("blk"),
    )
    packed = v.groupBy("blk").agg(
        F.collect_list("id").alias("ids"),
        F.collect_list("vec").alias("vecs"),
    )
    a = packed.select(
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = packed.select(
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    tiles = a.join(b, F.col("blk_a") <= F.col("blk_b"))
    id_type = dict(v.dtypes)["id"]
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"

    def _score(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["ids_a"])
                ids_b = np.asarray(row["ids_b"])
                A = np.asarray([np.asarray(x) for x in row["vecs_a"]])
                B = np.asarray([np.asarray(x) for x in row["vecs_b"]])
                if len(A) == 0 or len(B) == 0:
                    continue
                sims = A @ B.T
                ii, jj = np.where(sims >= threshold)
                if len(ii) == 0:
                    continue
                pa, pb, ps = ids_a[ii], ids_b[jj], sims[ii, jj]
                if row["blk_a"] == row["blk_b"]:
                    # diagonal tile: every unordered pair appears twice
                    # (and the diagonal as self-pairs) — keep id_a<id_b
                    keep = pa < pb
                    pa, pb, ps = pa[keep], pb[keep], ps[keep]
                else:
                    # off-diagonal tile: each pair appears exactly once,
                    # possibly id-reversed — canonicalize by swapping
                    lo = np.minimum(pa, pb)
                    pb = np.maximum(pa, pb)
                    pa = lo
                if len(pa) == 0:
                    continue
                yield pd.DataFrame(
                    {"id_a": pa, "id_b": pb, "cosine_sim": ps}
                )

    return tiles.mapInPandas(_score, out_schema)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 16,
    bands: int = 4,
    seed: int = 42,
    rescore: str = "arrow",
) -> DataFrame:
    """Self near-dup: pairs with cosine ≥ threshold, candidates from
    hyperplane-band collisions (id_a < id_b). Band rows are (id, band,
    bucket) only; vectors join back once against deduped candidates.

    ``rescore="arrow"`` (default) scores candidate pairs with a batched
    numpy row-wise dot in ``mapInPandas`` — when banding is tuned for
    high recall the candidate set is large and a vectorized dot beats
    the interpreted JVM array fold ~3-5×; ``"jvm"`` keeps scoring fully
    in codegen (useful where Arrow transfer dominates, tiny candidate
    sets)."""
    planes = _hyperplanes(dim, nbits, seed)
    banded = _banded_ids(corpus, id_col, vec_col, planes, bands, "id")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    joined = cand.join(
        vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va")), "id_a"
    ).join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")), "id_b")
    if rescore == "jvm":
        scored = joined.select(
            "id_a", "id_b", _dot(F.col("va"), F.col("vb")).alias("cosine_sim")
        )
    else:
        import pandas as pd

        id_type = dict(joined.dtypes)["id_a"]
        out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"

        def _score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                va = np.asarray(pdf["va"].tolist(), dtype=np.float64)
                vb = np.asarray(pdf["vb"].tolist(), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "id_a": pdf["id_a"],
                        "id_b": pdf["id_b"],
                        "cosine_sim": np.einsum("ij,ij->i", va, vb),
                    }
                )

        scored = joined.mapInPandas(_score, out_schema)
    return scored.where(F.col("cosine_sim") >= threshold)


class NearDupPlan(NamedTuple):
    """Output of :func:`plan_near_dup` — the chosen strategy and its
    sizing, plus the cost-model terms so callers/tests can audit the
    decision instead of trusting it."""

    strategy: str  # "gemm" | "lsh"
    nbits: int  # total sign bits (lsh) — bands × bits_per_band
    bands: int
    bits_per_band: int
    blocks: int  # tiling (gemm)
    est_bg_candidates: float  # expected random-pair candidates (lsh)
    est_cost: float  # winning strategy's modeled op count
    est_cost_gemm: float


def _collision_prob(threshold: float) -> float:
    """P[sign bit agrees] for a random hyperplane at the given cosine
    (Goemans–Williamson: 1 − θ/π)."""
    t = min(1.0, max(-1.0, threshold))
    return 1.0 - math.acos(t) / math.pi


def plan_near_dup(
    n: int,
    dim: int,
    threshold: float,
    recall: float = 0.999,
    cand_per_row: float = 32.0,
) -> NearDupPlan:
    """Size the near-dup strategy from (corpus size, dim, threshold)
    instead of hand-tuned constants — the round-3 verdict's failure
    mode was exactly a fixed ``nbits``/``bands`` that silently
    degenerates to all-pairs when the corpus grows or the threshold
    drops.

    For each candidate band width ``r`` (bits per band):

    - bands needed for per-pair recall ≥ ``recall`` at the threshold:
      ``b = ⌈ln(1−recall)/ln(1−p^r)⌉`` with ``p = 1 − arccos(t)/π``;
    - expected *background* candidates (random, sim≈0 → per-bit
      collision ½): ``b · 2^−r · n²/2``. Widths whose background
      exceeds ``cand_per_row · n`` are rejected — that is the
      sub-quadratic guarantee, enforced by sizing rather than hoped
      for;
    - modeled cost: signature GEMM + band-row shuffle + vectorized
      rescore of the background candidates.

    The exact tiled block-GEMM (cost ``n²·dim`` discounted for BLAS
    throughput) competes on the same scale; low thresholds (banding
    non-selective: every width needs too many bands) and small corpora
    route to it automatically. Tests pin both regimes
    (tests/test_similarity.py); scripts/scale_smoke.py records the
    crossover empirically."""
    n = max(int(n), 1)
    gemm_blocks = max(16, -(-n // 50_000))  # ≥16 tiles rows for local[32]
    # BLAS GEMM retires ~32 multiply-adds per "interpreted op" of the
    # cost unit used below — both kernels are numpy, so only the
    # shuffle/row terms differ in kind
    cost_gemm = n * n * dim / 32.0
    best: NearDupPlan | None = None
    p = _collision_prob(threshold)
    for r in range(1, 33):
        pr = p**r
        if not 0.0 < pr < 1.0:
            continue
        b = math.ceil(math.log1p(-recall) / math.log1p(-pr))
        if b < 1 or b > 256:
            continue
        bg = b * (0.5**r) * n * n / 2.0
        if bg > cand_per_row * n:
            continue
        cost = (
            n * r * b * dim / 32.0  # signature GEMM
            + n * b * 50.0  # band-row shuffle+join, ~50 ops/row
            + bg * dim / 32.0  # vectorized rescore
        )
        if best is None or cost < best.est_cost:
            best = NearDupPlan(
                "lsh", r * b, b, r, gemm_blocks, bg, cost, cost_gemm
            )
    if best is None or cost_gemm <= best.est_cost:
        return NearDupPlan(
            "gemm", 0, 0, 0, gemm_blocks, float(n) * n / 2, cost_gemm, cost_gemm
        )
    return best


def embedding_near_dup_auto(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    seed: int = 42,
    n: int | None = None,
    recall: float = 0.999,
    rescore: str = "arrow",
) -> DataFrame:
    """Self-sizing near-dup front door: pick exact tiled block-GEMM or
    banded LSH (and the banding itself) from the corpus size and
    threshold via :func:`plan_near_dup`.

    ``n`` skips the sizing ``count()`` when the caller already knows
    the corpus size (at 100 TB, a metadata count or a table statistic —
    never a scan). Output contract matches both backends:
    (id_a < id_b, cosine_sim ≥ threshold); GEMM routes are exact, LSH
    routes have exact precision (candidates are exactly rescored) and
    per-pair recall ≥ ``recall`` in expectation at the threshold."""
    if n is None:
        n = corpus.count()
    plan = plan_near_dup(n, dim, threshold, recall=recall)
    if plan.strategy == "gemm":
        return embedding_near_dup_block_gemm(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            blocks=plan.blocks,
        )
    return embedding_near_dup_pairs(
        corpus,
        dim,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        nbits=plan.nbits,
        bands=plan.bands,
        seed=seed,
        rescore=rescore,
    )


def semantic_dedup(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    threshold: float = 0.95,
    train_sample: int = 4096,
    seed: int = 42,
    centroids: str = "kmeans",
) -> DataFrame:
    """SemDeDup — semantic deduplication by cluster-then-prune (Abbas
    et al., "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication", arXiv:2303.09540): k-means the embedding
    space into ``n_cells`` clusters, compare pairs ONLY within a
    cluster, and drop every vector whose cosine to a LOWER-ID
    cluster-mate reaches ``threshold``. Replaces the paper's
    keep-one-per-ε-ball with the deterministic keep-lowest-id rule
    (the paper itself notes the in-ball choice barely matters —
    §3.1 "we find random works as well"); like the paper, a
    cross-cluster near-duplicate pair is an accepted miss — that
    locality is exactly what makes the method sub-quadratic. For
    transitive keep-one-per-component resolution over the surviving
    pair graph, feed the pairs into
    operators/dedup.py:resolve_near_duplicates.

    Output: one row per corpus vector —
    ``(id, cell, dup_of nullable, kept)`` where ``dup_of`` is the
    LOWEST qualifying lower id (exact integer — the emitted columns
    carry no floats, so there is no rounding surface in the result)
    and ``kept = dup_of IS NULL``. The threshold comparison itself
    happens on the 6-digit-rounded cosine so a sim sitting within
    float-noise of ``threshold`` resolves identically here and in the
    SQL oracle (the cos_sim convention, catalog:1860 advice).

    Scale shape: one corpus pass assigns cells (per-Arrow-batch GEMM
    against the broadcast centroid matrix — the IVF assignment
    kernel); the candidate stage is a cell-keyed self-join, Σ|cell|²
    pairwise work with |cell| ≈ n/n_cells — the paper runs 50k
    clusters over 5B embeddings for exactly this bound, so ``n_cells``
    must scale with the corpus (the 100 TB knob, same contract as the
    LSH band width). The pair output is pre-filtered to qualifying
    pairs before the per-id min aggregate, so nothing quadratic
    survives the stage; the final annotate is a slim left join on the
    id. Centroid training is driver-side on a bounded deterministic
    sample (see :func:`_train_centroids`); ``centroids="first"`` is
    the SQL-expressible quantizer for the full-pipeline parity oracle
    (the IVF/PQ oracle convention)."""
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    sample = vecs.orderBy("id").limit(train_sample).select("vec").collect()
    X = np.asarray([r.vec for r in sample], dtype=np.float64)
    n_cells = min(n_cells, len(X))
    if centroids == "first":
        C = X[:n_cells].T
    else:
        C = _train_centroids(X, n_cells, seed=seed).T

    @F.pandas_udf(T.IntegerType())
    def _cell1(vs: pd.Series) -> pd.Series:
        mask = vs.notna().to_numpy()
        res = np.zeros(len(vs), dtype=np.int32)
        if mask.any():
            sims = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in vs[mask]]
            ) @ C
            res[mask] = sims.argmax(axis=1)
        return pd.Series(res)

    # the (id, vec, cell) frame feeds BOTH pair-join sides AND the
    # final annotate — unpersisted, Catalyst plans three parquet scans
    # and runs the assignment GEMM UDF five times (double-planned
    # under each join side's implicit not-null filter; verified on
    # the formatted plan). Persist once, register with the dedup
    # module's cached-scope protocol so callers free it after
    # materialization (the minhash_lsh_pairs contract).
    cells = vecs.select(
        "id", "vec", _cell1(F.col("vec")).alias("cell")
    ).persist()
    _register_cached(cells)
    a = cells.select(
        F.col("cell"), F.col("id").alias("id_a"), F.col("vec").alias("vec_a")
    )
    b = cells.select(
        F.col("cell"), F.col("id").alias("id_b"), F.col("vec").alias("vec_b")
    )
    qualifying = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(_dot(F.col("vec_a"), F.col("vec_b")), 6) >= threshold
        )
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    out = (
        cells.join(qualifying, cells.id == qualifying.id_b, "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("dup_of").cast("long").alias("dup_of"),
            F.col("dup_of").isNull().alias("kept"),
        )
    )
    return _with_cached_deps(out, [cells])


# ---------------------------------------------------------------------------
# ANN quality evaluation
# ---------------------------------------------------------------------------

def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall@k of an approximate neighbor list against the
    exact ground truth — the acceptance metric every production ANN
    deployment tracks (recall@k is THE reported quality axis in Jégou
    et al. TPAMI'11 and the ann-benchmarks methodology).

    ``exact`` is the ground-truth top-k result (one row per (query,
    neighbor)); ``approx`` is the candidate system's list under the
    same column names. Emits one row per query:
    ``(query_id, k, n_hit, recall_at_k)`` where ``k`` is that query's
    ground-truth list size, ``n_hit`` the overlap, and ``recall_at_k``
    their 6-dp-rounded ratio. Queries the approximate system missed
    entirely still appear (n_hit = 0) because the join is left from
    the ground truth.

    100 TB shape: both sides reduce to slim (query, neighbor) pairs
    before the equi-join (any extra columns pruned), the join key is
    the composite (query, neighbor) — uniform, no skew — and the
    per-query rollup is a map-side-combining hash aggregate on the
    already-co-partitioned join output, so the whole evaluation is one
    slim shuffle per side."""
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    )
    a = approx.select(
        F.col(query_col).alias("__q"),
        F.col(neighbor_col).alias("__n"),
        F.lit(1).alias("__hit"),
    )
    joined = e.join(a, ["__q", "__n"], "left")
    return (
        joined.groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            F.col("__q").alias(query_col),
            F.col("k").cast("long").alias("k"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(F.col("n_hit") / F.col("k"), 6).alias("recall_at_k"),
        )
    )


def pq_distortion(
    corpus: DataFrame,
    model: "PQModel",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector, per-subspace PQ reconstruction error — the
    distortion axis of ANN evaluation (Jégou et al. TPAMI'11 §II
    report quantization MSE alongside recall; recall says whether the
    index finds the right neighbors, distortion says how much signal
    the compression itself destroyed, and a codebook can look fine on
    one while failing the other).

    Emits ``(id, subspace, code, sq_err)``: the chosen code per
    subspace (same rounded-objective argmin as the encode path — ties
    resolve to the lowest code, identical to the SQL oracles) and
    ``sq_err = ||x_j − c_code||²`` as the rounded objective plus the
    subvector's own norm, rounded to 6 dp so the value is
    reproducible cross-engine. Per-vector rows rather than a
    pre-aggregated mean: the caller rolls up however they like, and
    the oracle comparison stays exact instead of
    summation-order-dependent.

    100 TB shape: identical to :func:`pq_encode` — m small GEMMs per
    Arrow batch, embarrassingly parallel, no shuffle."""
    vecs = corpus.select(
        F.col(id_col).alias("id"), _unit(_as_double(vec_col)).alias("vec")
    )
    m, ds = model.m, model.ds

    def _dist(batches):
        for pdf in batches:
            pdf = pdf[pdf["vec"].notna()]
            if len(pdf) == 0:
                continue
            Xb = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            ids = pdf["id"].to_numpy()
            out = {"id": [], "subspace": [], "code": [], "sq_err": []}
            for j in range(m):
                sub = Xb[:, j * ds : (j + 1) * ds]
                obj = np.round(
                    model.cnorm2[j][None, :]
                    - 2.0 * (sub @ model.codebooks[j].T),
                    6,
                )
                cj = np.argmin(obj, axis=1)
                objmin = obj[np.arange(len(sub)), cj]
                xnorm = (sub * sub).sum(axis=1)
                out["id"].extend(ids)
                out["subspace"].extend([j] * len(sub))
                out["code"].extend(cj.astype(int))
                out["sq_err"].extend(np.round(objmin + xnorm, 6))
            yield pd.DataFrame(out)

    return vecs.mapInPandas(
        _dist, "id bigint, subspace int, code int, sq_err double"
    )


def _mmr_driver(cand: DataFrame, pair_rows, k: int, lam: float) -> DataFrame:
    """Driver-local MMR greedy selection over the collected candidate
    and pairwise-similarity rows — see the fast-path comment in
    :func:`mmr_rerank`. ``cand`` is the eager-checkpointed candidate
    frame (collected here: result-sized by the caller's threshold);
    the returned frame carries the same columns and types as the
    distributed route's output."""
    crows = cand.select("query_id", "doc_id", "__rel").collect()
    by_q: dict = {}
    for r in crows:
        # index access: Row.__getattr__ rejects dunder-named columns
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["__rel"]))
    sims: dict = {}
    for r in pair_rows:
        sims[(r["query_id"], r["__a"], r["__b"])] = r["__sim"]
    out = []
    for q, docs in by_q.items():
        # step 1: pure argmax relevance, ties by doc id ascending
        first = min(docs, key=lambda d: (-d[1], d[0]))
        selected = [first]
        out.append((q, first[0], first[1], 1))
        for step in range(2, k + 1):
            chosen = None
            for doc, rel in docs:
                if any(doc == s[0] for s in selected):
                    continue
                # penalty: max similarity to any selected doc, over
                # the pairs that EXIST (the distributed route's inner
                # join eligibility — a candidate with no pair to any
                # selected doc is not eligible this step)
                pens = [
                    sims[(q, doc, s[0])]
                    for s in selected
                    if (q, doc, s[0]) in sims
                ]
                if not pens:
                    continue
                score = lam * rel - (1.0 - lam) * max(pens)
                if (
                    chosen is None
                    or score > chosen[0]
                    or (score == chosen[0] and doc < chosen[1])
                ):
                    chosen = (score, doc, rel)
            if chosen is None:
                break
            selected.append((chosen[1], chosen[2]))
            out.append((q, chosen[1], chosen[2], step))
    fields = {f.name: f for f in cand.schema.fields}
    schema = T.StructType([
        fields["query_id"],
        fields["doc_id"],
        T.StructField("__rel", T.DoubleType()),
        T.StructField("__step", T.IntegerType(), False),
    ])
    frame = local_df(cand.sparkSession, out, schema)
    return frame.select(
        "query_id",
        "doc_id",
        F.col("__step").cast("int").alias("mmr_rank"),
        F.round("__rel", 6).alias("relevance"),
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "relevance",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_pair_threshold: int = 65_536,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily select ``k`` of each query's candidates,
    trading relevance against redundancy —

        pick argmax  λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)

    (first pick = pure argmax relevance). The diversity pass every
    retrieval stack runs on its top-k before showing or sampling it;
    for a training-data pipeline, the anti-near-dup selection step.

    The greedy recursion is inherently sequential, so it is unrolled
    into ``k`` DataFrame rounds (the pagerank pattern) — but ALL
    frames involved are result-sized: candidates are an upstream
    top-k (O(queries × k_cand)), the candidate-pair similarity matrix
    is O(queries × k_cand²), and each round is one equi-join + one
    max-agg + one per-query top-1 (WindowGroupLimit). The corpus is
    never touched; ``localCheckpoint`` cuts per-round lineage so the
    upstream retrieval is not re-executed per round.

    Determinism: relevance and pairwise cosines are per-row double
    expressions (identical cross-engine); the redundancy penalty is a
    ``max`` — exact regardless of aggregation order, unlike a sum;
    the selection score ``λ·rel − (1−λ)·pen`` is one fixed expression;
    ties break by document id.

    Output: ``query_id``, ``doc_id``, ``mmr_rank`` (selection order,
    1-based), ``relevance`` (rounded).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    vecs = vectors.select(
        F.col(vec_id_col).alias("__vid"), _as_double(vec_col).alias("__v")
    )
    cand = (
        candidates.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rel_col).cast("double").alias("__rel"),
        )
        .join(vecs, F.col("doc_id") == F.col("__vid"))
        .select("query_id", "doc_id", "__rel", "__v")
        .localCheckpoint(eager=True)
    )
    c1 = cand.select(
        "query_id", F.col("doc_id").alias("__a"), F.col("__v").alias("__va")
    )
    c2 = cand.select(
        "query_id", F.col("doc_id").alias("__b"), F.col("__v").alias("__vb")
    )
    csim_plan = (
        c1.join(c2, "query_id")
        .where(F.col("__a") != F.col("__b"))
        .select(
            "query_id",
            "__a",
            "__b",
            cosine(F.col("__va"), F.col("__vb")).alias("__sim"),
        )
    )
    if driver_pair_threshold > 0:
        # bounded driver fast path (the dup_components_auto /
        # bpe_train driver-threshold pattern): the greedy recursion is
        # inherently sequential, and the distributed unrolling costs
        # ~k eager localCheckpoint actions of cluster round-trips over
        # RESULT-sized frames. Below the threshold the same recursion
        # runs on the driver over the COLLECTED candidate/similarity
        # rows — relevance, cosines and the selection score are the
        # identical IEEE doubles Spark computed, the penalty is the
        # same max-over-selected with the same join-eligibility rule,
        # ties break by the same doc_id ascending, and the output
        # rounding stays a Spark expression — so the selection is
        # bit-identical to the distributed route (pinned by pytest on
        # both routes). Above the threshold the distributed rounds run
        # unchanged; pass driver_pair_threshold=0 to force them.
        pair_rows = csim_plan.limit(driver_pair_threshold + 1).collect()
        if len(pair_rows) <= driver_pair_threshold:
            return _mmr_driver(cand, pair_rows, k, lam)
    csim = csim_plan.localCheckpoint(eager=True)

    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("__rel").desc(), F.col("doc_id").asc()
    )
    selected = (
        cand.withColumn("__rn", F.row_number().over(w_rel))
        .where(F.col("__rn") == 1)
        .select(
            "query_id", "doc_id", "__rel", F.lit(1).alias("__step")
        )
        .localCheckpoint(eager=True)
    )
    for step in range(2, k + 1):
        pen = (
            csim.join(
                selected.select(
                    "query_id", F.col("doc_id").alias("__b")
                ),
                ["query_id", "__b"],
            )
            .groupBy("query_id", "__a")
            .agg(F.max("__sim").alias("__pen"))
        )
        rest = cand.join(
            selected.select("query_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_anti",
        )
        score = F.lit(lam) * F.col("__rel") - F.lit(1.0 - lam) * F.col(
            "__pen"
        )
        w_mmr = Window.partitionBy("query_id").orderBy(
            score.desc(), F.col("doc_id").asc()
        )
        top = (
            rest.join(
                pen,
                (rest["query_id"] == pen["query_id"])
                & (rest["doc_id"] == pen["__a"]),
            )
            .select(
                rest["query_id"], "doc_id", "__rel", pen["__pen"]
            )
            .withColumn("__rn", F.row_number().over(w_mmr))
            .where(F.col("__rn") == 1)
            .select(
                "query_id", "doc_id", "__rel", F.lit(step).alias("__step")
            )
        )
        selected = selected.union(top).localCheckpoint(eager=True)
    return selected.select(
        "query_id",
        "doc_id",
        F.col("__step").cast("int").alias("mmr_rank"),
        F.round("__rel", 6).alias("relevance"),
    )
