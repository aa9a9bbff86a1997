"""Embedding similarity: brute-force top-k vs a numpy reference, LSH
candidate soundness (exact rescoring, subset of brute force), near-dup
variants (operators/similarity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.similarity import (
    cosine,
    cosine_topk_arrow,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_pq,
    embedding_near_dup_block_gemm,
    embedding_near_dup_auto,
    embedding_near_dup_bruteforce,
    embedding_near_dup_pairs,
    plan_near_dup,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N, DIM))
    v[1] = v[0] + 0.01 * rng.standard_normal(DIM)  # planted near-dup
    v[2] = -v[0]
    return v


@pytest.fixture(scope="module")
def emb(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _np_cosine(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0


def test_bruteforce_topk_matches_numpy(emb, vectors):
    qids = [0, 5, 9]
    got = cosine_topk_bruteforce(
        emb, emb.where(F.col("vec_id").isin(qids)), id_col="vec_id", k=4
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q in qids:
        rows = sorted(by_q[q], key=lambda r: r.rank)
        sims = sorted(
            ((_np_cosine(vectors[q], vectors[i]), -i) for i in range(N) if i != q),
            reverse=True,
        )[:4]
        expect = [(-i, s) for s, i in sims]
        for r, (nid, s) in zip(rows, expect):
            assert r.neighbor_id == nid
            assert abs(r.cosine_sim - s) < 1e-9
    assert all(len(v) == 4 for v in by_q.values())


def test_bruteforce_planted_neighbor(emb):
    top1 = (
        cosine_topk_bruteforce(emb, emb.where(F.col("vec_id") == 0), id_col="vec_id", k=1)
        .first()
    )
    assert top1.neighbor_id == 1 and top1.cosine_sim > 0.99


def test_lsh_topk_is_exactly_rescored_subset(emb):
    brute = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in cosine_topk_bruteforce(
            emb, emb.where(F.col("vec_id") < 6), id_col="vec_id", k=N
        ).collect()
    }
    lsh = cosine_topk_lsh(
        emb, emb.where(F.col("vec_id") < 6), dim=DIM, id_col="vec_id", k=5
    ).collect()
    assert lsh  # nonempty retrieval
    for r in lsh:
        # candidates only from real corpus pairs, scored EXACTLY
        assert abs(brute[(r.query_id, r.neighbor_id)] - r.cosine_sim) < 1e-12


def test_arrow_topk_bounds_query_side(emb):
    with pytest.raises(ValueError, match="max_queries"):
        cosine_topk_arrow(emb, emb, id_col="vec_id", k=2, max_queries=5)


def test_arrow_topk_skips_null_corpus_vectors(spark, emb):
    # a null embedding in the corpus must be skipped, not crash the UDF
    withnull = emb.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id bigint, embedding array<double>"
        )
    )
    out = cosine_topk_arrow(
        withnull, emb.where(F.col("vec_id") == 0), id_col="vec_id", k=100
    ).collect()
    assert all(r.neighbor_id != 999 for r in out)
    assert len(out) == N - 1  # everyone else scored


def test_block_gemm_matches_bruteforce_exactly(emb):
    # the tiled GEMM is the same EXACT operator: identical pair set at
    # every threshold, sims equal to the fold's within float noise;
    # multiple block counts exercise diagonal + off-diagonal tiles
    for threshold in (0.2, 0.5, 0.95):
        brute = {
            (r.id_a, r.id_b): r.cosine_sim
            for r in embedding_near_dup_bruteforce(
                emb, id_col="vec_id", threshold=threshold
            ).collect()
        }
        for blocks in (1, 4, 16):
            gemm = {
                (r.id_a, r.id_b): r.cosine_sim
                for r in embedding_near_dup_block_gemm(
                    emb, id_col="vec_id", threshold=threshold, blocks=blocks
                ).collect()
            }
            assert gemm.keys() == brute.keys(), (threshold, blocks)
            for p in brute:
                assert abs(gemm[p] - brute[p]) < 1e-9


def test_lsh_recall_of_planted_near_dup(emb):
    lsh = cosine_topk_lsh(
        emb, emb.where(F.col("vec_id") == 0), dim=DIM, id_col="vec_id", k=3
    ).collect()
    # near-identical vector shares every hyperplane sign bucket
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in lsh)


def test_near_dup_brute_and_lsh_agree_on_planted_pair(emb):
    brute = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_bruteforce(
            emb, id_col="vec_id", threshold=0.95
        ).collect()
    }
    assert (0, 1) in brute
    lsh = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_pairs(
            emb, dim=DIM, id_col="vec_id", threshold=0.95
        ).collect()
    }
    assert (0, 1) in lsh
    assert abs(lsh[(0, 1)] - brute[(0, 1)]) < 1e-12
    # LSH pairs are a sound subset: every reported pair is a true pair
    for p, s in lsh.items():
        assert abs(brute[p] - s) < 1e-12


def test_arrow_gemm_matches_jvm_fold(emb):
    """The vectorized scorer is a drop-in for the JVM fold: same pairs,
    same ranks, same similarities to 1e-9."""
    q = emb.where(F.col("vec_id") < 4)
    jvm = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine_sim)
        for r in cosine_topk_bruteforce(emb, q, id_col="vec_id", k=6).collect()
    }
    arrow = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine_sim)
        for r in cosine_topk_arrow(emb, q, id_col="vec_id", k=6).collect()
    }
    assert set(jvm) == set(arrow)
    for key in jvm:
        assert jvm[key][0] == arrow[key][0]
        assert abs(jvm[key][1] - arrow[key][1]) < 1e-9


def test_cosine_zero_norm_guard(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).first().c == 0.0


def test_opposite_vectors(emb, vectors):
    got = (
        embedding_near_dup_bruteforce(emb, id_col="vec_id", threshold=0.95)
        .where((F.col("id_a") == 0) & (F.col("id_b") == 2))
        .collect()
    )
    assert got == []  # cosine(v, -v) = -1 never passes a 0.95 threshold


# ---------------------------------------------------------------------------
# self-sizing planner (plan_near_dup / embedding_near_dup_auto)
# ---------------------------------------------------------------------------


def test_planner_low_threshold_routes_to_exact_gemm():
    """At a low threshold banding is non-selective (p≈0.63/bit): no
    band width keeps background candidates sub-quadratic, so the
    planner must pick the exact block-GEMM — the round-3 verdict's
    regime, now decided analytically instead of benchmarked into a
    docstring."""
    plan = plan_near_dup(n=2_000, dim=64, threshold=0.4)
    assert plan.strategy == "gemm"


def test_planner_small_corpus_routes_to_exact_gemm():
    # n² is tiny — exact wins below the LSH per-row overhead floor
    assert plan_near_dup(n=100, dim=64, threshold=0.95).strategy == "gemm"


def test_planner_large_corpus_high_threshold_routes_to_lsh():
    plan = plan_near_dup(n=1_000_000, dim=64, threshold=0.95)
    assert plan.strategy == "lsh"
    assert plan.bands * plan.bits_per_band == plan.nbits
    assert plan.est_cost < plan.est_cost_gemm


def test_planner_candidates_stay_subquadratic():
    """The sizing guarantee itself: background candidate volume grows
    at most linearly in n (≤ cand_per_row · n), and the signature
    width GROWS with the corpus — the fixed-nbits degeneration the
    scale smoke recorded in round 3 cannot happen by construction."""
    cap = 32.0
    widths = []
    for n in (10**5, 10**6, 10**7):
        plan = plan_near_dup(n=n, dim=64, threshold=0.95, cand_per_row=cap)
        assert plan.strategy == "lsh"
        assert plan.est_bg_candidates <= cap * n
        widths.append(plan.bits_per_band)
    assert widths == sorted(widths) and widths[-1] > widths[0]


def test_planner_recall_sizing_math():
    """bands must actually deliver the recall target at the threshold:
    1 − (1 − p^r)^b ≥ recall with p the Goemans–Williamson bit
    agreement probability."""
    import math

    recall, t = 0.999, 0.95
    plan = plan_near_dup(n=1_000_000, dim=64, threshold=t, recall=recall)
    p = 1.0 - math.acos(t) / math.pi
    achieved = 1.0 - (1.0 - p**plan.bits_per_band) ** plan.bands
    assert achieved >= recall


def test_auto_route_matches_bruteforce_exactly(emb):
    """The auto front door at this corpus/threshold routes to the
    exact GEMM, so its output must equal the all-pairs brute force
    bit-for-bit."""
    got = {
        (r.id_a, r.id_b, round(r.cosine_sim, 9))
        for r in embedding_near_dup_auto(
            emb, dim=DIM, id_col="vec_id", threshold=0.4
        ).collect()
    }
    want = {
        (r.id_a, r.id_b, round(r.cosine_sim, 9))
        for r in embedding_near_dup_bruteforce(
            emb, id_col="vec_id", threshold=0.4
        ).collect()
    }
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# IVF (cosine_topk_ivf)
# ---------------------------------------------------------------------------


def test_ivf_is_exactly_rescored_subset(emb, vectors):
    """Every (query, neighbor) the IVF returns must carry the EXACT
    cosine — approximation lives only in which candidates are probed,
    never in the scores."""
    got = cosine_topk_ivf(
        emb, emb.where(F.col("vec_id").isin([0, 5])), dim=DIM,
        id_col="vec_id", k=4, n_cells=8, n_probe=3,
    ).collect()
    assert got, "no candidates probed"
    for r in got:
        assert abs(r.cosine_sim - _np_cosine(vectors[r.query_id], vectors[r.neighbor_id])) < 1e-9


def test_ivf_full_probe_equals_bruteforce(emb):
    """n_probe == n_cells degenerates to exact brute force."""
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk_ivf(
            emb, emb.where(F.col("vec_id") < 3), dim=DIM,
            id_col="vec_id", k=4, n_cells=8, n_probe=8,
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk_bruteforce(
            emb, emb.where(F.col("vec_id") < 3), id_col="vec_id", k=4
        ).collect()
    }
    assert got == want


def test_ivf_finds_planted_near_dup(emb):
    """vec 1 is a tiny perturbation of vec 0 — they quantize to the
    same cell, so even a 1-probe search must surface it at rank 1."""
    got = cosine_topk_ivf(
        emb, emb.where(F.col("vec_id") == 0), dim=DIM,
        id_col="vec_id", k=1, n_cells=8, n_probe=1,
    ).collect()
    assert len(got) == 1 and got[0].neighbor_id == 1


def test_ivf_centroid_training_is_deterministic():
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.similarity import (
        _train_centroids,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((200, 8))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    a = _train_centroids(X, 16)
    b = _train_centroids(X, 16)
    assert (a == b).all()  # bit-identical, not just close


# ---------------------------------------------------------------------------
# PQ (cosine_topk_pq)
# ---------------------------------------------------------------------------


def test_pq_is_exactly_rescored_subset(emb, vectors):
    """Approximation lives only in WHICH candidates survive the ADC
    cut — every returned score is the exact cosine."""
    got = cosine_topk_pq(
        emb, emb.where(F.col("vec_id").isin([0, 5])), dim=DIM,
        id_col="vec_id", k=4, m=4, k_codes=8, n_candidates=10,
    ).collect()
    assert got, "no candidates survived"
    for r in got:
        assert (
            abs(
                r.cosine_sim
                - _np_cosine(vectors[r.query_id], vectors[r.neighbor_id])
            )
            < 1e-9
        )


def test_pq_full_candidate_cut_equals_bruteforce(emb):
    """n_candidates >= |corpus| keeps everything through the ADC cut,
    so exact rescoring must reproduce brute force bit-for-bit —
    regardless of codebook quality."""
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk_pq(
            emb, emb.where(F.col("vec_id") < 3), dim=DIM,
            id_col="vec_id", k=4, m=4, k_codes=8, n_candidates=N,
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk_bruteforce(
            emb, emb.where(F.col("vec_id") < 3), id_col="vec_id", k=4
        ).collect()
    }
    assert got == want


def test_pq_finds_planted_near_dup(emb):
    """vec 1 is a tiny perturbation of vec 0: its subvectors quantize
    to the same codes, so its ADC score ties the maximum and it must
    survive even a tight candidate cut and rank first on rescoring."""
    got = cosine_topk_pq(
        emb, emb.where(F.col("vec_id") == 0), dim=DIM,
        id_col="vec_id", k=1, m=4, k_codes=8, n_candidates=5,
    ).collect()
    assert len(got) == 1 and got[0].neighbor_id == 1


def test_pq_recall_at_modest_candidates(emb):
    """Quality pin for the kmeans default: top-5 recall vs brute force
    with a 20-of-59 candidate cut. Not a tautology (the cut is real);
    the floor is what the seeded corpus actually achieves, minus
    slack."""
    qf = F.col("vec_id") < 10
    got = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_pq(
            emb, emb.where(qf), dim=DIM, id_col="vec_id",
            k=5, m=4, k_codes=8, n_candidates=20,
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(
            emb, emb.where(qf), id_col="vec_id", k=5
        ).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"PQ recall degraded: {recall:.2f}"


def test_pq_codebook_training_is_deterministic():
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        _train_pq_codebooks,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((200, 16))
    a = _train_pq_codebooks(X, m=4, k_codes=8)
    b = _train_pq_codebooks(X, m=4, k_codes=8)
    assert (a == b).all()


def test_pq_validates_parameters(emb):
    with pytest.raises(ValueError, match="divisible"):
        cosine_topk_pq(emb, emb, dim=DIM, m=5)
    with pytest.raises(ValueError, match="n_candidates"):
        cosine_topk_pq(emb, emb, dim=DIM, m=4, k=10, n_candidates=5)


# ---------------------------------------------------------------------------
# persisted PQ code table (pq_train / pq_encode / cosine_topk_pq_codes)
# ---------------------------------------------------------------------------


def _rows_set(df):
    return {
        (r.query_id, r.neighbor_id, r.rank, round(r.cosine_sim, 9))
        for r in df.collect()
    }


def test_pq_codes_parquet_roundtrip_equals_inline(emb, spark, tmp_path):
    """The whole point of pq_encode: build the code table ONCE, persist
    it, and the codes-scan query path must be value-identical to the
    encode-in-scan path with the same quantizer — through a REAL
    parquet write/read, not an in-memory shortcut."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_pq_codes,
        pq_encode,
        pq_train,
    )

    qf = F.col("vec_id") < 8
    model = pq_train(emb, dim=DIM, m=4, k_codes=8, id_col="vec_id")
    path = str(tmp_path / "codes.parquet")
    pq_encode(emb, model, id_col="vec_id").write.parquet(path)
    codes = spark.read.parquet(path)
    got = cosine_topk_pq_codes(
        codes, model, emb, emb.where(qf), id_col="vec_id",
        k=5, n_candidates=20,
    )
    want = cosine_topk_pq(
        emb, emb.where(qf), dim=DIM, id_col="vec_id",
        k=5, m=4, k_codes=8, n_candidates=20,
    )
    assert _rows_set(got) == _rows_set(want)


def test_pq_encode_schema_and_code_range(emb, spark):
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    model = pq_train(emb, dim=DIM, m=4, k_codes=8, id_col="vec_id")
    codes = pq_encode(emb, model, id_col="vec_id")
    assert dict(codes.dtypes) == {"id": "bigint", "codes": "array<smallint>"}
    rows = codes.collect()
    assert len(rows) == N
    for r in rows:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)


def test_pq_null_query_rows_do_not_count_toward_max_queries(emb, spark):
    """Round-9 advice: null-embedding query rows used to trip the
    max_queries overflow check even when few usable vectors exist."""
    nulls = spark.createDataFrame(
        [(1000 + i, None) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") < 3).unionByName(nulls)
    got = cosine_topk_pq(
        emb, q, dim=DIM, id_col="vec_id",
        k=5, m=4, k_codes=8, n_candidates=20, max_queries=5,
    )
    want = cosine_topk_pq(
        emb, emb.where(F.col("vec_id") < 3), dim=DIM, id_col="vec_id",
        k=5, m=4, k_codes=8, n_candidates=20,
    )
    assert _rows_set(got) == _rows_set(want)
    got_a = cosine_topk_arrow(
        emb, q, id_col="vec_id", k=5, max_queries=5
    )
    want_a = cosine_topk_arrow(
        emb, emb.where(F.col("vec_id") < 3), id_col="vec_id", k=5
    )
    assert _rows_set(got_a) == _rows_set(want_a)


# ---------------------------------------------------------------------------
# IVFADC (cosine_topk_ivfpq)
# ---------------------------------------------------------------------------


def test_ivfpq_is_exactly_rescored_subset(emb, vectors):
    """Every (query, neighbor) IVFADC returns carries the EXACT cosine
    (rescored), and is a subset of the all-pairs universe."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    got = cosine_topk_ivfpq(
        emb, emb.where(F.col("vec_id") < 6), dim=DIM, id_col="vec_id",
        k=5, n_cells=8, n_probe=3, m=4, k_codes=8, n_candidates=20,
    ).collect()
    assert got
    for r in got:
        assert r.cosine_sim == pytest.approx(
            _np_cosine(vectors[r.query_id], vectors[r.neighbor_id]),
            abs=1e-9,
        )
        assert r.neighbor_id != r.query_id


def test_ivfpq_full_probe_full_candidates_equals_bruteforce(emb):
    """n_probe == n_cells and n_candidates >= |corpus| degenerate the
    composition to exact-rescored-everything — must equal brute force
    exactly (ranks, ties, everything)."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    qf = F.col("vec_id") < 5
    got = cosine_topk_ivfpq(
        emb, emb.where(qf), dim=DIM, id_col="vec_id",
        k=4, n_cells=4, n_probe=4, m=4, k_codes=8, n_candidates=N,
    )
    want = cosine_topk_bruteforce(emb, emb.where(qf), id_col="vec_id", k=4)
    assert _rows_set(got) == _rows_set(want)


def test_ivfpq_finds_planted_near_dup(emb):
    """vec 1 is a planted near-dup of vec 0 — the composed pruning
    (probed cells × ADC candidates) must still surface it at rank 1."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    got = cosine_topk_ivfpq(
        emb, emb.where(F.col("vec_id") == 0), dim=DIM, id_col="vec_id",
        k=3, n_cells=8, n_probe=4, m=4, k_codes=8, n_candidates=20,
    ).collect()
    top = next(r for r in got if r.rank == 1)
    assert top.neighbor_id == 1
    assert top.cosine_sim > 0.99


def test_ivfpq_residual_mode_is_exactly_rescored_subset(emb, vectors):
    """residuals=True (Jégou §IV-A): same output contract — every
    returned pair carries the exact rescored cosine."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    got = cosine_topk_ivfpq(
        emb, emb.where(F.col("vec_id") < 6), dim=DIM, id_col="vec_id",
        k=5, n_cells=8, n_probe=3, m=4, k_codes=8, n_candidates=20,
        residuals=True,
    ).collect()
    assert got
    for r in got:
        assert r.cosine_sim == pytest.approx(
            _np_cosine(vectors[r.query_id], vectors[r.neighbor_id]),
            abs=1e-9,
        )


def test_ivfpq_residual_full_probe_full_candidates_equals_bruteforce(emb):
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    qf = F.col("vec_id") < 5
    got = cosine_topk_ivfpq(
        emb, emb.where(qf), dim=DIM, id_col="vec_id",
        k=4, n_cells=4, n_probe=4, m=4, k_codes=8, n_candidates=N,
        residuals=True,
    )
    want = cosine_topk_bruteforce(emb, emb.where(qf), id_col="vec_id", k=4)
    assert _rows_set(got) == _rows_set(want)


def test_ivfpq_residual_recall_and_planted_near_dup(emb):
    """Quality pin for the residual refinement: top-5 recall vs brute
    force at modest parameters, and the planted near-dup surfaces at
    rank 1."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    qf = F.col("vec_id") < 10
    got = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivfpq(
            emb, emb.where(qf), dim=DIM, id_col="vec_id",
            k=5, n_cells=8, n_probe=4, m=4, k_codes=8, n_candidates=20,
            residuals=True,
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(
            emb, emb.where(qf), id_col="vec_id", k=5
        ).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"residual IVFADC recall degraded: {recall:.2f}"

    top = next(
        r
        for r in cosine_topk_ivfpq(
            emb, emb.where(F.col("vec_id") == 0), dim=DIM, id_col="vec_id",
            k=3, n_cells=8, n_probe=4, m=4, k_codes=8, n_candidates=20,
            residuals=True,
        ).collect()
        if r.rank == 1
    )
    assert top.neighbor_id == 1 and top.cosine_sim > 0.99


def test_ivfpq_codes_partitioned_roundtrip_equals_inline(emb, spark, tmp_path):
    """The persisted IVFADC table: encode once, write PARTITIONED BY
    CELL, and the codes-scan query must (a) be value-identical to the
    inline encode-in-scan path with the same model, in both residual
    modes, and (b) push the probe-set union down as a partition
    filter — the scan's ReadSchema carries only (id, codes) because
    `cell` is partition metadata, which is the literal 100 TB pruning
    story."""
    import contextlib
    import io

    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
        cosine_topk_ivfpq_codes,
        ivfpq_encode,
        ivfpq_train,
    )

    qf = F.col("vec_id") < 6
    for residuals in (False, True):
        model = ivfpq_train(
            emb, dim=DIM, n_cells=8, m=4, k_codes=8, id_col="vec_id",
            residuals=residuals,
        )
        path = str(tmp_path / f"ivfpq_{residuals}")
        ivfpq_encode(emb, model, id_col="vec_id").write.partitionBy(
            "cell"
        ).parquet(path)
        table = spark.read.parquet(path)
        got = cosine_topk_ivfpq_codes(
            table, model, emb, emb.where(qf), id_col="vec_id",
            k=5, n_probe=3, n_candidates=20,
        )
        want = cosine_topk_ivfpq(
            emb, emb.where(qf), dim=DIM, id_col="vec_id",
            k=5, n_cells=8, n_probe=3, m=4, k_codes=8, n_candidates=20,
            residuals=residuals,
        )
        assert _rows_set(got) == _rows_set(want), f"residuals={residuals}"

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters: [cell" in plan
        assert "struct<id:bigint,codes:array<smallint>>" in plan

        # one query at n_probe=2 must prune to exactly its two probed
        # cell directories — the filter carries 2 cells, not all 8
        one = cosine_topk_ivfpq_codes(
            table, model, emb, emb.where(F.col("vec_id") == 0),
            id_col="vec_id", k=3, n_probe=2, n_candidates=10,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            one.explain("formatted")
        pf = next(
            ln for ln in buf.getvalue().splitlines()
            if "PartitionFilters: [cell" in ln
        )
        in_list = pf.split("IN (")[1].split(")")[0]
        assert len(in_list.split(",")) == 2, pf


def test_packed_codes_parity_and_validation(emb, spark, tmp_path):
    """packed=True stores each row's codes as one m-byte binary — both
    query paths must dispatch on the column type and return exactly
    what the array<smallint> representation returns."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq_codes,
        cosine_topk_pq_codes,
        ivfpq_encode,
        ivfpq_train,
        pq_encode,
        pq_train,
    )

    qf = F.col("vec_id") < 6
    model = pq_train(emb, dim=DIM, m=4, k_codes=8, id_col="vec_id")
    p1 = str(tmp_path / "arr")
    p2 = str(tmp_path / "bin")
    pq_encode(emb, model, id_col="vec_id").write.parquet(p1)
    pq_encode(emb, model, id_col="vec_id", packed=True).write.parquet(p2)
    t_bin = spark.read.parquet(p2)
    assert dict(t_bin.dtypes)["codes"] == "binary"
    a = cosine_topk_pq_codes(
        spark.read.parquet(p1), model, emb, emb.where(qf),
        id_col="vec_id", k=5, n_candidates=20,
    )
    b = cosine_topk_pq_codes(
        t_bin, model, emb, emb.where(qf),
        id_col="vec_id", k=5, n_candidates=20,
    )
    assert _rows_set(a) == _rows_set(b)

    ivf = ivfpq_train(
        emb, dim=DIM, n_cells=8, m=4, k_codes=8, id_col="vec_id",
        residuals=True,
    )
    p3 = str(tmp_path / "ivf_bin")
    ivfpq_encode(emb, ivf, id_col="vec_id", packed=True).write.partitionBy(
        "cell"
    ).parquet(p3)
    c = cosine_topk_ivfpq_codes(
        spark.read.parquet(p3), ivf, emb, emb.where(qf),
        id_col="vec_id", k=5, n_probe=3, n_candidates=20,
    )
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq,
    )

    d = cosine_topk_ivfpq(
        emb, emb.where(qf), dim=DIM, id_col="vec_id",
        k=5, n_cells=8, n_probe=3, m=4, k_codes=8, n_candidates=20,
        residuals=True,
    )
    assert _rows_set(c) == _rows_set(d)

    big = pq_train(emb, dim=DIM, m=4, k_codes=8, id_col="vec_id")._replace(
        k_codes=300
    )
    with pytest.raises(ValueError, match="256"):
        pq_encode(emb, big, id_col="vec_id", packed=True)


def test_model_json_roundtrip_reproduces_queries(emb, spark, tmp_path):
    """The persisted-model story: serialize PQ/IVFPQ models to JSON
    (the artifact that lives next to the code table), load them back,
    and the loaded models must reproduce encode + query results
    bit-for-bit."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        cosine_topk_ivfpq_codes,
        cosine_topk_pq_codes,
        ivfpq_encode,
        ivfpq_model_from_json,
        ivfpq_model_to_json,
        ivfpq_train,
        pq_encode,
        pq_model_from_json,
        pq_model_to_json,
        pq_train,
    )

    qf = F.col("vec_id") < 5
    model = pq_train(emb, dim=DIM, m=4, k_codes=8, id_col="vec_id")
    loaded = pq_model_from_json(pq_model_to_json(model))
    assert (loaded.codebooks == model.codebooks).all()
    path = str(tmp_path / "codes")
    pq_encode(emb, model, id_col="vec_id").write.parquet(path)
    t = spark.read.parquet(path)
    a = cosine_topk_pq_codes(
        t, model, emb, emb.where(qf), id_col="vec_id", k=4, n_candidates=15
    )
    b = cosine_topk_pq_codes(
        t, loaded, emb, emb.where(qf), id_col="vec_id", k=4, n_candidates=15
    )
    assert _rows_set(a) == _rows_set(b)

    ivf = ivfpq_train(
        emb, dim=DIM, n_cells=8, m=4, k_codes=8, id_col="vec_id",
        residuals=True,
    )
    ivf_loaded = ivfpq_model_from_json(ivfpq_model_to_json(ivf))
    assert (ivf_loaded.coarse == ivf.coarse).all()
    assert ivf_loaded.residuals is True
    p2 = str(tmp_path / "ivf")
    ivfpq_encode(emb, ivf, id_col="vec_id").write.partitionBy(
        "cell"
    ).parquet(p2)
    t2 = spark.read.parquet(p2)
    c = cosine_topk_ivfpq_codes(
        t2, ivf, emb, emb.where(qf), id_col="vec_id",
        k=4, n_probe=3, n_candidates=15,
    )
    d = cosine_topk_ivfpq_codes(
        t2, ivf_loaded, emb, emb.where(qf), id_col="vec_id",
        k=4, n_probe=3, n_candidates=15,
    )
    assert _rows_set(c) == _rows_set(d)

    with pytest.raises(ValueError, match="kind"):
        pq_model_from_json(ivfpq_model_to_json(ivf))
    with pytest.raises(ValueError, match="kind"):
        ivfpq_model_from_json(pq_model_to_json(model))


def test_running_topc_boundary_ties_and_contract():
    """The composite-key accumulator: boundary ties keep the LOWEST
    ids (the oracle's (score desc, id asc) order), masked cells never
    enter, multi-batch merging is exact, and out-of-domain ids fail
    loud with the remedy."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.similarity import (
        _RunningTopC,
    )

    acc = _RunningTopC(np.array([7], dtype=np.int64), 3)
    # batch 1: four candidates all tied at 0.5 → keep ids 1,2,3
    acc.update(
        np.round(np.full((1, 4), 0.5), 6),
        np.array([4, 3, 2, 1], dtype=np.int64),
        np.ones((1, 4), dtype=bool),
    )
    # batch 2: id 0 ties at 0.5 (displaces id 3), id 9 scores higher
    acc.update(
        np.round(np.array([[0.5, 0.9]]), 6),
        np.array([0, 9], dtype=np.int64),
        np.ones((1, 2), dtype=bool),
    )
    got = sorted(
        (r.approx_sim, r.neighbor_id)
        for r in acc.emit().itertuples()
    )
    assert got == [(0.5, 0), (0.5, 1), (0.9, 9)]

    # masked cells are invisible
    acc2 = _RunningTopC(np.array([1], dtype=np.int64), 2)
    acc2.update(
        np.round(np.array([[0.9, 0.1]]), 6),
        np.array([5, 6], dtype=np.int64),
        np.array([[False, True]]),
    )
    assert [r.neighbor_id for r in acc2.emit().itertuples()] == [6]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="2\\^32"):
        acc2.update(
            np.array([[0.5]]),
            np.array([1 << 33], dtype=np.int64),
            np.ones((1, 1), dtype=bool),
        )


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-prune semantic dedup)
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.similarity import semantic_dedup


def _semdedup_corpus(spark):
    # ids 1 and 2 are the two axis directions — under
    # ``centroids="first"`` with n_cells=2 they ARE the centroids, so
    # the cells are the two directions; 3/4 are near-identical to
    # axis-0 (cos ≈ 1 to id 1), 11 is a noisy axis-1 (cos ≈ 0.89 to
    # id 2 — below a 0.95 threshold)
    import numpy as _np

    d = 8
    rows = []
    for vid, base, noise in [
        (1, 0, 0.0), (2, 1, 0.0), (3, 0, 0.01), (4, 0, 0.02),
        (11, 1, 0.5),
    ]:
        v = _np.zeros(d)
        v[base] = 1.0
        v[(base + 2) % d] = noise
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_semantic_dedup_drops_higher_ids_keeps_lowest(spark):
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _semdedup_corpus(spark), dim=8, n_cells=2, threshold=0.95,
            centroids="first",
        ).collect()
    }
    assert len(out) == 5
    assert out[1].kept and out[1].dup_of is None
    assert not out[3].kept and out[3].dup_of == 1
    assert not out[4].kept and out[4].dup_of == 1  # lowest qualifying id, not 3
    # sub-threshold within-cell pair survives on both sides
    assert out[2].kept and out[11].kept


def test_semantic_dedup_cross_cell_miss_is_documented_semantics(spark):
    # force 5 cells = every vector its own seed region; the 1/2 near-dup
    # pair still lands in ONE cell because assignment is by nearest
    # centroid, but a pair split across cells would NOT be compared —
    # replicate by making each point its own centroid (first-5): every
    # vector assigns to its own cell, so nothing is dropped
    out = semantic_dedup(
        _semdedup_corpus(spark), dim=8, n_cells=5, threshold=0.95,
        centroids="first",
    ).collect()
    assert all(r.kept for r in out)


def test_semantic_dedup_threshold_boundary_rounds_before_compare(spark):
    # two vectors whose cosine rounds to exactly the threshold: the
    # 6-digit-rounded value must qualify (>=), pinning the rounding
    # convention shared with the SQL oracle
    import numpy as _np

    a = [1.0, 0.0, 0.0, 0.0]
    # true cosine ≈ 0.9999988 < threshold 0.999999, but the 6-digit
    # round lands ON the threshold → must qualify (float32 storage
    # perturbs by ~1e-8, well inside the 5e-7 rounding band)
    theta = _np.arccos(0.9999988)
    b = [float(_np.cos(theta)), float(_np.sin(theta)), 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id bigint, embedding array<float>"
    )
    out = {r.vec_id: r for r in semantic_dedup(
        df, dim=4, n_cells=1, threshold=0.999999, centroids="first"
    ).collect()}
    assert not out[2].kept and out[2].dup_of == 1


# ---------------------------------------------------------------------------
# ANN recall evaluation
# ---------------------------------------------------------------------------

from etl_prometheus2clickhouse_spark.operators.similarity import (  # noqa: E402
    ann_recall,
)


def test_ann_recall_counts_overlap_per_query(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (3, 30)],
        "query_id bigint, neighbor_id bigint",
    )
    approx = spark.createDataFrame(
        # q1: 2/3 hit (13 is a false positive); q2: full hit;
        # q3: approx returned nothing at all
        [(1, 10), (1, 12), (1, 13), (2, 20), (2, 21)],
        "query_id bigint, neighbor_id bigint",
    )
    out = {r.query_id: r for r in ann_recall(exact, approx).collect()}
    assert len(out) == 3
    assert out[1].k == 3 and out[1].n_hit == 2
    assert abs(out[1].recall_at_k - round(2 / 3, 6)) < 1e-9
    assert out[2].recall_at_k == 1.0
    # a query the ANN missed entirely still appears, at recall 0
    assert out[3].k == 1 and out[3].n_hit == 0 and out[3].recall_at_k == 0.0


def test_ann_recall_ignores_extra_columns(spark):
    exact = spark.createDataFrame(
        [(1, 10, 5, 0.9)], "query_id bigint, neighbor_id bigint, rank int, cosine_sim double"
    )
    approx = spark.createDataFrame(
        [(1, 10, 0.8)], "query_id bigint, neighbor_id bigint, asim double"
    )
    row = ann_recall(exact, approx).collect()[0]
    assert row.n_hit == 1 and row.recall_at_k == 1.0


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        mmr_rerank,
    )

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.01]),   # near-duplicate of doc 1
            (3, [0.0, 1.0]),    # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(9, 1, 0.90), (9, 2, 0.89), (9, 3, 0.50)],
        "query_id long, doc_id long, relevance double",
    )
    # balanced lambda: pick 1 first, then the orthogonal 3 beats the
    # slightly-more-relevant near-dup 2
    sel = {
        r.mmr_rank: r.doc_id
        for r in mmr_rerank(cand, vecs, k=2, lam=0.5).collect()
    }
    assert sel == {1: 1, 2: 3}
    # pure-relevance lambda: redundancy is free, 2 wins step 2
    sel = {
        r.mmr_rank: r.doc_id
        for r in mmr_rerank(cand, vecs, k=2, lam=1.0).collect()
    }
    assert sel == {1: 1, 2: 2}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mmr_rerank(cand, vecs, k=0)
    with _pytest.raises(ValueError):
        mmr_rerank(cand, vecs, lam=1.5)


def test_mmr_rerank_driver_route_equals_distributed(spark):
    """The bounded driver fast path must reproduce the distributed
    unrolled rounds EXACTLY — same selections, same order, same
    rounded relevances — including ties, queries with fewer candidates
    than k, and a single-candidate query (which the distributed inner
    pen join stops after step 1)."""
    from etl_prometheus2clickhouse_spark.operators.similarity import (
        mmr_rerank,
    )

    vec_rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(4)])
        for i in range(1, 13)
    ]
    vecs = spark.createDataFrame(
        vec_rows, "vec_id long, embedding array<double>"
    )
    cand_rows = (
        # query 1: six candidates incl. a relevance tie (ids 3 vs 4)
        [(1, d, r) for d, r in [(1, 0.9), (2, 0.9), (3, 0.7),
                                (4, 0.7), (5, 0.5), (6, 0.4)]]
        # query 2: fewer candidates than k
        + [(2, d, r) for d, r in [(7, 0.8), (8, 0.6)]]
        # query 3: a single candidate — stops after step 1
        + [(3, 9, 0.3)]
    )
    cand = spark.createDataFrame(
        cand_rows, "query_id long, doc_id long, relevance double"
    )
    fast = mmr_rerank(cand, vecs, k=4, lam=0.6).collect()
    slow = mmr_rerank(
        cand, vecs, k=4, lam=0.6, driver_pair_threshold=0
    ).collect()
    key = lambda r: (r.query_id, r.mmr_rank)  # noqa: E731
    assert sorted(map(tuple, fast), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, slow), key=lambda t: (t[0], t[2])
    )
    # and the fast route actually took the driver path (it plans as a
    # local Arrow frame — no Window in the plan)
    plan = mmr_rerank(cand, vecs, k=4, lam=0.6)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "Window" not in plan
