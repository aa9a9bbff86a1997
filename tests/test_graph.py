"""PageRank semantics pins (operators/graph.py): hand-checkable
two-node recurrence, conservation of total rank, dangling-mass
redistribution, and parameter validation."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_node_chain_hand_computed(spark):
    # A(1)->B(2); B dangling. r0 = 0.5 each.
    # iter1: A = 0.075 + 0.85*(0.5/2)        = 0.2875
    #        B = 0.075 + 0.85*(0.5 + 0.25)   = 0.7125
    # iter2: A = 0.075 + 0.85*(0.7125/2)             = 0.3778125
    #        B = 0.075 + 0.85*(0.2875 + 0.7125/2)    = 0.6221875
    out = {
        r.node_id: r.pagerank
        for r in pagerank(_edges(spark, [(1, 2)]), n_iter=2).collect()
    }
    assert out[1] == pytest.approx(0.3778125, abs=1e-12)
    assert out[2] == pytest.approx(0.6221875, abs=1e-12)


def test_rank_conserved_and_symmetric_cycle_uniform(spark):
    # a 3-cycle has the uniform stationary distribution at every
    # iteration; total rank is conserved exactly
    out = pagerank(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), n_iter=4
    ).collect()
    total = sum(r.pagerank for r in out)
    assert total == pytest.approx(1.0, abs=1e-9)
    for r in out:
        assert r.pagerank == pytest.approx(1 / 3, abs=1e-12)


def test_dangling_mass_redistributes(spark):
    # star into a sink: without dangling handling, total rank decays
    # toward the teleport floor; with it, the total stays 1
    out = pagerank(
        _edges(spark, [(1, 9), (2, 9), (3, 9)]), n_iter=5
    ).collect()
    assert sum(r.pagerank for r in out) == pytest.approx(1.0, abs=1e-9)
    ranks = {r.node_id: r.pagerank for r in out}
    assert ranks[9] > ranks[1]


def test_parameter_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(e, n_iter=0)
