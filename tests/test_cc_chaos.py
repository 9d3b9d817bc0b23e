"""Chaos/property tests for the distributed connected-components path
(VERDICT r04 #7): ``star_components`` is log-proven at 10M rows but its
convergence and labels were only unit-pinned. Here random graphs across
20 seeds — chains (worst diameter), stars, cliques with bridges,
Erdős–Rényi, plus planted self-pairs and isolated nodes — are compared
node-for-node against the driver union-find ground truth, and one
100k-edge graph exercises the size class the 10M run hit.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_genson_spark.operators.dedup import (
    _driver_union_find,
    star_components,
)


def _ground_truth(edges: list[tuple[int, int]]) -> dict[int, int]:
    real = [(a, b) for a, b in edges if a != b]
    truth = dict(_driver_union_find(real))
    for a, b in edges:  # self-pair-only nodes label themselves
        for n in (a, b):
            if n not in truth:
                truth[n] = n
    return truth


def _check(spark, edges: list[tuple[int, int]]) -> None:
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in star_components(pairs).collect()
    }
    truth = _ground_truth(edges)
    assert got == truth


def _random_graph(seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    shape = seed % 4
    edges: list[tuple[int, int]] = []
    if shape == 0:
        # long chains: the diameter case star rounds exist for. Several
        # chains with randomly permuted (non-monotone) node ids.
        for c in range(3):
            n = int(rng.integers(50, 400))
            ids = rng.permutation(10_000)[:n] + c * 10_000
            edges += list(zip(ids[:-1].tolist(), ids[1:].tolist()))
    elif shape == 1:
        # hub stars sharing random bridge edges
        for c in range(4):
            hub = int(rng.integers(0, 1_000)) + c * 10_000
            leaves = rng.integers(0, 10_000, size=200) + c * 10_000
            edges += [(hub, int(v)) for v in leaves]
        for _ in range(3):
            edges.append(
                (int(rng.integers(0, 40_000)), int(rng.integers(0, 40_000)))
            )
    elif shape == 2:
        # dense cliques with one bridge
        for c in range(3):
            nodes = (rng.permutation(5_000)[:30] + c * 10_000).tolist()
            edges += [
                (int(a), int(b)) for a in nodes for b in nodes if a < b
            ]
        edges.append((edges[0][0], edges[-1][0]))
    else:
        # Erdős–Rényi-ish: random pairs over a sparse id space
        m = int(rng.integers(500, 2_000))
        a = rng.integers(0, 3_000, size=m)
        b = rng.integers(0, 3_000, size=m)
        edges += list(zip(a.tolist(), b.tolist()))
    # planted degenerates in every shape: self-pairs (isolated and
    # cluster-member), duplicate edges, reversed duplicates
    edges.append((999_999, 999_999))
    if edges:
        u, v = edges[0]
        edges += [(u, u), (u, v), (v, u)]
    return edges


@pytest.mark.parametrize("seed", range(20))
def test_star_components_matches_union_find(spark, seed):
    _check(spark, _random_graph(seed))


def test_star_components_100k_edges(spark):
    """One run at the 10M-corpus edge-set size class: 100k random edges
    over 150k nodes (supercritical — a giant component plus fragments),
    with a planted 2,000-node chain threaded through random ids so the
    input graph's diameter is ≥2,000 while star rounds stay O(log n)."""
    rng = np.random.default_rng(404)
    a = rng.integers(0, 150_000, size=98_000)
    b = rng.integers(0, 150_000, size=98_000)
    edges = list(zip(a.tolist(), b.tolist()))
    chain = (rng.permutation(1_000_000)[:2_000] + 1_000_000).tolist()
    edges += list(zip(chain[:-1], chain[1:]))
    pairs = spark.createDataFrame(
        [(int(x), int(y)) for x, y in edges], "id_a long, id_b long"
    )
    out = star_components(pairs).persist()
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    out.unpersist()
    truth = _ground_truth(edges)
    assert got == truth
    # the planted chain resolved to ONE label (min of its ids)
    chain_labels = {got[n] for n in chain}
    assert chain_labels == {min(chain)}
