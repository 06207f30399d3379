"""Focused pins for the r14 optimization-round graph rewrites.

Two operators changed internals this round (results must be identical):

- ``personalized_pagerank``: the per-round tel-vs-prop FULL OUTER join
  became unionAll + groupBy sum (and per-round checkpoints were
  dropped). Pinned here against a structurally different pure-Python
  dict recurrence of the documented integer arithmetic.
- ``triangle_participation`` / ``triangle_edge_counts``: the 3-way
  unionAll corner/edge credit became one explode. Pinned against a
  brute-force all-triples enumeration.

Literal graphs, exact integers — any divergence is a bug, not noise.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "u INT, v INT")


def _ppr_reference(edges, seeds, rounds):
    """Pure-Python third impl of the documented PPR recurrence:
    pr_0(v) = 1_000_000 * [v in seeds];
    pr_{i+1}(v) = 150_000 * [v in seeds]
                  + (17 * sum_{u~v} (pr_i(u) // deg(u))) // 20
    (all masses non-negative, so // matches Spark's div)."""
    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    deg = {n: len(ns) for n, ns in nbrs.items()}
    pr = {s: 1_000_000 for s in seeds}
    for _ in range(rounds):
        acc: dict[int, int] = {}
        for u, mass in pr.items():
            if u not in deg:
                continue
            share = mass // deg[u]
            for v in nbrs[u]:
                acc[v] = acc.get(v, 0) + share
        nxt = {s: 150_000 for s in seeds}
        for v, tot in acc.items():
            nxt[v] = nxt.get(v, 0) + (17 * tot) // 20
        pr = nxt
    return pr


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_ppr_union_sum_matches_python_recurrence(spark, rounds):
    from kinesis_stream_consumer_spark.operators.graph import (
        personalized_pagerank,
    )

    # small graph with a hub, a chain, an isolated seed, and a
    # seed-with-degree so every recurrence branch is exercised
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (7, 8)]
    seeds = [1, 5, 99]  # 99 never appears in the edge list
    got = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(
            _edges_df(spark, edges),
            spark.createDataFrame([(s,) for s in seeds], "node INT"),
            rounds=rounds,
        ).collect()
    }
    assert got == _ppr_reference(edges, seeds, rounds)


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    tris = [
        t
        for t in combinations(nodes, 3)
        if {tuple(sorted((t[0], t[1]))), tuple(sorted((t[0], t[2]))),
            tuple(sorted((t[1], t[2])))} <= es
    ]
    return es, tris


def test_triangle_explode_credit_matches_bruteforce(spark):
    from kinesis_stream_consumer_spark.operators.graph import (
        triangle_edge_counts,
        triangle_participation,
    )

    # two overlapping triangles + a pendant edge + a square (no diagonal)
    edges = [
        (1, 2), (1, 3), (2, 3),          # triangle A
        (2, 4), (3, 4),                  # triangle B shares edge (2,3)
        (4, 5),                          # pendant
        (6, 7), (7, 8), (8, 9), (6, 9),  # square, zero triangles
    ]
    es, tris = _brute_triangles(edges)

    per_node: dict[int, int] = {}
    per_edge: dict[tuple, int] = {}
    for a, b, c in tris:
        for n in (a, b, c):
            per_node[n] = per_node.get(n, 0) + 1
        for e in combinations((a, b, c), 2):
            e = tuple(sorted(e))
            per_edge[e] = per_edge.get(e, 0) + 1

    got_nodes = {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(_edges_df(spark, edges)).collect()
    }
    assert got_nodes == per_node

    got_edges = {
        (r["u"], r["v"]): r["common"]
        for r in triangle_edge_counts(_edges_df(spark, edges)).collect()
    }
    assert got_edges == per_edge


def test_co_edges_collect_set_matches_python_bruteforce(spark):
    """r14: the shared co-purchase edge build moved from distinct +
    self-join (two full-data exchanges) to ONE collect_set groupBy with
    pair generation from the per-order part array. Pin it end-to-end
    against a pure-Python recount from the raw parquet: support(u, v) =
    number of orders whose lineitems contain both parts, edge iff >= 2."""
    import pandas as pd

    from kinesis_stream_consumer_spark.plans.graph_shared import _co_edges

    sf_dir = "/root/testdata/sf0.001"
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    per_order: dict[int, set[int]] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        per_order.setdefault(int(ok), set()).add(int(pk))
    support: dict[tuple[int, int], int] = {}
    for parts in per_order.values():
        for u, v in combinations(sorted(parts), 2):
            support[(u, v)] = support.get((u, v), 0) + 1
    want = {e for e, c in support.items() if c >= 2}

    got = {(r["u"], r["v"]) for r in _co_edges(spark, sf_dir).collect()}
    assert got == want
