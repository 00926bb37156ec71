"""Semantic tests for degree-ordered triangle counting.

Ground truth on hand graphs where every triangle is enumerable by eye;
plus the orientation invariants that make the algorithm scale (each
triangle found exactly once, hubs generate no wedges).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.graph import triangle_counts


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src LONG, dst LONG"
    )


def _counts(spark, pairs) -> dict[int, int]:
    df = triangle_counts(_edges_df(spark, pairs))
    return {r.node_id: r.tri_count for r in df.collect()}


def test_single_triangle(spark):
    got = _counts(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_square_has_no_triangles(spark):
    got = _counts(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert got == {}


def test_k4_every_node_in_three_triangles(spark):
    got = _counts(spark, list(combinations([1, 2, 3, 4], 2)))
    # K4 has C(4,3)=4 triangles; each node participates in 3 of them
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_duplicate_reverse_and_self_edges_canonicalized(spark):
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    got = _counts(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1}


def test_hub_star_plus_one_closure(spark):
    # star around 100 (degree 5) with exactly one rim edge closed:
    # only {100, 1, 2} is a triangle, no matter how large the hub is
    pairs = [(100, i) for i in range(1, 6)] + [(1, 2)]
    got = _counts(spark, pairs)
    assert got == {100: 1, 1: 1, 2: 1}


def test_matches_bruteforce_on_random_graph(spark):
    # deterministic pseudo-random graph (LCG, no random module state)
    n, edges, x = 30, set(), 7
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (2**31)
        a, b = x % n, (x // n) % n
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected: dict[int, int] = {}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    assert _counts(spark, sorted(edges)) == expected


def test_total_triangles_counted_once(spark):
    # sum of per-node counts must be exactly 3x the triangle count;
    # K5 has C(5,3)=10 triangles
    df = triangle_counts(_edges_df(spark, list(combinations(range(5), 2))))
    total = df.agg(F.sum("tri_count").alias("s")).collect()[0].s
    assert total == 30
