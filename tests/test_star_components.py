"""Property tests for the large-star/small-star connected-components
contraction (queries/sampling.py::star_components) against a pure-Python
union-find reference — the oracle gate checks one dataset; these check
the algorithm on random and adversarial graph shapes.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from shelf_spark.queries.sampling import star_components


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """node → min id of its component, for nodes appearing in pairs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_components(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "a long, b long")
    return {
        r["node"]: r["component"]
        for r in star_components(df, "a", "b").collect()
    }


def test_star_components_random_graphs(spark):
    for seed, n, p in ((1, 30, 0.06), (2, 40, 0.03), (3, 25, 0.15)):
        rng = random.Random(seed)
        pairs = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < p
        ]
        if not pairs:
            continue
        assert _spark_components(spark, pairs) == _union_find_components(pairs), (
            f"mismatch on seed={seed}"
        )


def test_star_components_deep_chain(spark):
    # A 48-node path is the adversarial case for min-label propagation
    # (diameter rounds); the star contraction must collapse it within
    # its O(log²) budget and label every node with the chain head.
    pairs = [(i, i + 1) for i in range(47)]
    got = _spark_components(spark, pairs)
    assert got == {i: 0 for i in range(48)}


def test_star_components_orientation_and_self_pairs(spark):
    # Pair orientation must not matter, and self-pairs carry no
    # connectivity (a node connected only to itself is its own island —
    # excluded from the edge-derived node set, like the callers' strict
    # a<b pair generators imply).
    pairs = [(5, 2), (2, 9), (7, 7), (11, 10)]
    got = _spark_components(spark, pairs)
    assert got == {2: 2, 5: 2, 9: 2, 10: 10, 11: 10}
