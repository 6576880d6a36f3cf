"""Connected components (operators/components.py) vs a pure-Python
union-find on the same edge lists — including the adversarial shapes
for the alternating-star algorithm (long chains, stars, merges)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geoparser_spark.operators.components import (
    assign_components,
    canonical_docs,
    connected_components,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_two_components_with_transitive_closure(spark):
    # (1,2),(2,3) must collapse to {1,2,3} though (1,3) is absent
    _check(spark, [(1, 2), (2, 3), (10, 11)])


def test_long_chain(spark):
    # worst case for naive label propagation; alternating stars must
    # converge well inside the iteration budget
    _check(spark, [(i, i + 1) for i in range(120)])


def test_star_and_reverse_chain(spark):
    _check(spark, [(0, i) for i in range(1, 40)])
    _check(spark, [(i + 1, i) for i in range(60)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 150
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(100 + 40 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_duplicate_and_reversed_pairs(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])


def test_assign_fills_isolated_docs(spark):
    pairs = spark.createDataFrame([(5, 9)], "id_a: long, id_b: long")
    comp = connected_components(pairs)
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.component for r in assign_components(docs, comp).collect()}
    assert got[5] == 5 and got[9] == 5
    assert all(got[i] == i for i in range(12) if i not in (5, 9))


def test_canonical_keeps_min_per_cluster(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long"
    )
    comp = connected_components(pairs)
    docs = spark.range(0, 13).select(F.col("id").alias("doc_id"))
    kept = sorted(r.doc_id for r in canonical_docs(docs, comp).collect())
    assert kept == [0, 1, 4, 5, 6, 7, 8, 9, 10, 12]


def test_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c")], "id_a: string, id_b: string"
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(pairs).count() == 0


def test_collision_proof_fixpoint(spark, monkeypatch):
    """A fingerprint that ALWAYS collides (constant tuple) must not
    trick the loop into stopping early: the exact exceptAll probe
    confirms the fixpoint, so the result is still the true component
    map (would-collide fixture per the alternating-star hardening)."""
    import geoparser_spark.operators.components as C

    monkeypatch.setattr(C, "_edge_fingerprint", lambda edges: (0, 0))
    edges = [(i, i + 1) for i in range(60)] + [(100, 101), (101, 102)]
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r.id: r.component
           for r in C.connected_components(pairs).collect()}
    assert got == expected
