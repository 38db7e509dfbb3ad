"""Property tests for the graph analytics family: triangle counts,
clustering coefficient, and neighbor-Jaccard must match brute-force
Python on arbitrary random graphs (the degree-ordered wedge plan and
the hub-capped wedge plan are exactly equivalent to the naive
definitions)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dht11_data_pipeline_spark.operators.graph import (
    clustering_coefficient, neighbor_jaccard, triangle_counts)

_slow = settings(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

EDGES = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1, max_size=40)


def _adj(edges):
    nbr = {}
    for a, b in edges:
        if a == b:
            continue
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    return nbr


@_slow
@given(edges=EDGES)
def test_triangles_match_bruteforce(spark, edges):
    nbr = _adj(edges)
    expect = {}
    for u, v, w in combinations(sorted(nbr), 3):
        if v in nbr[u] and w in nbr[u] and w in nbr[v]:
            for n in (u, v, w):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == expect


@_slow
@given(edges=EDGES)
def test_clustering_coeff_matches_bruteforce(spark, edges):
    nbr = _adj(edges)
    tri = {}
    for u, v, w in combinations(sorted(nbr), 3):
        if v in nbr[u] and w in nbr[u] and w in nbr[v]:
            for n in (u, v, w):
                tri[n] = tri.get(n, 0) + 1
    expect = {n: (len(ns), tri.get(n, 0),
                  2 * tri.get(n, 0) * 1_000_000 // (len(ns) * (len(ns) - 1)))
              for n, ns in nbr.items() if len(ns) >= 2}
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
           for r in clustering_coefficient(df).collect()}
    assert got == expect


@_slow
@given(edges=EDGES)
def test_neighbor_jaccard_matches_bruteforce(spark, edges):
    nbr = _adj(edges)
    expect = {}
    for v, w in combinations(sorted(nbr), 2):
        cn = len(nbr[v] & nbr[w])
        if cn == 0:
            continue
        union = len(nbr[v]) + len(nbr[w]) - cn
        expect[(v, w)] = (cn, len(nbr[v]), len(nbr[w]),
                          cn * 1_000_000 // union,
                          "Y" if w in nbr[v] else "N")
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]):
           (r["n_common"], r["deg_a"], r["deg_b"], r["jaccard_ppm"],
            r["is_edge"])
           for r in neighbor_jaccard(df).collect()}
    assert got == expect
