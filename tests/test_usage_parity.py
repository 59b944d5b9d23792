"""Ported 1:1 from the reference integration tests
(lib/tests/usage.rs:1-64) and doc-tests (lib/src/rindex.rs:11-33):
the 4-point scenario [1,1],[2,2],[3,3],[20,20], k=3.

These are WHAT-tests: exact id sets and distances.
"""

from __future__ import annotations

import math

import pytest

from rindex_spark.config import GridSpec
from rindex_spark.operators.knn import build_knn_graph, knn_for_queries
from rindex_spark.operators.range_query import range_join
from rindex_spark.operators.rknn import reverse_knn

POINTS = [(0, 1.0, 1.0), (1, 2.0, 2.0), (2, 3.0, 3.0), (3, 20.0, 20.0)]
K = 3


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(POINTS, "id long, x double, y double").cache()


@pytest.fixture(scope="module")
def graph(pts):
    # deliberately tiny cells so the ring loop actually expands
    return build_knn_graph(pts, K, spec=GridSpec(cell_size=1.5)).cache()


def neighbors(graph, src):
    rows = graph.filter(f"src = {src}").orderBy("dist", "dst").collect()
    return [(r["dst"], r["dist"]) for r in rows]


def test_neighbors_of_a(graph):
    # usage.rs:16-17 — neighbors_of(a) == [a, b, c]; self at 0.0
    got = neighbors(graph, 0)
    assert [g[0] for g in got] == [0, 1, 2]
    assert got[0][1] == 0.0
    assert got[1][1] == pytest.approx(math.sqrt(2.0), abs=1e-12)
    assert got[2][1] == pytest.approx(math.sqrt(8.0), abs=1e-12)


def test_neighbors_of_d_far_point(graph):
    # d=[20,20] neighbors: self, c, b
    got = neighbors(graph, 3)
    assert [g[0] for g in got] == [3, 2, 1]
    assert got[0][1] == 0.0
    assert got[1][1] == pytest.approx(math.sqrt(2 * 17.0**2), abs=1e-12)


def test_delete_b_then_neighbors(spark, pts):
    # usage.rs:19-25 — after deleting b, neighbors_of(a) == [a, c, d]
    alive = pts.filter("id != 1")
    g = build_knn_graph(alive, K, spec=GridSpec(cell_size=1.5))
    got = neighbors(g, 0)
    assert [g_[0] for g_ in got] == [0, 2, 3]


def test_range_query_inclusive_sorted(spark, pts):
    # usage.rs:49-54 — query((0,0), r=10) -> [a, b, c] ascending by dist
    q = spark.createDataFrame(
        [(0, 0.0, 0.0, 10.0)], "qid long, x double, y double, radius double"
    )
    rows = range_join(pts, q, spec=GridSpec(cell_size=1.5)).collect()
    assert [r["id"] for r in rows] == [0, 1, 2]
    assert rows[0]["dist"] == pytest.approx(math.sqrt(2.0), abs=1e-12)
    assert rows[2]["dist"] == pytest.approx(math.sqrt(18.0), abs=1e-12)


def test_range_radius_boundary_inclusive(spark, pts):
    # dist <= radius is INCLUSIVE (rindex.rs:162): radius exactly sqrt(2)
    q = spark.createDataFrame(
        [(0, 0.0, 0.0, math.sqrt(2.0))], "qid long, x double, y double, radius double"
    )
    rows = range_join(pts, q, spec=GridSpec(cell_size=1.5)).collect()
    assert [r["id"] for r in rows] == [0]


def test_knn_query(spark, pts):
    # usage.rs:56-58 — query_neighbors((0,0), k=3) -> [a, b, c]
    q = spark.createDataFrame([(0, 0.0, 0.0)], "qid long, x double, y double")
    rows = (
        knn_for_queries(pts, q, 3, spec=GridSpec(cell_size=1.5))
        .orderBy("rank")
        .collect()
    )
    assert [r["id"] for r in rows] == [0, 1, 2]
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_knn_k_zero_empty(spark, pts):
    q = spark.createDataFrame([(0, 0.0, 0.0)], "qid long, x double, y double")
    assert knn_for_queries(pts, q, 0, spec=GridSpec(cell_size=1.5)).count() == 0


def test_rknn(spark, pts, graph):
    # usage.rs:60-63 — query_reverse((0,0)) -> [a]  (only a's kNN ball
    # covers the origin: a's 3rd neighbor c is at sqrt(8) > sqrt(2)=|a|)
    q = spark.createDataFrame([(0, 0.0, 0.0)], "qid long, x double, y double")
    rows = reverse_knn(pts, graph, q, K, spec=GridSpec(cell_size=1.5)).collect()
    assert [r["id"] for r in rows] == [0]


def test_knn_fewer_points_than_k(spark):
    # reference pads with infinity dummies and filters them at read-out
    # (rindex.rs:279-283) — we return only real rows.
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 2.0, 2.0)], "id long, x double, y double"
    )
    g = build_knn_graph(pts, 5, spec=GridSpec(cell_size=1.0))
    assert g.count() == 4  # 2 points x 2 real neighbors each
