"""End-to-end parity with the reference demo (demo/src/main.rs:7-46):
read the 474-point clustered dataset, build the k=10 kNN graph, and the
edge list must equal demo/data/knn.csv as a SET of (src, dst) pairs —
row order is meaningless (the reference iterates a HashMap) and
self-loops are included (each point lists itself, knn.csv:1 `86,86`).

The fixtures are read straight from the read-only reference checkout;
skipped if absent.
"""

from __future__ import annotations

import csv
import os

import pytest

from rindex_spark.operators.knn import build_knn_graph

SPARSE = "/root/reference/demo/data/sparse.csv"
KNN = "/root/reference/demo/data/knn.csv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(SPARSE) and os.path.exists(KNN)),
    reason="reference demo fixtures not available",
)


def test_demo_knn_graph_edge_set(spark):
    with open(SPARSE) as f:
        reader = csv.reader(f)
        next(reader)  # header x,y,color
        coords = [(i, float(r[0]), float(r[1])) for i, r in enumerate(reader)]
    assert len(coords) == 474

    with open(KNN) as f:
        expected = {tuple(map(int, line.split(","))) for line in f if line.strip()}
    assert len(expected) == 4740

    pts = spark.createDataFrame(coords, "id long, x double, y double")
    graph = build_knn_graph(pts, 10)
    got = {(r["src"], r["dst"]) for r in graph.select("src", "dst").collect()}
    assert len(got) == 4740
    assert got == expected
