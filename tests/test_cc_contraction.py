"""r6 optimization guard: connected_components' per-partition
union-find contraction pre-pass must be output-identical to the plain
iterative path on graphs whose components span many partitions."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rindex_spark.operators.dedup import connected_components


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_contraction_equals_plain_on_cross_partition_graph(spark):
    # random-ish edges deliberately REPARTITIONED so every component's
    # edges scatter across partitions: a 1000-node cycle (diameter 500,
    # worst case for contraction locality) + 200 random chords.
    rng = np.random.default_rng(3)
    edges = [(i, (i + 1) % 1000) for i in range(1000)] + [
        (int(a), int(b)) for a, b in rng.integers(0, 1000, size=(200, 2))
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(16)
    on = _labels(connected_components(df, local_contraction=True))
    off = _labels(connected_components(df, local_contraction=False))
    assert on == off
    # one cycle + chords = a single component labeled by the min node
    assert set(on.values()) == {0}


def test_contraction_equals_plain_on_forest(spark):
    # many small components (the dedup-cluster shape), shuffled layout
    pairs = [(7 * i + j, 7 * i + j + 1) for i in range(300) for j in range(3)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(8)
    on = _labels(connected_components(df, local_contraction=True))
    off = _labels(connected_components(df, local_contraction=False))
    assert on == off
