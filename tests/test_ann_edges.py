"""Edge-case contracts of the ANN scoring paths (r2 advisor item):
null / ragged / zero-norm vectors must never silently drop rows or
poison rankings — they score -1.0 everywhere, identically in the
matmul scan, the pair UDF, and the crossjoin fallback."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rindex_spark.operators.ann import (
    _pair_cosine_kernel,
    cosine_topk,
    pair_cosine_udf,
)


def test_pair_cosine_kernel_edges():
    a = pd.Series(
        [
            [1.0, 0.0],          # clean
            None,                # null vector
            [1.0, 0.0, 0.0],     # ragged vs b
            [0.0, 0.0],          # zero norm
            [3.0, 4.0],          # clean, non-unit
        ]
    )
    b = pd.Series(
        [
            [1.0, 0.0],
            [1.0, 0.0],
            [1.0, 0.0],
            [1.0, 0.0],
            [3.0, 4.0],
        ]
    )
    out = _pair_cosine_kernel(a, b).tolist()
    assert out[0] == 1.0
    assert out[1] == -1.0 and out[2] == -1.0 and out[3] == -1.0
    assert out[4] == 1.0
    # sequential-fold exactness vs a hand-rolled left-to-right fold
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64)
    y = rng.standard_normal(64)
    d = na = nb = 0.0
    for j in range(64):
        d = d + x[j] * y[j]
        na = na + x[j] * x[j]
        nb = nb + y[j] * y[j]
    expected = d / (np.sqrt(na) * np.sqrt(nb))
    got = _pair_cosine_kernel(pd.Series([list(x)]), pd.Series([list(y)])).iloc[0]
    assert got == expected  # bit-identical, not approx


def test_cosine_topk_ragged_rows_not_dropped(spark):
    """A null or ragged corpus row must not silently drop its whole
    Arrow batch (the r2 bug): clean rows in the same batch still rank,
    and the bad rows themselves appear at score -1.0 exactly like the
    crossjoin fallback scores them."""
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, None),           # null embedding
            (3, [1.0, 0.0, 0.0]),  # ragged
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(100, [1.0, 0.0])], "qid long, embedding array<double>")
    rows = {r["neighbor_id"]: (r["score"], r["rank"]) for r in cosine_topk(corpus, q, k=4).collect()}
    assert rows[0][1] == 1 and rows[0][0] == 1.0
    assert rows[1][1] == 2
    # bad rows present, scored -1.0, ranked last (ties by id)
    assert rows[2] == (-1.0, 3) and rows[3] == (-1.0, 4)


def test_pair_udf_matches_kernel_through_spark(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0], [2.0, 1.0]), (1, None, [1.0, 0.0])],
        "i long, a array<double>, b array<double>",
    )
    got = {r["i"]: r["s"] for r in df.select("i", pair_cosine_udf("a", "b").alias("s")).collect()}
    assert got[1] == -1.0
    assert abs(got[0] - 4.0 / 5.0) < 1e-15
