"""r6 round-2 guards: the fused first CC round and the checkpoint
statistics strip must keep connected_components output-identical to a
pure union-find oracle, and deep many-round runs must not compound
Catalyst size estimates (the pre-fix behavior grew the sizeInBytes
BigInt's DIGIT COUNT per round, turning planning exponential)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rindex_spark.operators import dedup as dd
from rindex_spark.operators.dedup import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_fused_first_round_matches_union_find_oracle(spark):
    rng = np.random.default_rng(11)
    edges = [(i, i + 4) for i in range(0, 400, 1)] + [
        (int(a), int(b)) for a, b in rng.integers(0, 404, size=(60, 2))
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(9)
    want = _uf_oracle(edges)
    for contraction in (True, False):
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, local_contraction=contraction).collect()
        }
        assert got == want


def test_single_round_convergence_counts_one_round(spark):
    # a star converges inside the fused aggregate: one changed round
    df = spark.createDataFrame([(0, i) for i in range(1, 30)], "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0} and len(got) == 30
    assert dd.last_cc_rounds == 1


def test_deep_many_round_run_keeps_stats_bounded(spark):
    # 40-node chain with jumps disabled and contraction off forces ~40
    # label-propagation rounds — the shape that used to compound the
    # checkpointed plan's sizeInBytes estimate into a 10^3+-digit
    # BigInt and blow up planning time.  The strip keeps the final
    # frame's estimate at ordinary long magnitude.
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    ).repartition(1)
    out = connected_components(df, jumps=0, local_contraction=False, max_iters=100)
    labels = {r["id"]: r["component"] for r in out.collect()}
    assert set(labels.values()) == {0} and len(labels) == 41
    digits = len(str(out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    assert digits < 30, f"size estimate compounded: {digits} digits"
