"""Dynamic insert/delete replay vs brute-force oracle — the Spark
version of the reference's randomized tests (lib/tests/random.rs,
lib/tests/graph.rs): replay a deterministic op stream, then the FULL
kNN graph must match a brute-force oracle.  Batch sizes {1, small,
full} prove batch-fold ≡ per-op semantics (the graph of a point set is
state-free).
"""

from __future__ import annotations

import numpy as np
import pytest

from rindex_spark.datagen import generate_ops
from rindex_spark.plans.batches import (
    apply_batch,
    apply_ops_batches,
    empty_state,
    fold_chunk,
)

from tests.conftest import brute_knn


def live_set(rows):
    pts = {}
    for r in rows:
        if r[1] == "insert":
            pts[r[2]] = (r[3], r[4])
        else:
            del pts[r[2]]
    return pts


def check_state(state, pts_dict, k, tol=1e-9):
    ids = np.array(sorted(pts_dict))
    coords = np.array([pts_dict[i] for i in ids]) if len(ids) else np.zeros((0, 2))
    oracle = brute_knn(coords, ids, k)
    got_rows = state.graph.collect()
    by_src: dict[int, list] = {}
    for r in got_rows:
        by_src.setdefault(r["src"], []).append((r["dist"], r["dst"], r["rank"]))
    assert set(by_src) == set(oracle), (
        f"srcs differ: extra={set(by_src) - set(oracle)} missing={set(oracle) - set(by_src)}"
    )
    for src, got in by_src.items():
        got.sort(key=lambda t: t[2])
        exp = oracle[src]
        assert len(got) == len(exp), f"src {src}"
        for (gd, _, _), (ed, _) in zip(got, exp):
            assert gd == pytest.approx(ed, abs=tol), f"src {src}"
    n_pts = state.points.count()
    assert n_pts == len(ids)


@pytest.mark.parametrize("batch_size", [1, 16, None])
def test_op_replay_matches_oracle(spark, batch_size):
    k = 5
    n_steps = 16 if batch_size == 1 else (120 if batch_size == 16 else 200)
    rows = generate_ops(n_steps, seed=3)
    ops = spark.createDataFrame(
        rows, "seq long, op string, id long, x double, y double"
    )
    state = apply_ops_batches(spark, ops, k, batch_size=batch_size)
    check_state(state, live_set(rows), k)


def test_incremental_equals_rebuild_checkpoints(spark):
    """After EVERY batch (not just the end), the incrementally-repaired
    graph must equal the from-scratch oracle — the per-op validation of
    lib/tests/graph.rs:55-67 at batch granularity."""
    k = 4
    rows = generate_ops(120, seed=11)
    state = empty_state(spark, k)
    bs = 30
    for i in range(0, len(rows), bs):
        ins_rows, del_rows = fold_chunk(rows[i : i + bs])
        state = apply_batch(
            state,
            spark.createDataFrame(ins_rows or [], "id long, x double, y double"),
            spark.createDataFrame(del_rows or [], "id long"),
            n_inserts=len(ins_rows),
            n_deletes=len(del_rows),
        )
        check_state(state, live_set(rows[: i + bs]), k)


def test_batch_slicing_is_arithmetic_no_window(spark):
    """The op-stream slicer must not contain a global window (a
    single-partition exchange at 10^9-op streams — the r2 plan-shape
    risk).  Batch ids are pure arithmetic on seq, and sparse seqs still
    slice in seq order."""
    from rindex_spark.plans.batches import slice_ops

    rows = generate_ops(100, seed=7)
    ops = spark.createDataFrame(
        rows, "seq long, op string, id long, x double, y double"
    )
    sliced, n_batches, n_ops = slice_ops(ops, 16)
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan
    assert n_ops == 100 and n_batches == 7
    got = {r["seq"]: r["_batch"] for r in sliced.collect()}
    assert got == {s: s // 16 for s in range(100)}

    # sparse seqs: boundaries still respect seq order
    sparse = spark.createDataFrame(
        [(s * 10, "insert", s, 0.0, 0.0) for s in range(20)],
        "seq long, op string, id long, x double, y double",
    )
    sliced2, nb2, n2 = slice_ops(sparse, 50)
    assert n2 == 20 and nb2 == (190 // 50) + 1
    rows2 = sliced2.collect()
    by_batch: dict[int, list[int]] = {}
    for r in rows2:
        by_batch.setdefault(r["_batch"], []).append(r["seq"])
    batches = [sorted(v) for _, v in sorted(by_batch.items())]
    flat = [s for b in batches for s in b]
    assert flat == sorted(flat)


def test_delete_everything_then_reinsert(spark):
    k = 3
    pts = [(i, float(i), 0.0) for i in range(6)]
    state = empty_state(spark, k)
    state = apply_batch(
        state,
        spark.createDataFrame(pts, "id long, x double, y double"),
        spark.createDataFrame([], "id long"),
    )
    state = apply_batch(
        state,
        spark.createDataFrame([], "id long, x double, y double"),
        spark.createDataFrame([(i,) for i in range(6)], "id long"),
    )
    assert state.points.count() == 0
    assert state.graph.count() == 0
    state = apply_batch(
        state,
        spark.createDataFrame([(10, 1.0, 1.0), (11, 2.0, 2.0)], "id long, x double, y double"),
        spark.createDataFrame([], "id long"),
    )
    check_state(state, {10: (1.0, 1.0), 11: (2.0, 2.0)}, k)
