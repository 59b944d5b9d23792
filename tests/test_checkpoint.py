"""Checkpoint/resume (north_rule): kill a replay mid-run, rerun with
the same checkpoint dir, output must be identical and completed batches
must NOT re-execute."""

from __future__ import annotations

import json
import os

from rindex_spark.datagen import generate_ops
from rindex_spark.plans.batches import apply_ops_batches
from rindex_spark.plans.checkpoint import BatchCheckpointer, ops_fingerprint


def graph_set(state):
    return {(r["src"], r["dst"], round(r["dist"], 9)) for r in state.graph.collect()}


def test_resume_skips_completed_batches(spark, tmp_path):
    k = 4
    rows = generate_ops(80, seed=5)
    ops = spark.createDataFrame(rows, "seq long, op string, id long, x double, y double")
    ckdir = str(tmp_path / "ck")

    # full run -> golden
    golden = graph_set(apply_ops_batches(spark, ops, k, batch_size=20, checkpoint_dir=ckdir))

    # simulate a crash after batch 1: drop manifests for batches 2,3
    for b in (2, 3):
        os.remove(os.path.join(ckdir, f"batch={b}", "manifest.json"))

    # batch 0 and 1 must be skipped on rerun: poison their data dirs'
    # mtime-independent proof — capture manifest inodes before/after
    pre = {
        b: os.stat(os.path.join(ckdir, f"batch={b}", "manifest.json")).st_mtime_ns
        for b in (0, 1)
    }
    resumed = apply_ops_batches(spark, ops, k, batch_size=20, checkpoint_dir=ckdir)
    post = {
        b: os.stat(os.path.join(ckdir, f"batch={b}", "manifest.json")).st_mtime_ns
        for b in (0, 1)
    }
    assert pre == post, "completed batches were re-executed"
    assert graph_set(resumed) == golden


def test_manifest_carries_lineage_and_metrics(spark, tmp_path):
    k = 3
    rows = generate_ops(30, seed=9)
    ops = spark.createDataFrame(rows, "seq long, op string, id long, x double, y double")
    ckdir = str(tmp_path / "ck2")
    apply_ops_batches(spark, ops, k, batch_size=15, checkpoint_dir=ckdir)
    with open(os.path.join(ckdir, "batch=1", "manifest.json")) as f:
        m = json.load(f)
    assert m["status"] == "ok"
    assert m["batch_id"] == 1
    assert len(m["ops_fingerprint"]) == 16
    assert m["n_points"] > 0 and m["n_graph_rows"] > 0
    assert sum(m["graph_rows_per_partition"]) == m["n_graph_rows"]
    assert "apply" in m["timings_sec"] and "write" in m["timings_sec"]


def test_fingerprint_mismatch_forces_rerun(spark, tmp_path):
    ck = BatchCheckpointer(str(tmp_path / "ck3"))
    assert ck.find_resume_point([ops_fingerprint([(1, 0.0, 0.0)], [])]) == 0
