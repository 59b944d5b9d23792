"""Structured Streaming: op-feed folding (foreachBatch + exactly-once
epoch commits) and event-time windowed aggregation with watermark."""

from __future__ import annotations

import json

import numpy as np

from rindex_spark.datagen import generate_ops, generate_pages
from rindex_spark.streaming.ops_stream import (
    stream_ops,
    streaming_page_window_counts,
)

from tests.conftest import brute_knn
from tests.test_dynamic_ops import live_set
from tests.test_knn_oracle import check_graph_vs_oracle


def write_ops_files(tmp_path, rows, n_files):
    import os

    d = tmp_path / "ops"
    d.mkdir()
    per = (len(rows) + n_files - 1) // n_files
    base = 1_700_000_000
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        p = d / f"ops_{i:03d}.json"
        with open(p, "w") as f:
            for seq, op, pid, x, y in chunk:
                f.write(json.dumps({"seq": seq, "op": op, "id": pid, "x": x, "y": y}) + "\n")
        # FileStreamSource orders epochs by modification time: a
        # sequenced op feed must carry monotonic mtimes
        os.utime(p, (base + i * 10, base + i * 10))
    return str(d)


def test_stream_ops_fold(spark, tmp_path):
    k = 4
    rows = generate_ops(90, seed=13)
    ops_dir = write_ops_files(tmp_path, rows, 3)
    q, holder = stream_ops(
        spark,
        ops_dir,
        str(tmp_path / "stream_ck"),
        str(tmp_path / "state"),
        k,
    )
    q.awaitTermination(300)
    assert holder["applied"] == 3
    state = holder["state"]
    pts = live_set(rows)
    ids = np.array(sorted(pts))
    coords = np.array([pts[i] for i in ids])
    oracle = brute_knn(coords, ids, k)
    check_graph_vs_oracle(
        state.graph.withColumnRenamed("src", "src").collect(), oracle
    )
    # restart with the same dirs: epochs already committed are replayed
    # as no-ops (exactly-once at the state level)
    q2, holder2 = stream_ops(
        spark,
        ops_dir,
        str(tmp_path / "stream_ck"),
        str(tmp_path / "state"),
        k,
    )
    q2.awaitTermination(120)
    assert holder2["applied"] == 0  # nothing re-applied
    # ... and the restarted holder must carry the COMMITTED state, not
    # an empty one (r1 advisor, high severity)
    assert holder2["state"].points.count() == len(pts)


def test_stream_ops_restart_with_new_files(spark, tmp_path):
    """Clean shutdown, then NEW op files arrive, then restart: the new
    batches must fold into the committed state (not an empty index) —
    Spark never re-delivers cleanly-committed epochs."""
    import os

    k = 4
    rows = generate_ops(120, seed=21)
    first, rest = rows[:80], rows[80:]
    ops_dir = write_ops_files(tmp_path, first, 2)
    ck = str(tmp_path / "stream_ck")
    st = str(tmp_path / "state")

    q, holder = stream_ops(spark, ops_dir, ck, st, k)
    q.awaitTermination(300)
    assert holder["applied"] == 2

    # new files arrive after the clean shutdown (monotonic mtimes)
    base = 1_700_000_000 + 100 * 10
    per = (len(rest) + 1) // 2
    for i in range(2):
        chunk = rest[i * per : (i + 1) * per]
        p = os.path.join(ops_dir, f"ops_late_{i:03d}.json")
        with open(p, "w") as f:
            for seq, op, pid, x, y in chunk:
                f.write(json.dumps({"seq": seq, "op": op, "id": pid, "x": x, "y": y}) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    q2, holder2 = stream_ops(spark, ops_dir, ck, st, k)
    q2.awaitTermination(300)
    assert holder2["applied"] == 2  # only the new files

    # final state == fresh brute oracle over the FULL op stream
    pts = live_set(rows)
    ids = np.array(sorted(pts))
    coords = np.array([pts[i] for i in ids])
    oracle = brute_knn(coords, ids, k)
    check_graph_vs_oracle(holder2["state"].graph.collect(), oracle)


def test_stream_dedup_cross_batch(spark, tmp_path):
    """Stateful streaming dedup: a text seen in batch 0 must NOT be
    re-emitted by batch 1; within a batch the lowest doc_id survives."""
    import os

    from rindex_spark.streaming.dedup_stream import stream_dedup

    d = tmp_path / "docs"
    d.mkdir()
    batches = [
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        [(3, "alpha beta"), (4, "epsilon zeta"), (5, "gamma delta"), (6, "eta theta")],
    ]
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        p = d / f"docs_{i:03d}.json"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"] for r in spark.sql("select doc_id from dedup_out").collect()
    }
    # alpha beta -> id 0 (batch 0, min of {0,2}; id 3 in batch 1 dropped)
    # gamma delta -> id 1; epsilon zeta -> 4; eta theta -> 6
    assert got == {0, 1, 4, 6}


def test_streaming_window_counts(spark, tmp_path):
    pages = generate_pages(spark, 400, seed=2)
    src = str(tmp_path / "pages_src")
    pages.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_page_window_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select sum(n_pages) as s from wincounts").collect()[0]["s"]
    assert got == 400
    langs = {r["lang"] for r in spark.sql("select distinct lang from wincounts").collect()}
    assert langs == {"en", "de", "fr", "es"}


def test_streaming_session_window(spark, tmp_path):
    """Native session_window sessionization: batch-mode parity with
    the ordinal sessionizer, then a real availableNow stream where
    append mode emits exactly the watermark-closed sessions."""
    import datetime as dt
    import os

    from rindex_spark.operators.sessions import sessionize
    from rindex_spark.streaming.sessions_stream import streaming_session_stats

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, sec):
        return {"event_id": eid, "user_id": uid,
                "ts": (t0 + dt.timedelta(seconds=sec)).isoformat()}

    # user 1: sessions {0,10}, {100,105}; user 2: {0}, {200}
    rows0 = [ev(0, 1, 0), ev(1, 1, 10), ev(2, 2, 0)]
    rows1 = [ev(3, 1, 100), ev(4, 1, 105), ev(5, 2, 200),
             ev(99, 999, 10_000_000)]  # watermark flush sentinel
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    for i, rows in enumerate([rows0, rows1]):
        p = d / f"ev_{i:03d}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    schema = "event_id long, user_id long, ts timestamp"
    # batch-mode parity: same grouping expression on a plain DataFrame
    batch = spark.read.schema(schema).json(str(d)).filter("user_id != 999")
    got_b = sorted(
        (r["user_id"], r["n_events"])
        for r in streaming_session_stats(batch, gap="30 seconds").collect()
    )
    ordinal = sessionize(batch, gap_sec=30.0)
    exp = sorted(
        (r["user_id"], r["n_events"])
        for r in ordinal.groupBy("user_id", "session_seq")
        .count().withColumnRenamed("count", "n_events").collect()
    )
    assert got_b == exp == [(1, 2), (1, 2), (2, 1), (2, 1)]

    # streaming: append emits sessions closed by the watermark (the
    # sentinel pushes it past every real session)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        streaming_session_stats(stream, gap="30 seconds", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got_s = sorted(
        (r["user_id"], r["n_events"])
        for r in spark.sql(
            "select user_id, n_events from sess_out where user_id != 999"
        ).collect()
    )
    assert got_s == exp
