"""Physical-plan evidence tests: the properties that make the engine
viable at 100 TB must be visible in `.explain` output, not just
asserted in prose — predicate pushdown and column pruning reach the
parquet scan, UDF-free paths stay inside whole-stage codegen, and the
op-stream slicer has no single-partition exchange (see also
test_dynamic_ops.test_batch_slicing_is_arithmetic_no_window and
test_knn_oracle.test_rknn_plan_is_equijoin_not_bnlj)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown_and_column_pruning(spark):
    """A filtered two-column projection must reach the parquet reader
    as PushedFilters + a pruned ReadSchema: a scan that reads `text`
    (the wide column) for a (doc_id, lang) query is wrong at any
    scale."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,100)" in plan.replace(" ", "").replace("`", ""), plan
    # pruned read schema: the wide text column must NOT be scanned
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0], read_schema


def test_text_stats_is_whole_stage_codegen(spark):
    """The text-stats quality gates are pure column expressions — the
    plan must contain WholeStageCodegen and NO python evaluation
    (BatchEvalPython/ArrowEvalPython), keeping the corpus-filter hot
    path entirely JVM-side."""
    from rindex_spark.functions.text import with_text_stats

    # r6: with_text_stats spreads a LOW-partition input (an Exchange
    # AQE then wraps, hiding codegen markers pre-execution), so feed it
    # an input already at session parallelism — the spread guard is a
    # no-op and the plan is the bare stats projection, which is what
    # this test is about.
    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(par)
        .localCheckpoint()
    )
    assert docs.rdd.getNumPartitions() >= par
    q = with_text_stats(docs).select("doc_id", "n_tokens", "quality_score")
    plan = _plan(q)
    # `*(N)` node prefixes mark whole-stage-codegen stages in the
    # executed plan's toString
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan
    assert "EvalPython" not in plan, plan


def test_exact_dedup_has_partial_aggregate(spark):
    """dedup_exact must be a map-side-combinable hash aggregate: two
    HashAggregate nodes (partial + final) around one exchange, so the
    shuffle carries one row per DISTINCT hash, never per document."""
    from rindex_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(dedup_exact(docs))
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_tile_pyramid_aggregates_before_explode(spark):
    """tile_pyramid must aggregate to base cells BEFORE the level
    explode (the explode is cell-sized, never data-sized) and both
    aggregates must be map-side-combinable partial+final pairs.  The
    plan therefore reads: scan -> partial agg -> exchange -> final agg
    -> generate(explode) -> partial agg -> exchange -> final agg, with
    exactly one Generate node ABOVE the first aggregate."""
    from rindex_spark.config import GridSpec
    from rindex_spark.operators.tiling import tile_pyramid

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    pts = docs.select(
        F.col("doc_id").alias("id"),
        (((F.col("doc_id") * 7919) % 20000) / 100.0 - 100.0).alias("x"),
        (((F.col("doc_id") * 104729) % 20000) / 100.0 - 100.0).alias("y"),
    )
    plan = _plan(tile_pyramid(pts, GridSpec(20.0, -100.0, -100.0), levels=3))
    assert plan.count("HashAggregate") >= 4, plan  # 2x (partial+final)
    assert plan.count("Generate") == 1, plan      # ONE explode, of cells
    assert "EvalPython" not in plan, plan
    # plan toString prints top-down (final ops first), so the Generate
    # must appear textually AFTER the level-rollup aggregate pair and
    # BEFORE the base-cell aggregate pair: cell-sized explode, with the
    # data-sized scan strictly below the first aggregation
    gen = plan.index("Generate")
    assert plan[:gen].count("HashAggregate") == 2, plan
    assert plan[gen:].count("HashAggregate") >= 2, plan


def test_zorder_key_is_pure_codegen(spark):
    """The Morton key must be pure column expressions: whole-stage
    codegen, no python eval, no exchange (it's a projection)."""
    from pyspark.sql import functions as F

    from rindex_spark.grid import cell_index, z_order_key

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pts = docs.select(
        F.col("doc_id").alias("id"),
        (((F.col("doc_id") * 7919) % 20000) / 100.0 - 100.0).alias("x"),
        (((F.col("doc_id") * 104729) % 20000) / 100.0 - 100.0).alias("y"),
    )
    q = pts.select(
        "id",
        z_order_key(
            cell_index(-100.0, 20.0, F.col("x")),
            cell_index(-100.0, 20.0, F.col("y")),
        ).alias("z"),
    )
    plan = _plan(q)
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_sessionize_and_asof_single_exchange(spark):
    """The temporal operators must each cost exactly ONE keyed
    exchange: sessionize's two window functions share it, session_stats'
    aggregate reuses it (hash(user_id) already clusters
    (user_id, session_seq)), and asof_join's union + carry-forward
    window shuffles both sides once."""
    from rindex_spark.operators.sessions import session_stats, sessionize
    from rindex_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = _plan(sessionize(ev, gap_sec=100.0))
    assert p.count("Exchange") == 1, p
    assert "EvalPython" not in p, p

    p = _plan(session_stats(ev, gap_sec=100.0))
    assert p.count("Exchange") == 1, p  # agg reuses the window's partitioning

    l = ev.filter("event_id % 3 = 0").select("event_id", "user_id", "ts")
    r = ev.filter("event_id % 3 = 1").select("event_id", "user_id", "ts", "value")
    p = _plan(
        asof_join(l, r, ["user_id"], "ts",
                  right_cols=["event_id", "value"], right_id_col="event_id")
    )
    assert p.count("Exchange") == 1, p
    assert "EvalPython" not in p, p
