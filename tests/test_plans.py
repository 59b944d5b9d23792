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

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
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
