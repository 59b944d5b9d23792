"""Extra benchmarks: noop-sink isolation of the hot suite entries
(spark_optimization_guide §1.4) — bench.py is FROZEN for measurement,
so every dissection / before-after number quoted in OPTIMIZATION_r06.md
comes from here.

Usage: python bench_extra.py <target> [<target> ...]
Targets: decontam cc tb skew e2e neardup ann all
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
        SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("RINDEX_BENCH_REPEATS", "2"))

out: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def bench(name, fn, repeats=None):
    best = None
    for _ in range(repeats or REPEATS):
        t0 = time.monotonic()
        fn()
        el = round(time.monotonic() - t0, 3)
        best = el if best is None else min(best, el)
    out[name] = best
    print(f"[extra] {name}: {best}s", file=sys.stderr, flush=True)


def main():
    targets = set(sys.argv[1:]) or {"all"}

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("rindex-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(min(max(CPUS, 16), 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def _warm(it):
        import numpy  # noqa: F401

        yield from it

    spark.range(0, 1024, 1, max(CPUS * 2, 16)).mapInPandas(_warm, "id long").count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = events.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()

    def has(t):
        return "all" in targets or t in targets

    # ---------------- decontam ------------------------------------------
    if has("decontam"):
        from rindex_spark.operators.dedup import benchmark_contamination, with_shingles

        corpus = docs.filter((F.col("doc_id") % 31) != 0)
        benchd = docs.filter((F.col("doc_id") % 31) == 0)
        sc.setJobDescription("decontam: corpus shingle explode only")
        bench(
            "decontam/corpus_grams_noop",
            lambda: noop(
                with_shingles(
                    corpus.select("doc_id", F.col("text").alias("__t")), "__t", 3
                ).select("doc_id", F.explode("shingles").alias("gram"))
            ),
        )
        sc.setJobDescription("decontam: bench gram set only")
        bench(
            "decontam/bench_grams_noop",
            lambda: noop(
                with_shingles(
                    benchd.select(F.col("text").alias("__t")), "__t", 3
                )
                .select(F.explode("shingles").alias("gram"))
                .distinct()
            ),
        )
        sc.setJobDescription("decontam: full")
        bench(
            "decontam/full",
            lambda: benchmark_contamination(corpus, benchd, n=3).count(),
        )

    # ---------------- connected components ------------------------------
    if has("cc"):
        from rindex_spark.operators import dedup as dedup_mod
        from rindex_spark.operators.dedup import connected_components

        cc_pairs = (
            events.select(F.col("event_id").alias("id_a"))
            .filter((F.col("id_a") % 8) < 7)
            .withColumn("id_b", F.col("id_a") + 1)
        )
        sc.setJobDescription("cc: full")
        bench("cc/full", lambda: connected_components(cc_pairs).count(), repeats=3)
        out["cc/rounds"] = dedup_mod.last_cc_rounds

    # ---------------- token budget --------------------------------------
    if has("tb"):
        from rindex_spark.functions.text import with_text_stats
        from rindex_spark.operators.sampling import sample_to_token_budget

        stats_docs = with_text_stats(docs).select(
            "doc_id", "n_tokens", "quality_score"
        )
        sc.setJobDescription("tb: one stats pass")
        bench("tb/stats_noop", lambda: noop(stats_docs))
        sc.setJobDescription("tb: full")
        bench(
            "tb/full",
            lambda: sample_to_token_budget(stats_docs, budget=100_000).count(),
        )

    # ---------------- ngram jaccard skew --------------------------------
    if has("skew"):
        from rindex_spark.operators.dedup import ngram_jaccard_pairs, with_shingles

        boiler = " subscribe to our newsletter for weekly updates and offers"
        docs_skew = docs.withColumn(
            "text", F.concat(F.col("text"), F.lit(boiler * 2))
        )
        sc.setJobDescription("skew: shingle arrays only")
        bench(
            "skew/shingles_noop",
            lambda: noop(
                with_shingles(
                    docs_skew.select(F.col("doc_id").alias("doc"), "text"), "text", 3
                ).select("doc", "shingles")
            ),
        )
        sc.setJobDescription("skew: full")
        bench(
            "skew/full",
            lambda: ngram_jaccard_pairs(
                docs_skew, threshold=0.5, max_df=100
            ).count(),
        )

    # ---------------- e2e (datagen / extract / knn) ---------------------
    if has("e2e"):
        from rindex_spark.datagen import generate_pages
        from rindex_spark.operators.knn import build_knn_graph
        from rindex_spark.sources.pages import points_from_pages

        n_pages = n_events
        parts = max(8, min(CPUS, n_pages // 12_500))

        sc.setJobDescription("e2e: datagen only")
        bench(
            "e2e/datagen_noop",
            lambda: noop(
                generate_pages(
                    spark, n_pages, dist="clustered", seed=42, partitions=parts
                )
            ),
        )
        sc.setJobDescription("e2e: datagen+extract")
        bench(
            "e2e/extract_noop",
            lambda: noop(
                points_from_pages(
                    generate_pages(
                        spark, n_pages, dist="clustered", seed=42, partitions=parts
                    )
                )
            ),
        )

        def full():
            pages = generate_pages(
                spark, n_pages, dist="clustered", seed=42, partitions=parts
            )
            pts = points_from_pages(pages).cache()
            g = build_knn_graph(pts, 10)
            n = g.count()
            pts.unpersist()
            return n

        sc.setJobDescription("e2e: full")
        bench("e2e/full", full)

    # ---------------- embedding near dup --------------------------------
    if has("neardup"):
        from rindex_spark.operators.ann import embedding_near_dup

        emb2 = emb.select("vec_id", "embedding").unionByName(
            emb.select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
        )
        sc.setJobDescription("neardup: full")
        bench(
            "neardup/full",
            lambda: embedding_near_dup(emb2, threshold=0.99).count(),
        )

    # ---------------- ann cosine topk ------------------------------------
    if has("ann"):
        from rindex_spark.operators.ann import cosine_topk

        qe = emb.filter((F.col("vec_id") % 10) == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        sc.setJobDescription("ann: full")
        bench("ann/full", lambda: cosine_topk(emb, qe, k=5).count(), repeats=3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
