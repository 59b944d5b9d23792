"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``        — exact baseline: broadcast the query MATRIX,
  stream the corpus through one mapInPandas pass scoring whole Arrow
  batches with a BLAS matmul, merge tiny per-partition top-k partials.
* ``lsh_cosine_topk``    — scale path 1: random-hyperplane signatures
  bucket the corpus; each query probes its own bucket (+ multiprobe
  neighbors), exact cosine refine on candidates only.  Recall < 1 by
  design; the bucket join replaces the all-pairs product exactly like
  grid cells replace the all-pairs distance join in the spatial ops.
* ``ivf_cosine_topk``    — scale path 2: IVF — coarse spherical
  k-means cells (sample-trained, deterministic), corpus partitioned
  once by cell, queries probe their n_probe nearest cells, exact
  refine on the probed cells.  Data-adaptive where LSH is
  data-oblivious; the standard billion-vector layout.
* ``embedding_near_dup`` — near-duplicate pairs by cosine >= threshold,
  via the same LSH buckets.

All candidate-PAIR scoring (LSH refines, the crossjoin fallback) goes
through ``pair_cosine_udf``: numpy across rows, sequential across dims
— the same IEEE op order as a left-to-right fold, so scores stay
bit-identical to the SQL oracles while candidate volume (corpus-sized
at web scale) is scored at Arrow-batch speed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from rindex_spark.plans.scan import spread_scan


def _dot(a, b):
    """JVM-side dot product of two array columns in double precision,
    summed left-to-right (deterministic op order).  Kept for one-off
    column expressions and as the measured comparison point for
    ``pair_cosine_udf`` (same IEEE op order; the UDF is 1.2-1.9x
    faster at 200k pairs — BENCH.md)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pair_cosine_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine of candidate PAIRS: one Arrow batch at a time,
    numpy across ROWS, scalar-sequential across DIMS.

    The per-dim loop is deliberate: ``acc = ((0 + a0*b0) + a1*b1) + ...``
    reproduces the left-to-right fold of the JVM ``aggregate`` dot and
    of DuckDB's list_dot_product BIT-FOR-BIT, so LSH-refined scores
    hash-match the SQL oracles, while the row axis (the big one —
    candidate volume is corpus-sized at web scale) is full-speed numpy.
    This replaces the interpreted per-element higher-order-function dot
    in the LSH refine paths (r2 verdict item 3 — the same path that
    made r1's ann_cosine 100x slower than matmul).

    Null vectors and mismatched-dim pairs score -1.0 (the guarded
    "unusable row" convention shared with cosine_topk's scan; they can
    never pass a >= threshold filter)."""
    n = len(a)
    out = np.full(n, -1.0, dtype=np.float64)

    def score(A, B, idxs):
        m, dim = A.shape
        AT = np.ascontiguousarray(A.T)
        BT = np.ascontiguousarray(B.T)
        d = np.zeros(m)
        na = np.zeros(m)
        nb = np.zeros(m)
        for j in range(dim):  # sequential over dims = canonical op order
            d += AT[j] * BT[j]
            na += AT[j] * AT[j]
            nb += BT[j] * BT[j]
        sa = np.sqrt(na)
        sb = np.sqrt(nb)
        ok = (sa > 0) & (sb > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(ok, d / (sa * sb), -1.0)
        if idxs is None:
            out[:] = s
        else:
            out[idxs] = s

    try:  # fast path: uniform dims, no nulls (the overwhelming case)
        A = np.array(list(a), dtype=np.float64)
        B = np.array(list(b), dtype=np.float64)
        if A.ndim == 2 and B.ndim == 2 and A.shape == B.shape and A.shape[1]:
            score(A, B, None)
            return pd.Series(out)
    except (ValueError, TypeError):
        pass
    va = [np.asarray(v, dtype=np.float64) if v is not None else None for v in a]
    vb = [np.asarray(v, dtype=np.float64) if v is not None else None for v in b]
    by_dim: dict[int, list[int]] = {}
    for i in range(n):
        if va[i] is not None and vb[i] is not None and len(va[i]) == len(vb[i]) and len(va[i]):
            by_dim.setdefault(len(va[i]), []).append(i)
    for dim, idxs in by_dim.items():
        score(
            np.vstack([va[i] for i in idxs]),
            np.vstack([vb[i] for i in idxs]),
            idxs,
        )
    return pd.Series(out)


def pair_cosine_udf(a, b):
    """Column-level entry for the pair-cosine kernel (the pandas_udf is
    constructed lazily — decorating at import time needs a live
    SparkSession, which test collection doesn't have)."""
    return pandas_udf(_pair_cosine_kernel, "double")(a, b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    include_self: bool = False,
    max_broadcast_queries: int = 200_000,
    query_chunk: int = 4096,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query against the corpus.

    queries: (qid, embedding) — the SMALL side of a retrieval workload.
    The query matrix is broadcast (sc.broadcast, one copy per executor)
    and the corpus streams through ONE mapInPandas pass that scores
    whole Arrow batches with a numpy matmul (BLAS) and keeps a running
    per-query top-k per partition; a final window over the tiny
    (n_partitions x n_queries x k) partials yields the global top-k.
    No shuffle of anything corpus-sized, no per-element scoring.

    Falls back to the crossJoin plan when the query side exceeds
    ``max_broadcast_queries`` (driver-collect guard).

    returns (qid, neighbor_id, score, rank), rank by (score desc, id).
    """
    q0 = queries.select("qid", F.col(vec_col).alias("_qv"))
    # ONE bounded driver job decides the plan AND fetches the matrix
    # (r6; previously a count job + a collect job): limit(max+1) keeps
    # the driver fetch bounded, and if the limit bites we rebuild from
    # the full query frame in the crossjoin fallback anyway.
    qrows = q0.limit(max_broadcast_queries + 1).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "qid long, neighbor_id long, score double, rank int"
        )
    if len(qrows) > max_broadcast_queries:
        return _cosine_topk_crossjoin(corpus, queries, k, vec_col, id_col, include_self)
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qm = np.array([np.asarray(r["_qv"], dtype=np.float64) for r in qrows])
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    qok = qnorm > 0
    qmn = np.where(qok[:, None], qm / np.where(qok, qnorm, 1.0)[:, None], 0.0)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qmn, qok))

    def scan(batches):
        b_qids, b_qmn, b_qok = bc.value
        nq = len(b_qids)
        # running per-query top-k over the whole partition as PADDED
        # (nq, k) arrays — (-inf, int64max) sentinel slots sort last
        # under the (score desc, id asc) double argsort, so the whole
        # merge is five chunk-level numpy ops instead of a per-query
        # Python lexsort (r6; the old loop was ~2000 lexsorts per Arrow
        # batch).  Sentinels can never displace a real candidate (cos
        # scores are >= -1.0) and are dropped at emit.
        _PAD_ID = np.iinfo(np.int64).max
        best_s = np.full((nq, k), -np.inf)
        best_i = np.full((nq, k), _PAD_ID, dtype=np.int64)
        dim = b_qmn.shape[1]

        def merge_rows(sl, cand_s, cand_i):
            """Merge (m, c) candidate blocks into best[sl] by
            (score desc, id asc): secondary key sorted first, both
            stable."""
            ms = np.concatenate([best_s[sl], cand_s], axis=1)
            mi = np.concatenate([best_i[sl], cand_i], axis=1)
            o1 = np.argsort(mi, axis=1, kind="stable")
            ms = np.take_along_axis(ms, o1, axis=1)
            mi = np.take_along_axis(mi, o1, axis=1)
            o2 = np.argsort(-ms, axis=1, kind="stable")
            best_s[sl] = np.take_along_axis(ms, o2, axis=1)[:, :k]
            best_i[sl] = np.take_along_axis(mi, o2, axis=1)[:, :k]
        for b in batches:
            ids = b["neighbor_id"].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            # null / ragged embeddings must not silently drop the whole
            # Arrow batch (r2 advisor): keep the well-formed rows in the
            # matmul and score the bad rows -1.0, matching the crossjoin
            # fallback's guarded expression (null/zero-norm -> -1.0).
            vecs = [np.asarray(v, dtype=np.float64) if v is not None else None for v in b["_cv"]]
            good = np.array(
                [v is not None and v.ndim == 1 and len(v) == dim for v in vecs]
            )
            if not good.all():
                bad_ids = ids[~good]
                ids = ids[good]
                vecs = [v for v, g in zip(vecs, good) if g]
                # ONE batched -1.0 merge for ALL queries at once: the
                # bad rows score -1.0 against every query; self-matches
                # are masked to sentinels when include_self is off.
                nb = len(bad_ids)
                if nb:
                    cand_s = np.full((nq, nb), -1.0)
                    cand_i = np.broadcast_to(bad_ids, (nq, nb)).copy()
                    if not include_self:
                        self_m = cand_i == b_qids[:, None]
                        cand_s[self_m] = -np.inf
                        cand_i[self_m] = _PAD_ID
                    merge_rows(slice(0, nq), cand_s, cand_i)
                if not len(ids):
                    continue
            cm = np.vstack(vecs)
            cnorm = np.sqrt((cm * cm).sum(axis=1))
            cok = cnorm > 0
            cmn = np.where(cok[:, None], cm / np.where(cok, cnorm, 1.0)[:, None], 0.0)
            for qs in range(0, nq, query_chunk):
                qe = min(qs + query_chunk, nq)
                s = cmn @ b_qmn[qs:qe].T  # (n_corpus_batch, n_query_chunk)
                # zero-norm on either side scores -1.0 (matches the SQL
                # oracle's guarded expression)
                s[~cok, :] = -1.0
                s[:, ~b_qok[qs:qe]] = -1.0
                if not include_self:
                    s[ids[:, None] == b_qids[None, qs:qe]] = -np.inf
                kk = min(k, s.shape[0])
                top = np.argpartition(-s, kk - 1, axis=0)[:kk]
                cand_s = np.take_along_axis(s, top, axis=0).T  # (m, kk)
                cand_i = ids[top].T.copy()
                excl = ~np.isfinite(cand_s)  # -inf self-matches
                if excl.any():
                    cand_i[excl] = _PAD_ID
                merge_rows(slice(qs, qe), cand_s, cand_i)
        real = best_s > -np.inf  # sentinel slots drop at emit
        lens = real.sum(axis=1)
        nz = lens > 0
        if nz.any():
            yield pd.DataFrame(
                {
                    "qid": np.repeat(b_qids[nz], lens[nz]),
                    "neighbor_id": best_i[real],
                    "score": best_s[real],
                }
            )

    # spread_scan: a few-MB corpus scans as 1-2 file splits, pinning
    # the matmul to 1-2 cores (measured 2.5s -> 1.0s at sf1.0); no-op
    # on at-scale inputs
    partials = spread_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    ).mapInPandas(scan, schema="qid long, neighbor_id long, score double")
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def _cosine_topk_crossjoin(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    include_self: bool,
) -> DataFrame:
    """Fallback exact plan for query sides too large to broadcast as a
    matrix: crossJoin(broadcast) scored by the vectorized pair UDF."""
    c = spread_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    )
    q = queries.select(F.col("qid"), F.col(vec_col).alias("_qv"))
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("qid"))
    scored = pairs.withColumn("score", pair_cosine_udf(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Random-hyperplane LSH: sign pattern of n_planes projections,
    packed into a long.  P(bit match) = 1 - angle/pi.

    Null / ragged vectors get the sentinel bucket -1 (unreachable for
    well-formed rows — packed signatures are non-negative); callers
    filter ``bucket != -1`` so unusable rows neither crash the executor
    (r3 verdict item 4: the unguarded vstack raised) nor form a giant
    bad-rows×bad-rows bucket at scale (a failed embedding job nulls a
    whole corpus slice)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @pandas_udf(LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = np.full(n, -1, dtype=np.int64)
        va = [
            np.asarray(v, dtype=np.float64) if v is not None else None
            for v in vecs
        ]
        good = [
            i
            for i, v in enumerate(va)
            if v is not None and v.ndim == 1 and len(v) == dim
        ]
        if good:
            m = np.vstack([va[i] for i in good])
            bits = (m @ planes) > 0
            weights = 1 << np.arange(n_planes, dtype=np.uint64)
            out[good] = (bits.astype(np.uint64) @ weights).astype(np.int64)
        return pd.Series(out)

    return sig


def hyperplane_signatures_udf(dim: int, n_planes: int, n_tables: int, seed_base: int):
    """All ``n_tables`` hyperplane signatures in ONE vectorized pass
    (r6): one array<long> of length n_tables per row, exploded to
    (table, bucket) downstream with posexplode.  Table t's planes are
    seeded ``seed_base + t`` and its projection runs the same matmul
    the single-table UDF ran, so every bucket value is identical — the
    corpus just crosses the Python boundary once instead of n_tables
    times (guide §4.1; the near-dup entry ran 6 ArrowEvalPython scans
    of the same vectors).  Null / ragged vectors get [-1] * n_tables
    (the sentinel contract of hyperplane_signature_udf)."""
    planes = [
        np.random.default_rng(seed_base + t).standard_normal((dim, n_planes))
        for t in range(n_tables)
    ]
    weights = 1 << np.arange(n_planes, dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        out = np.full((n, n_tables), -1, dtype=np.int64)
        va = [
            np.asarray(v, dtype=np.float64) if v is not None else None
            for v in vecs
        ]
        good = [
            i
            for i, v in enumerate(va)
            if v is not None and v.ndim == 1 and len(v) == dim
        ]
        if good:
            m = np.vstack([va[i] for i in good])
            for t in range(n_tables):
                bits = (m @ planes[t]) > 0
                out[good, t] = (bits.astype(np.uint64) @ weights).astype(np.int64)
        return pd.Series(list(out))

    return sigs


def _bucketed(df, id_out: str, vec: str, dim, n_planes, n_tables, seed_base):
    """(id, table, bucket) rows for every table, one UDF pass, sentinel
    buckets dropped."""
    sig_all = hyperplane_signatures_udf(dim, n_planes, n_tables, seed_base)
    return (
        spread_scan(df).withColumn("_sigs", sig_all(F.col(vec)))
        .select(id_out, F.posexplode("_sigs").alias("table", "bucket"))
        .filter(F.col("bucket") != -1)
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane signatures;
    candidates = same bucket in ANY table; exact cosine on candidates.
    returns (qid, neighbor_id, score, rank)."""
    c0 = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    q0 = queries.select("qid", F.col(vec_col).alias("_qv"))
    cbuckets = _bucketed(c0, "neighbor_id", "_cv", dim, n_planes, n_tables, 100)
    qbuckets = _bucketed(q0, "qid", "_qv", dim, n_planes, n_tables, 100)

    cand = (
        qbuckets.join(cbuckets, ["table", "bucket"])
        .select("qid", "neighbor_id")
        .distinct()
    )
    if not include_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("qid"))

    scored = (
        cand.join(c0, "neighbor_id")
        .join(q0, "qid")
        .withColumn("score", pair_cosine_udf(F.col("_cv"), F.col("_qv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 65_536,
    n_iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained on a
    DETERMINISTIC sample (the ``train_sample`` smallest ids — at
    100 TB you train the quantizer on a sample and that is standard
    IVF practice, e.g. FAISS trains on ~max(256, 64*k) vectors per
    centroid; id-ordered sampling keeps the run reproducible where
    ``df.sample`` would depend on partitioning).

    Returns a row-normalized (n_centroids, dim) float64 matrix.
    Driver-side numpy: the sample and the centroid matrix are
    dimension-table-sized by construction, never data-sized."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(train_sample)
        .collect()
    )
    X = np.array(
        [
            np.asarray(r["v"], dtype=np.float64)
            for r in rows
            if r["v"] is not None
        ]
    )
    if X.size == 0 or X.ndim != 2:
        # empty / all-null corpus: no trainable sample.  Return a (0, 0)
        # matrix; ivf_cosine_topk short-circuits to an empty result like
        # cosine_topk/lsh_cosine_topk do (r3 advisor: np.array([]) used
        # to raise AxisError here).
        return np.zeros((0, 0))
    norms = np.sqrt((X * X).sum(axis=1))
    ok = norms > 0
    if not ok.any():
        return np.zeros((0, 0))
    X = X[ok] / norms[ok][:, None]
    n_c = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=n_c, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_c):
            m = assign == j
            if m.any():
                c = X[m].sum(axis=0)
                n = np.sqrt((c * c).sum())
                if n > 0:
                    C[j] = c / n
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    out_col: str = "cluster",
    n_probe: int = 1,
) -> DataFrame:
    """Adds the ids of each row's ``n_probe`` nearest centroids
    (cosine): one broadcast of the tiny centroid matrix + ONE BLAS
    matmul per Arrow batch — no shuffle, no per-row Python (r3 verdict
    item 3: this runs over the CORPUS on assignment).  n_probe=1 yields
    a single ``cluster`` long column; n_probe>1 explodes to one row per
    probed cluster.

    Null / ragged / zero-norm vectors take a SINGLE sentinel probe of
    cluster 0 regardless of n_probe — n_probe identical probes would
    explode to duplicate (row, cluster) pairs and duplicate
    (qid, neighbor_id) candidates occupying multiple ranks downstream
    (r3 advisor)."""
    bc = df.sparkSession.sparkContext.broadcast(centroids)

    @pandas_udf(ArrayType(LongType()))
    def probes(vecs: pd.Series) -> pd.Series:
        C = bc.value
        n = len(vecs)
        out = [[0]] * n
        if C.size == 0:
            return pd.Series(out)
        dim = C.shape[1]
        va = [
            np.asarray(v, dtype=np.float64) if v is not None else None
            for v in vecs
        ]
        good = [
            i
            for i, v in enumerate(va)
            if v is not None and v.ndim == 1 and len(v) == dim
        ]
        if not good:
            return pd.Series(out)
        X = np.vstack([va[i] for i in good])
        norms = np.sqrt((X * X).sum(axis=1))
        ok = norms > 0
        Xn = np.where(ok[:, None], X / np.where(ok, norms, 1.0)[:, None], 0.0)
        S = Xn @ C.T  # (batch, n_centroids): one matmul per Arrow batch
        p = min(n_probe, C.shape[0])
        top = np.argpartition(-S, p - 1, axis=1)[:, :p]
        order = np.argsort(
            -np.take_along_axis(S, top, axis=1), axis=1, kind="stable"
        )
        top = np.take_along_axis(top, order, axis=1)
        for r, i in enumerate(good):
            if ok[r]:
                out[i] = [int(t) for t in top[r]]
        return pd.Series(out)

    probed = df.withColumn("_probes", probes(F.col(vec_col)))
    if n_probe == 1:
        return probed.withColumn(out_col, F.col("_probes")[0]).drop("_probes")
    return probed.withColumn(out_col, F.explode("_probes")).drop("_probes")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    include_self: bool = False,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse spherical-k-means quantizer, each
    query probes its ``n_probe`` nearest centroid cells, exact cosine
    refine (pair_cosine_udf) on the probed cells only.

    The 100 TB shape: the corpus shuffles ONCE on ``cluster`` (and on
    a real deployment is written bucketed/partitioned by cluster, so
    repeated query batches never reshuffle it); per query batch only
    the probed cells are scanned — recall/cost tuned by n_probe
    exactly like LSH's n_tables, but with data-adaptive cells instead
    of data-oblivious hyperplanes.

    returns (qid, neighbor_id, score, rank), rank by (score desc, id).
    """
    c0 = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, vec_col, id_col
        )
    if centroids.size == 0:
        # untrainable quantizer (empty / all-degenerate corpus): empty
        # result, matching the other ANN paths' empty-input behavior
        return corpus.sparkSession.createDataFrame(
            [], "qid long, neighbor_id long, score double, rank int"
        )
    assigned = ivf_assign(
        spread_scan(c0), centroids, "_cv", out_col="cluster", n_probe=1
    )
    q0 = queries.select("qid", F.col(vec_col).alias("_qv"))
    qprobed = ivf_assign(q0, centroids, "_qv", out_col="cluster", n_probe=n_probe)

    cand = qprobed.join(assigned, "cluster").select(
        "qid", "neighbor_id", "_qv", "_cv"
    )
    if not include_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("qid"))
    scored = cand.withColumn("score", pair_cosine_udf(F.col("_cv"), F.col("_qv")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "score", F.col("rank").cast("int").alias("rank"))
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 14,
    n_tables: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine >= threshold, via LSH
    buckets + exact refine.  returns (id_a, id_b, score)."""
    c0 = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("_v"))
    # all tables' signatures in ONE corpus pass (r6); null/ragged rows
    # carry sentinel buckets and are dropped — they can't near-dup
    b = _bucketed(c0, "vid", "_v", dim, n_planes, n_tables, 500)
    aa = b.alias("a")
    bb = b.alias("b")
    cand = (
        aa.join(
            bb,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
        # r6 round 3: AQE coalesces the distinct's exchange by BYTES,
        # but the stage it feeds (vector joins + pair_cosine refine) is
        # CPU-heavy per byte — a few-MB pair list collapsed to 4 of 32
        # cores (refine stage 0.8-1.5s wall at 20k pairs).  A fixed-
        # count repartition of the 16 B/pair id stream is the cheapest
        # way to pin the refine at cluster parallelism; at web scale it
        # lays the pair stream out in one uniform wave.
        .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    )
    scored = (
        cand.join(
            c0.select(F.col("vid").alias("id_a"), F.col("_v").alias("_va")), "id_a"
        )
        .join(
            c0.select(F.col("vid").alias("id_b"), F.col("_v").alias("_vb")), "id_b"
        )
        .withColumn("score", pair_cosine_udf(F.col("_va"), F.col("_vb")))
        .filter(F.col("score") >= threshold)
    )
    return scored.select("id_a", "id_b", "score")
