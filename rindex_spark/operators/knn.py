"""Exact k-nearest-neighbor search and kNN-graph construction.

Reference semantics reproduced here (SURVEY.md §2):

* ``query_neighbors(q, k)`` (rindex.rs:197-214, :764-807): exact kNN by
  best-first branch-and-bound — descend subtrees while their
  ``min_distance`` beats the current k-th candidate distance.
* the per-point kNN graph maintained on insert (rindex.rs:478-482,
  :500-560): every point's k nearest INCLUDING ITSELF at distance 0.0.

Distributed re-expression: iterative **cell-ring expansion** with the
kNN math in vectorized Arrow UDFs (the north_star architecture):

round r:
  1. queries group by SUPERCELL (4x4 grid cells by default — grouping
     at cell granularity pays per-group pandas overhead and ships each
     point ~9x through Arrow; supercell halos amortize both, and the
     side length balances kernel flops vs candidate replication, see
     _SUPER below).
     Distinct (supercell, ring-window) keys explode to the supercell
     block DILATED by the ring radius (pure sequence/explode) and
     equi-join the points.
  2. queries and candidates COGROUP on the supercell key; a pandas UDF
     computes, per group, the numpy distance matrix (chunked on both
     axes, in-place temporaries), selects each query's top-k via
     argpartition with tie-exact boundary widening, and merges it into
     the query's carried best list (packed binary, not Arrow lists —
     object-per-element serialization dominates otherwise).  The halo
     may re-scan cells a query already saw; the merge dedupes exact
     (dist, id) duplicates, so over-inclusion never corrupts the top-k.
  3. a query finishes when its k-th distance is STRICTLY below the
     minimum possible distance of any cell outside its visited ring
     (grid.ring_lower_bound — the exact invariant of rindex.rs:800-802;
     the halo only ever visits MORE than the ring, so the bound stays
     conservative) or the ring covers the whole data extent.
  4. unfinished queries jump their ring radius to the certifying radius
     (floor(kth/cs)+1), clamped geometrically; the frontier shrinks
     monotonically.

Scale notes (100 TB posture):
* per round: one equi-join keyed on supercell ints + one cogroup
  shuffle — both AQE-managed; nothing driver-side grows with data (the
  loop keeps only frontier row counts).
* dense (urban/hot) cells cost numpy flops, not shuffled rows.
* determinism: candidates ordered by (dist, id); ties at the k-th
  distance break by id (the reference's order is arbitrary on ties —
  its tests compare sets/multisets only, lib/tests/graph.rs:60-67).
* distance = sqrt((qx-x)^2 + (qy-y)^2) in float64, the same IEEE op
  order as the reference (distance.rs:1-7) and the SQL oracles.
"""

from __future__ import annotations

import os
import threading
import time as _time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rindex_spark.config import EngineConfig, GridSpec
from rindex_spark.grid import ring_lower_bound, with_cells

_SUPER = 4  # grid cells per supercell side (power of 2: >> 2)
_SUPER_SHIFT = 2
# r6: default supercell 8x8 -> 4x4 (RINDEX_SUPER_SHIFT re-sweeps it).
# The kernel computes the FULL query x candidate matrix per dilated
# supercell block, so flops/query scale with block area (S + 2*khi)^2
# while shuffle replication scales with ((S + 2*khi)/S)^2: S=4 trades
# ~2x candidate-row replication (cheap bytes) for ~2.8x fewer kernel
# flops.  Interleaved best-of-N at 1M points: uniform-lattice events
# 5.96s -> 4.03s (the kernel is ~100% of the round stage there);
# clustered corpus statistically tied (8.05 vs 8.13 best-of-5).  S=16
# measured 3x WORSE than S=8 (18s) — the flop blowup dominates long
# before per-group overhead matters.

# Safety rail on the density-derived INITIAL ring radius (in cells).
# MEASURED (r3, 2M clustered docs, e2e pipeline): capping khi0 small
# (3) to cut the sparse-fringe candidate replication LOSES on wall
# clock at every core count (1c: 266s vs 245s, 4c: 83s vs 72s, 8c
# graph-only: 48s vs 42s) — the replicated candidates cost numpy flops
# that parallelize fine, while the extra certify round costs a full
# shuffle+Arrow cascade for the whole sparse fringe.  So the cap is a
# backstop for pathological density estimates only (the k=10 formula
# maxes at ~20); the ANNULUS trim below is what keeps multi-round
# stragglers cheap: each later round ships only never-seen cells, so
# total shipped volume is bounded by the final window size instead of
# (rounds x window).
_KHI0_CAP = 64

_STATE_SCHEMA = (
    "qid long, qx double, qy double, qix long, qiy long, "
    "r_lo long, r_hi long, salt long, cnt long, kth double, "
    "best_dist binary, best_id binary"
)


def _state_schema(n_extra: int) -> str:
    """_STATE_SCHEMA extended with qe0..qe{n-1} double columns for the
    query's extra (>2-D) coordinates."""
    if n_extra == 0:
        return _STATE_SCHEMA
    extras = ", ".join(f"qe{i} double" for i in range(n_extra))
    return _STATE_SCHEMA + ", " + extras

# a single cogroup task must not exceed this many queries — hot
# supercells (urban density / point masses) get salted into sub-groups
# (the north_star's "salted repartitioning on hot cells"; candidates
# are replicated per salt, queries are split)
_MAX_GROUP_QUERIES = 32768

class _ThreadLocalFrameList(threading.local):
    """A per-THREAD list of persisted frames (r4 verdict item 7): the
    release-on-next-call pattern with a plain module list meant two
    concurrent driver threads released each other's LIVE round states
    (correctness survived via deterministic recompute; cost did not).
    threading.local gives each driver thread its own slot, so a call
    only ever releases its own thread's predecessor."""

    def __init__(self):
        self.frames: list = []

    def append(self, frame) -> None:
        self.frames.append(frame)

    def pop(self):
        return self.frames.pop()

    def __len__(self) -> int:
        return len(self.frames)

    def __bool__(self) -> bool:
        return bool(self.frames)


# Persisted per-round state frames of the CURRENT THREAD's most recent
# knn_for_queries call (r3 verdict item 7: they were MEMORY_ONLY-cached
# and never unpersisted, so repeated build_knn_graph calls in a long
# session accumulated blocks until eviction).  Each call releases its
# thread's predecessor states on entry, bounding the session footprint
# at one call's round count PER DRIVER THREAD; callers that have fully
# consumed their output can reclaim immediately via
# release_round_states().  An unpersisted state that a still-lazy
# result frame later needs simply recomputes its deterministic lineage
# (the documented MEMORY_ONLY eviction semantics — correctness is
# unaffected).
_round_states = _ThreadLocalFrameList()


def release_round_states(blocking: bool = False) -> None:
    """Unpersist all round-state frames of the current thread's most
    recent knn_for_queries call.  Safe to call any time after the
    caller has consumed (collected / written) the returned DataFrame."""
    while _round_states:
        try:
            _round_states.pop().unpersist(blocking=blocking)
        except Exception:
            pass


# Diagnostics of the most recent knn_for_queries call when
# RINDEX_KNN_STATS is set (r4 verdict item 8: promote the candidate-
# volume numbers BENCH.md quotes to machine-readable fields): rounds
# run, candidate rows shipped into the cogroup (the replication factor
# the annulus trim + khi0 policy control), and the brute-tail size.
# Counting candidates costs one extra job per round, so it is opt-in —
# bench runs ONE instrumented repeat outside the timed best-of-N.
last_run_stats: dict = {}


def _make_round_udf(k: int, chunk: int = 256, cand_chunk: int = 4096, n_extra: int = 0):
    """Cogrouped kNN round over a HASH BUCKET of supercell groups:
    merge each query's carried top-k (packed binary) with the
    candidates of its dilated block.  Subgroups inside the bucket are
    matched with one sort + searchsorted — see fn's docstring.

    n_extra > 0 (D > 2 points, reference const-generic [f64; D],
    lib/src/rindex.rs:34): extra coordinates ride as qe{i}/e{i} double
    columns; distances are exact full-D f64 (the f32 selection lane is
    2-D-only), still in the canonical left-to-right IEEE op order
    sqrt(((dx^2+dy^2)+dz^2)+...) that the SQL oracles use."""

    empty = pd.DataFrame(
        columns=[
            "qid", "qx", "qy", "qix", "qiy", "r_lo", "r_hi", "salt",
            "cnt", "kth", "best_dist", "best_id",
            *[f"qe{i}" for i in range(n_extra)],
        ]
    )

    def fn(queries: pd.DataFrame, cand: pd.DataFrame) -> pd.DataFrame:
        if os.environ.get("RINDEX_KNN_PROF"):
            t0 = _time.monotonic()
            out = _fn(queries, cand)
            with open(f"/tmp/knn_prof_{os.getpid()}.csv", "a") as f:
                f.write(f"{_time.monotonic()-t0:.4f},{len(queries)},{len(cand)}\n")
            return out
        return _fn(queries, cand)

    def _fn(queries: pd.DataFrame, cand: pd.DataFrame) -> pd.DataFrame:
        """One HASH BUCKET of supercell groups (not one supercell): the
        cogroup key is pmod(gk, B) with gk = xxhash64(supercell key),
        so each call carries MANY (sx, sy, r_lo, r_hi, salt) subgroups.
        Subgroups are matched by sorting both sides on gk and slicing —
        the per-group pandas/Arrow overhead that dominated
        per-supercell cogrouping (~95% of round CPU at 2M points, the
        kernel itself being seconds) is paid once per BUCKET instead.

        gk is a single PACKED key (candidates carry ONE long instead of
        the five (ksx, ksy, klo, khi, ksalt) longs — 40 of the 64 bytes
        of every shuffled candidate row).  A gk collision merely merges
        two subgroups: every query still meets all of its OWN group's
        candidates (superset), the extras are real points scored with
        exact distances, and the (dist, id) merge dedupes — correctness
        is unaffected, so no collision handling is needed."""
        nq = len(queries)
        if nq == 0:
            return empty

        # --- bucket-level extraction + subgroup sort (once per bucket)
        qkv = queries["gk"].to_numpy(dtype=np.int64)
        qord = np.argsort(qkv, kind="stable")
        qkv = qkv[qord]
        qkey = np.stack(
            [queries[c].to_numpy(dtype=np.int64) for c in ("r_lo", "r_hi", "salt")],
            axis=1,
        )[qord]
        qid_a = queries["qid"].to_numpy()[qord]
        qx = queries["qx"].to_numpy(dtype=np.float64)[qord]
        qy = queries["qy"].to_numpy(dtype=np.float64)[qord]
        qix_a = queries["qix"].to_numpy()[qord]
        qiy_a = queries["qiy"].to_numpy()[qord]
        if n_extra:
            QE = np.column_stack(
                [queries[f"qe{i}"].to_numpy(dtype=np.float64) for i in range(n_extra)]
            )[qord]
        bd_in = queries["best_dist"].to_numpy()[qord]
        bi_in = queries["best_id"].to_numpy()[qord]
        prev_d = [
            np.frombuffer(b, dtype=np.float64) if b else np.empty(0) for b in bd_in
        ]
        prev_i = [
            np.frombuffer(b, dtype=np.int64) if b else np.empty(0, dtype=np.int64)
            for b in bi_in
        ]

        nc = len(cand)
        if nc:
            ckv = cand["gk"].to_numpy(dtype=np.int64)
            cord = np.argsort(ckv, kind="stable")
            ckv = ckv[cord]
            cx = cand["x"].to_numpy(dtype=np.float64)[cord]
            cy = cand["y"].to_numpy(dtype=np.float64)[cord]
            cid = cand["id"].to_numpy(dtype=np.int64)[cord]
            if n_extra:
                CE = np.column_stack(
                    [cand[f"e{i}"].to_numpy(dtype=np.float64) for i in range(n_extra)]
                )[cord]

        out_cnt = np.empty(nq, dtype=np.int64)
        out_kth = np.empty(nq, dtype=np.float64)
        out_d: list[bytes] = [b""] * nq
        out_i: list[bytes] = [b""] * nq

        def merge_into(r, dd, ii):
            """Merge chunk top-k into query r's running best; the halo
            may re-scan visited cells, so DEDUPE exact (dist,id)
            duplicates (equal keys sort adjacent)."""
            o = np.lexsort((ii, dd))[:k]
            dd, ii = dd[o], ii[o]
            if len(prev_d[r]):
                md = np.concatenate([prev_d[r], dd])
                mi = np.concatenate([prev_i[r], ii])
                mo = np.lexsort((mi, md))
                md, mi = md[mo], mi[mo]
                keep = np.ones(len(mi), dtype=bool)
                keep[1:] = (mi[1:] != mi[:-1]) | (md[1:] != md[:-1])
                prev_d[r], prev_i[r] = md[keep][:k], mi[keep][:k]
            else:
                prev_d[r], prev_i[r] = dd, ii

        def run_subgroup_2d(qs, qe_, lo, hi):
            # float32 SELECTION lane: halves the memory traffic of the
            # distance matrices.  Coordinates are centered on the
            # SUBGROUP first — raw f32 casts suffer catastrophic
            # cancellation for nearby points at large coordinates;
            # centered values are cell-scale.  Selection uses SQUARED
            # distance; exactness is restored by a rigorously widened
            # pool + exact f64 refine.
            #
            # r6 kernel shape (output-identical, measured 2.1x on a
            # lattice subgroup / kernel CPU 87.6s -> ~35s per 1M-point
            # build): value-only np.partition finds the k-th f32
            # distance (the old per-row argpartition index machinery
            # was ~75% of chunk CPU), the widened pool is ONE flat
            # boolean mask + np.nonzero gather for the whole chunk, and
            # (dist, id) ranking is ONE chunk-level lexsort keyed
            # (row, dist, id) + a segmented first-k take — no per-row
            # Python on ANY path.  Integer-lattice corpora make the
            # k-th distance carry dozens of exact ties (the sf1.0
            # events lattice widens EVERY row), so the old "rare" slow
            # path was the common case there.
            gx0 = cx[lo:hi].mean()
            gy0 = cy[lo:hi].mean()
            cx32 = (cx[lo:hi] - gx0).astype(np.float32)
            cy32 = (cy[lo:hi] - gy0).astype(np.float32)
            qx32 = (qx[qs:qe_] - gx0).astype(np.float32)
            qy32 = (qy[qs:qe_] - gy0).astype(np.float32)
            span2 = float(
                max(
                    cx32.max() - cx32.min(),
                    cy32.max() - cy32.min(),
                    float(np.abs(qx32).max()),
                    float(np.abs(qy32).max()),
                    1e-30,
                )
            )
            # rigorous f32 squared-distance error bound (ADVICE r1):
            # with |coords| <= S := span2, each centered f32 coordinate
            # carries error <= 2*S*2^-24, so |d32 - d_true| <=
            # 3*sqrt(d)*e1 + 2*e1^2 + 3*d*2^-24 with e1 = 4*S*2^-24.
            _e1 = 4.0 * span2 * 2.0**-24
            ncl = hi - lo
            for s in range(0, qe_ - qs, chunk):
                e = min(s + chunk, qe_ - qs)
                m = e - s
                pool_r: list = []
                pool_d: list = []
                pool_i: list = []
                for cs_ in range(0, ncl, cand_chunk):
                    ce = min(cs_ + cand_chunk, ncl)
                    ids_c = cid[lo + cs_ : lo + ce]
                    d32 = qx32[s:e, None] - cx32[None, cs_:ce]
                    np.multiply(d32, d32, out=d32)
                    dy32 = qy32[s:e, None] - cy32[None, cs_:ce]
                    np.multiply(dy32, dy32, out=dy32)
                    d32 += dy32
                    del dy32
                    kk = min(k, ce - cs_)
                    # k-th smallest f32 squared distance per row, then
                    # widen by 4x the derived error bound: a true top-k
                    # member's f32 value exceeds it by at most
                    # 2*err(kth_true^2), kth_true^2 <= kth + err
                    kth = np.partition(d32, kk - 1, axis=1)[:, kk - 1].astype(
                        np.float64
                    )
                    err = (
                        3.0 * np.sqrt(np.maximum(kth, 0.0)) * _e1
                        + 2.0 * _e1 * _e1
                        + 3.0 * kth * 2.0**-24
                    )
                    thr = kth + 4.0 * err + 1e-300
                    # pool = every candidate within the widened bound.
                    # The f64 compare d32 <= thr is done in f32 against
                    # the round-DOWN of thr (exact: a f32 value exceeds
                    # f64 t iff it exceeds the largest f32 <= t),
                    # avoiding a full-matrix f64 upcast temp.
                    thr32 = thr.astype(np.float32)
                    over = thr32.astype(np.float64) > thr
                    if over.any():
                        thr32[over] = np.nextafter(
                            thr32[over], np.float32(-np.inf)
                        )
                    rows, cols = np.nonzero(d32 <= thr32[:, None])
                    # exact f64 refine on the pool only — ORIGINAL
                    # coordinates, canonical IEEE op order (matches the
                    # reference and the SQL oracles)
                    ddx = qx[qs + s + rows] - cx[lo + cs_ + cols]
                    ddy = qy[qs + s + rows] - cy[lo + cs_ + cols]
                    pool_r.append(rows)
                    pool_d.append(np.sqrt(ddx * ddx + ddy * ddy))
                    pool_i.append(ids_c[cols])
                if len(pool_r) == 1:
                    rows, dd, ii = pool_r[0], pool_d[0], pool_i[0]
                else:
                    rows = np.concatenate(pool_r)
                    dd = np.concatenate(pool_d)
                    ii = np.concatenate(pool_i)
                # one lexsort for the whole chunk: group rows, order
                # (dist, id) asc within each — then keep each row's
                # first k (cand chunks partition the candidate range,
                # so no within-call duplicates to dedupe)
                order = np.lexsort((ii, dd, rows))
                r_s = rows[order]
                dd_s = dd[order]
                ii_s = ii[order]
                counts = np.bincount(r_s, minlength=m)
                starts = np.zeros(m + 1, dtype=np.int64)
                np.cumsum(counts, out=starts[1:])
                keep = (np.arange(len(r_s), dtype=np.int64) - starts[r_s]) < k
                dd_k = dd_s[keep]
                ii_k = ii_s[keep]
                kstarts = np.zeros(m + 1, dtype=np.int64)
                np.cumsum(np.minimum(counts, k), out=kstarts[1:])
                for r in range(m):
                    a, b = int(kstarts[r]), int(kstarts[r + 1])
                    gq = qs + s + r
                    if len(prev_d[gq]):
                        merge_into(gq, dd_k[a:b], ii_k[a:b])
                    else:
                        prev_d[gq] = dd_k[a:b]
                        prev_i[gq] = ii_k[a:b]

        def run_subgroup_nd(qs, qe_, lo, hi):
            # D > 2: exact full-D f64 squared distances (no f32 lane);
            # accumulation order ((dx^2+dy^2)+dz^2)+... is the canonical
            # IEEE order of the oracles, so sqrt(d2) IS the exact dist.
            ncl = hi - lo
            for s in range(0, qe_ - qs, chunk):
                e = min(s + chunk, qe_ - qs)
                for cs_ in range(0, ncl, cand_chunk):
                    ce = min(cs_ + cand_chunk, ncl)
                    ids_c = cid[lo + cs_ : lo + ce]
                    d2 = qx[qs + s : qs + e, None] - cx[None, lo + cs_ : lo + ce]
                    np.multiply(d2, d2, out=d2)
                    dy = qy[qs + s : qs + e, None] - cy[None, lo + cs_ : lo + ce]
                    np.multiply(dy, dy, out=dy)
                    d2 += dy
                    del dy
                    for j in range(n_extra):
                        dj = (
                            QE[qs + s : qs + e, j][:, None]
                            - CE[lo + cs_ : lo + ce, j][None, :]
                        )
                        np.multiply(dj, dj, out=dj)
                        d2 += dj
                        del dj
                    kk = min(k, ce - cs_)
                    part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                    pool_d2 = np.take_along_axis(d2, part, axis=1)
                    pmax = pool_d2.max(axis=1)
                    # ties live in DIST (sqrt) space: two d2 values a
                    # few ulp apart can round to the SAME sqrt, so the
                    # pool includes d2 in [pmax, pmax + 4 ulp]
                    thr = pmax + 4.0 * np.spacing(np.abs(pmax))
                    n_le = (d2 <= thr[:, None]).sum(axis=1)
                    # vectorized fast path (see run_subgroup_2d)
                    fresh = np.array(
                        [len(prev_d[qs + s + r]) == 0 for r in range(e - s)]
                    )
                    fast = fresh & (n_le <= kk)
                    if fast.any():
                        fidx = np.nonzero(fast)[0]
                        dd = np.sqrt(pool_d2[fidx])
                        ii = ids_c[part[fidx]]
                        o1 = np.argsort(ii, axis=1, kind="stable")
                        dd = np.take_along_axis(dd, o1, axis=1)
                        ii = np.take_along_axis(ii, o1, axis=1)
                        o2 = np.argsort(dd, axis=1, kind="stable")
                        dd = np.take_along_axis(dd, o2, axis=1)[:, :k]
                        ii = np.take_along_axis(ii, o2, axis=1)[:, :k]
                        for m, r in enumerate(fidx):
                            prev_d[qs + s + r] = dd[m]
                            prev_i[qs + s + r] = ii[m]
                    for r in np.nonzero(~fast)[0]:
                        if n_le[r] > kk:
                            idxs = np.nonzero(d2[r] <= thr[r])[0]
                        else:
                            idxs = part[r]
                        merge_into(
                            qs + s + r, np.sqrt(d2[r][idxs]), ids_c[idxs]
                        )

        # subgroup boundaries in the sorted queries; candidates matched
        # by binary search on the shared composite key
        bounds = np.concatenate(
            [[0], np.nonzero(qkv[1:] != qkv[:-1])[0] + 1, [nq]]
        )
        for g in range(len(bounds) - 1):
            qs, qe_ = int(bounds[g]), int(bounds[g + 1])
            if nc:
                key = qkv[qs]
                lo = int(np.searchsorted(ckv, key, side="left"))
                hi = int(np.searchsorted(ckv, key, side="right"))
            else:
                lo = hi = 0
            if hi > lo:
                if n_extra:
                    run_subgroup_nd(qs, qe_, lo, hi)
                else:
                    run_subgroup_2d(qs, qe_, lo, hi)

        for r in range(nq):
            out_d[r] = prev_d[r].tobytes()
            out_i[r] = prev_i[r].tobytes()
            out_cnt[r] = len(prev_d[r])
            out_kth[r] = prev_d[r][-1] if len(prev_d[r]) else np.inf

        out = {
            "qid": qid_a,
            "qx": qx,
            "qy": qy,
            "qix": qix_a,
            "qiy": qiy_a,
            "r_lo": qkey[:, 0],
            "r_hi": qkey[:, 1],
            "salt": qkey[:, 2],
            "cnt": out_cnt,
            "kth": out_kth,
            "best_dist": out_d,
            "best_id": out_i,
        }
        for i in range(n_extra):
            out[f"qe{i}"] = QE[:, i]
        return pd.DataFrame(out)

    return fn


def _small_frontier_knn(
    points: DataFrame, frontier_rows, k: int, extra_cols: tuple = ()
) -> DataFrame:
    """Exact kNN for a SMALL query set by broadcast + one map pass over
    the points (no candidate generation at all).  Straggler queries
    after the bulk round typically sit in sparse regions whose certify
    radius sweeps dense areas — ring candidates explode there, while a
    full scan is a few hundred numpy flops per point.

    frontier_rows: collected rows with qid/qx/qy (driver-scale by
    contract: callers gate on a flop budget), plus optionally cnt/kth —
    the straggler's carried state from the ring rounds.  Returns
    (qid, id, dist, rank).

    r6 round 3 — carried-bound box prune: a straggler with cnt >= k
    already holds k true candidates whose k-th distance ``kth`` is an
    UPPER bound on its true k-th distance (merging more points only
    lowers it), so any point with |px-qx| > kth or |py-qy| > kth can
    never enter its top-k (a point at dist == kth CAN displace a
    same-dist larger id and is kept — bounds are inclusive, dilated a
    relative 1e-9 to dominate any f64 rounding chain).  The scan sorts
    each partition by x once and resolves each spatially-sorted query
    chunk against only the points inside the chunk's kth-dilated
    bounding box (searchsorted x-slice + y mask) — measured 60s of
    scan CPU -> ~2s for the 1342-straggler clustered 1M build, output
    identical (the pruned points are provably outside every chunk
    member's top-k; queries with cnt < k keep the full scan)."""
    nq_all = len(frontier_rows)
    qid = np.array([r["qid"] for r in frontier_rows], dtype=np.int64)
    qx = np.array([r["qx"] for r in frontier_rows], dtype=np.float64)
    qy = np.array([r["qy"] for r in frontier_rows], dtype=np.float64)
    n_extra = len(extra_cols)
    qe = (
        np.column_stack(
            [np.array([r[f"qe{i}"] for r in frontier_rows], dtype=np.float64) for i in range(n_extra)]
        )
        if n_extra
        else None
    )
    # per-query upper bound on the true k-th distance (inf = no bound)
    kth_ub = np.full(nq_all, np.inf)
    try:
        cnt_a = np.array([r["cnt"] for r in frontier_rows], dtype=np.int64)
        kth_a = np.array([r["kth"] for r in frontier_rows], dtype=np.float64)
        has = cnt_a >= k
        kth_ub[has] = kth_a[has]
    except Exception:
        pass  # rows without carried state: unbounded scan
    # spatial chunking: bounded queries sorted by (x, y) so chunk boxes
    # stay tight; unbounded (inf) queries go LAST in their own chunks
    # so one of them never widens a bounded chunk to a full scan
    qord = np.lexsort((qy, qx, ~np.isfinite(kth_ub)))
    qid, qx, qy, kth_ub = qid[qord], qx[qord], qy[qord], kth_ub[qord]
    if n_extra:
        qe = qe[qord]

    def scan(batches):
        # per-partition running top-k per query
        best_d = [np.empty(0)] * len(qid)
        best_i = [np.empty(0, dtype=np.int64)] * len(qid)
        for b in batches:
            px = b["x"].to_numpy(dtype=np.float64)
            py = b["y"].to_numpy(dtype=np.float64)
            pid = b["id"].to_numpy(dtype=np.int64)
            pe = (
                np.column_stack(
                    [b[c].to_numpy(dtype=np.float64) for c in extra_cols]
                )
                if n_extra
                else None
            )
            # sort by x for the box prune's searchsorted slice.  The
            # point order never affects output: the pool predicate
            # d <= pmax is position-independent, the tie-widened path
            # takes ALL boundary ties, and the final (dist, id) lexsort
            # canonicalizes order.
            order = np.argsort(px, kind="stable")
            px, py, pid = px[order], py[order], pid[order]
            if n_extra:
                pe = pe[order]
            for s in range(0, len(qid), 128):
                e = min(s + 128, len(qid))
                M = float(kth_ub[s:e].max())
                if np.isfinite(M):
                    # inclusive box, dilated to dominate rounding
                    Me = M * (1.0 + 1e-9) + 1e-300
                    lo = int(np.searchsorted(px, qx[s:e].min() - Me, "left"))
                    hi = int(np.searchsorted(px, qx[s:e].max() + Me, "right"))
                    ym = (py[lo:hi] >= qy[s:e].min() - Me) & (
                        py[lo:hi] <= qy[s:e].max() + Me
                    )
                    sel = np.nonzero(ym)[0] + lo
                    if not len(sel):
                        continue
                    cx_, cy_, ci_ = px[sel], py[sel], pid[sel]
                    ce_ = pe[sel] if n_extra else None
                else:
                    cx_, cy_, ci_, ce_ = px, py, pid, pe
                d = qx[s:e, None] - cx_[None, :]
                np.multiply(d, d, out=d)
                dy = qy[s:e, None] - cy_[None, :]
                np.multiply(dy, dy, out=dy)
                d += dy
                del dy
                for j in range(n_extra):
                    dj = qe[s:e, j][:, None] - ce_[:, j][None, :]
                    np.multiply(dj, dj, out=dj)
                    d += dj
                    del dj
                np.sqrt(d, out=d)
                kk = min(k, d.shape[1])
                # argpartition (O(n)) + exact tie-widening instead of a
                # full-row argsort — the row sort was ~80% of the brute
                # tail's wall time.  Distances here are exact f64, so
                # "<= pool max" captures every k-th-boundary tie exactly.
                part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
                pmax = np.take_along_axis(d, part, axis=1).max(axis=1)
                wide = (d <= pmax[:, None]).sum(axis=1) > kk
                for r in range(e - s):
                    idxs = np.nonzero(d[r] <= pmax[r])[0] if wide[r] else part[r]
                    dd = d[r][idxs]
                    ii = ci_[idxs]
                    o = np.lexsort((ii, dd))[:kk]
                    dd, ii = dd[o], ii[o]
                    if len(best_d[s + r]):
                        md = np.concatenate([best_d[s + r], dd])
                        mi = np.concatenate([best_i[s + r], ii])
                        mo = np.lexsort((mi, md))[:k]
                        best_d[s + r], best_i[s + r] = md[mo], mi[mo]
                    else:
                        best_d[s + r], best_i[s + r] = dd, ii
        rows = {
            "qid": [], "id": [], "dist": [], "rank": [],
        }
        for r in range(len(qid)):
            n = len(best_d[r])
            if not n:
                continue
            rows["qid"].append(np.full(n, qid[r], dtype=np.int64))
            rows["id"].append(best_i[r])
            rows["dist"].append(best_d[r])
            rows["rank"].append(np.arange(1, n + 1, dtype=np.int32))
        if rows["qid"]:
            yield pd.DataFrame({c: np.concatenate(v) for c, v in rows.items()})

    from rindex_spark.plans.scan import spread_scan

    partials = spread_scan(points.select("id", "x", "y", *extra_cols)).mapInPandas(
        scan, schema="qid long, id long, dist double, rank int"
    )
    # partition-local top-k lists -> global top-k (tiny volume:
    # n_queries * k * n_partitions rows)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        partials.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "id", "dist", F.col("rk").cast("int").alias("rank"))
    )


def _unpack_best(batches):
    """mapInPandas: packed binary best lists -> (qid, id, dist, rank).

    r6: vectorized — the packed per-query byte strings concatenate into
    ONE buffer per Arrow batch (b"".join + np.frombuffer), qid/rank come
    from np.repeat/arange segment arithmetic.  The old per-query Python
    loop cost ~3 µs x n_queries per build (~3 s CPU at 1M points)."""
    for b in batches:
        bd = b["best_dist"]
        bi = b["best_id"]
        lens = np.fromiter(
            (0 if x is None else len(x) >> 3 for x in bd),
            dtype=np.int64,
            count=len(bd),
        )
        total = int(lens.sum())
        if total == 0:
            continue
        d = np.frombuffer(b"".join(x for x in bd if x), dtype=np.float64)
        i = np.frombuffer(b"".join(x for x in bi if x), dtype=np.int64)
        qids = np.repeat(b["qid"].to_numpy(dtype=np.int64), lens)
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        rank = (
            np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], lens) + 1
        ).astype(np.int32)
        yield pd.DataFrame({"qid": qids, "id": i, "dist": d, "rank": rank})


def knn_for_queries(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec | None = None,
    cfg: EngineConfig | None = None,
    queries_within_extent: bool = False,
    extra_cols: tuple = (),
    extent=None,
) -> DataFrame:
    """Exact kNN of each query point against ``points``.

    points:  columns (id long, x double, y double[, *extra_cols])
    queries: columns (qid long, x double, y double[, *extra_cols])
    returns: (qid long, id long, dist double, rank int) — rank 1..k by
             (dist, id); fewer than k rows per qid when the dataset has
             fewer than k points (the reference pads with infinity
             dummies and filters them on read-out, rindex.rs:279-283 —
             we simply omit them).

    ``extra_cols`` names additional coordinate columns (D > 2 — the
    reference API is const-generic [f64; D], lib/src/rindex.rs:34,
    node.rs:34).  The grid indexes the leading (x, y) pair only; the
    kernel computes exact full-D distances, and the 2-D ring lower
    bound remains a valid termination certificate because
    dist_D(q, p) >= dist_2(q, p) >= ring_lower_bound for any point
    outside the visited ring.  Convergence just takes more rounds in
    higher D (rings certify later), never wrong answers.

    ``query_neighbors`` parity: rindex.rs:197-214.  k <= 0 or empty
    points => empty result (rindex.rs:198-200).

    ``extent`` (optional): a precomputed extent row/dict with keys
    (n, xmin, xmax, ymin, ymax) for ``points`` — callers running many
    ops on the same point set (bench suites, batch replay) pass it
    together with ``spec`` so no per-call fixed driver job remains
    (grid.grid_and_extent computes both in one aggregate).
    """
    extra_cols = tuple(extra_cols)
    n_extra = len(extra_cols)
    spark = points.sparkSession
    # supercell side (cells) — read once per call so every round of one
    # call agrees (the annulus trim's klo is interpreted in THIS scale)
    _ss = int(os.environ.get("RINDEX_SUPER_SHIFT", str(_SUPER_SHIFT)))
    _S = 1 << _ss
    out_schema = "qid long, id long, dist double, rank int"
    # k = 0 / empty index => empty result (rindex.rs:198-200), before any
    # config validation (the reference validates k only at construction).
    if k <= 0:
        return spark.createDataFrame([], out_schema)
    cfg = cfg or EngineConfig(k=k)

    # one aggregate job yields both the grid spec and the extent
    ext = extent if extent is not None else points.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    ).collect()[0]
    if not ext["n"]:
        return spark.createDataFrame([], out_schema)
    if spec is None:
        from rindex_spark.grid import grid_from_extent

        spec = grid_from_extent(ext, cfg)
        # density-adaptive shrink: skewed (clustered/urban) data makes
        # mean-sized cells quadratically expensive in the cores
        from rindex_spark.grid import with_cells as _wc

        occ = (
            _wc(points.select("x", "y"), spec)
            .groupBy("ix", "iy")
            .agg(F.count(F.lit(1)).alias("occ"))
        )
        p = occ.agg(F.expr("percentile(occ, 0.95, occ)").alias("p")).collect()[0]["p"]
        t = cfg.effective_target_per_cell
        if p and p > 2.0 * t:
            spec = GridSpec(
                cell_size=max(spec.cell_size * (t / p) ** 0.5, 1e-9),
                x0=spec.x0,
                y0=spec.y0,
            )

    # Ring radius that certifies full coverage of the data extent from
    # ANY query cell (termination backstop for k > n / far-out queries):
    # the Chebyshev span of the combined data+query bounding box.
    # queries_within_extent=True (e.g. the self kNN graph) skips the
    # query-extent job.
    if queries_within_extent:
        span = max(ext["xmax"] - ext["xmin"], ext["ymax"] - ext["ymin"])
    else:
        qext = queries.agg(
            F.min("x").alias("xmin"),
            F.max("x").alias("xmax"),
            F.min("y").alias("ymin"),
            F.max("y").alias("ymax"),
        ).collect()[0]

        def _mm(fn, *vals):
            vs = [v for v in vals if v is not None]
            return fn(vs)

        span = max(
            _mm(max, ext["xmax"], qext["xmax"]) - _mm(min, ext["xmin"], qext["xmin"]),
            _mm(max, ext["ymax"], qext["ymax"]) - _mm(min, ext["ymin"], qext["ymin"]),
        )
    r_max = int(span / spec.cell_size) + 2

    pts = with_cells(points.select("id", "x", "y", *extra_cols), spec)
    pts = pts.withColumn("sx", F.shiftright("ix", _ss)).withColumn(
        "sy", F.shiftright("iy", _ss)
    )

    # initial ring radius per SUPERCELL, derived from local density: the
    # smallest window expected to hold >= k neighbors.  Dense cores get
    # khi=1; sparse regions start wide instead of burning rounds (one
    # khi per supercell, so the group count is unchanged).
    sc_counts = (
        pts.groupBy("sx", "sy")
        .agg(F.count(F.lit(1)).alias("sc_n"))
        # fresh names: frontier may share lineage with pts (self kNN),
        # and same-name keys trip Catalyst's ambiguous-self-join check
        .select(
            F.col("sx").alias("scx"), F.col("sy").alias("scy"), "sc_n"
        )
    )
    occ_cell = F.col("sc_n") / F.lit(float(_S * _S))
    # khi0 factor re-swept in r6 (1M clustered e2e corpus, interleaved
    # best-of-3, kernel already vectorized): factor 2.0 ships 3.48x of
    # n at 12.8s; 1.5 ships 3.07x at 11.9s; 1.0 ships 2.67x at 11.9s
    # with a doubled (but gate-trivial) brute tail; 3.0 ships 4.30x at
    # 12.2s.  All converge in ONE round on both corpus shapes.  1.5 is
    # the new default — same wall as 1.0 with more sparse-corpus
    # margin; the env knob is for re-sweeping on new data shapes.
    khi0_factor = float(os.environ.get("RINDEX_KHI0_FACTOR", "1.5"))
    khi0 = F.least(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(
                F.sqrt(
                    F.lit(khi0_factor * k) / F.greatest(occ_cell, F.lit(0.05))
                )
            ).cast("long"),
        ),
        F.lit(_KHI0_CAP).cast("long"),
        F.lit(r_max).cast("long"),
    )

    frontier = (
        with_cells(
            queries.select(
                "qid",
                F.col("x").alias("qx"),
                F.col("y").alias("qy"),
                *[F.col(c).alias(f"qe{i}") for i, c in enumerate(extra_cols)],
            ),
            spec,
            x="qx",
            y="qy",
            prefix="q",
        )
        .withColumn("sx", F.shiftright("qix", _ss))
        .withColumn("sy", F.shiftright("qiy", _ss))
        .join(
            F.broadcast(sc_counts),
            (F.col("sx") == F.col("scx")) & (F.col("sy") == F.col("scy")),
            "left",
        )
        .drop("scx", "scy")
        .na.fill({"sc_n": 0})
        .withColumn("r_lo", F.lit(-1).cast("long"))
        .withColumn("r_hi", khi0)
        .withColumn(
            # hot-supercell salting: split oversized query groups so no
            # single task owns a skewed cell
            "salt",
            F.when(
                F.col("sc_n") > _MAX_GROUP_QUERIES,
                F.pmod(
                    F.xxhash64("qid"),
                    F.ceil(F.col("sc_n") / F.lit(_MAX_GROUP_QUERIES)).cast("long"),
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .drop("sc_n")
        .withColumn("cnt", F.lit(0).cast("long"))
        .withColumn("kth", F.lit(float("inf")))
        .withColumn("best_dist", F.lit(b""))
        .withColumn("best_id", F.lit(b""))
    )

    round_udf = _make_round_udf(k, n_extra=n_extra)
    state_schema = _state_schema(n_extra)
    finished_parts: list[DataFrame] = []
    debug = bool(os.environ.get("RINDEX_DEBUG_TIMING"))
    # cogroup on a HASH BUCKET of the supercell key, not the key itself:
    # millions of points mean tens of thousands of supercell groups, and
    # Spark's per-group pandas machinery was ~95% of round CPU.  Buckets
    # keep each task's Arrow/pandas overhead O(1); the UDF slices
    # subgroups out with one sort + searchsorted.  16x parallelism (r6:
    # was 4x): with shuffle partitions at core count, 4 buckets per
    # task is LUMPY — the round stage ran 2x-skewed (task runtime 68s /
    # 32 tasks but 4.5s wall at 1M events); 16 buckets per task smooths
    # the hash placement (interleaved A/B best-of-4: 6.25s -> 5.36s)
    # while each bucket still holds thousands of queries, so the
    # per-bucket slicing overhead stays noise.
    n_buckets = int(
        os.environ.get("RINDEX_KNN_BUCKETS", 0)
    ) or max(64, spark.sparkContext.defaultParallelism * 16)
    # gk: the (supercell, window, salt) identity packed into ONE long
    # (xxhash64) — candidates ship 1 key column instead of 5 (40 of the
    # 64 bytes/row of the big shuffle side); see _fn on why collisions
    # are harmless.  The cogroup bucket is pmod(gk, B).
    q_gk = F.xxhash64("sx", "sy", "r_lo", "r_hi", "salt").alias("gk")
    c_gk = F.xxhash64("ksx", "ksy", "klo", "khi", "ksalt").alias("gk")

    # RINDEX_KNN_KEEP_STATES: bench A/B hook (r4 verdict item 1) — keep
    # the previous call's persisted round states so an IDENTICAL build
    # reuses them via Spark's structural plan-cache match, reproducing
    # the r3 "warm" cache-hit behaviour the release fix removed.  The
    # side-by-side number quantifies how much of a timing delta is the
    # honesty fix vs machine weather.
    if not os.environ.get("RINDEX_KNN_KEEP_STATES"):
        release_round_states()  # free the PREVIOUS call's cached rounds
    stats_on = bool(os.environ.get("RINDEX_KNN_STATS"))
    shipped_rows = 0
    rounds_run = 0
    brute_tail = 0
    for _round in range(cfg.max_rounds):
        _t0 = _time.monotonic()
        # candidate points for each DISTINCT (supercell, ring window):
        # the supercell block dilated by r_hi — in SUPERCELL units the
        # halo is ceil(r_hi / S) so the explode stays small; cell-exact
        # over-inclusion is fine (the UDF merge dedupes).
        ring_keys = frontier.select(
            F.col("sx").alias("ksx"),
            F.col("sy").alias("ksy"),
            F.col("r_lo").alias("klo"),
            F.col("r_hi").alias("khi"),
            F.col("salt").alias("ksalt"),
        ).distinct()
        halo = F.ceil(F.col("khi") / F.lit(_S)).cast("long")
        cells = ring_keys.withColumn(
            "csx", F.explode(F.sequence(F.col("ksx") - halo, F.col("ksx") + halo))
        ).withColumn(
            "csy", F.explode(F.sequence(F.col("ksy") - halo, F.col("ksy") + halo))
        )
        # cell-exact trim of the supercell halo: keep only points within
        # Chebyshev khi CELLS of the supercell's member-cell range (the
        # union of every member query's needed annulus)
        lo_x = F.col("ksx") * _S - F.col("khi")
        hi_x = F.col("ksx") * _S + (_S - 1) + F.col("khi")
        lo_y = F.col("ksy") * _S - F.col("khi")
        hi_y = F.col("ksy") * _S + (_S - 1) + F.col("khi")
        # ANNULUS trim: drop the already-seen inner block [range +- klo].
        # Valid because (a) klo = each member query's own previous khi
        # (r_lo carries the prior window and is part of the group key),
        # (b) the previous round's candidate set for this (sx, sy, salt)
        # group was exactly the block [range +- klo], and (c) the kernel
        # merges EVERY group candidate into EVERY member query's carried
        # top-k — so every inner-block point is already reflected in the
        # carried state and re-shipping it is pure waste.  Round 0
        # (klo = -1) keeps the full block.
        seen_lo_x = F.col("ksx") * _S - F.col("klo")
        seen_hi_x = F.col("ksx") * _S + (_S - 1) + F.col("klo")
        seen_lo_y = F.col("ksy") * _S - F.col("klo")
        seen_hi_y = F.col("ksy") * _S + (_S - 1) + F.col("klo")
        # qualified alias: frontier's subtree references pts (density
        # join), so this is a self-join from Catalyst's point of view
        cp = pts.alias("cp")
        cand = (
            cells.join(
                cp,
                (F.col("csx") == F.col("cp.sx")) & (F.col("csy") == F.col("cp.sy")),
                "inner",
            )
            .filter(
                (F.col("cp.ix") >= lo_x)
                & (F.col("cp.ix") <= hi_x)
                & (F.col("cp.iy") >= lo_y)
                & (F.col("cp.iy") <= hi_y)
            )
            .filter(
                (F.col("klo") < 0)
                | (F.col("cp.ix") < seen_lo_x)
                | (F.col("cp.ix") > seen_hi_x)
                | (F.col("cp.iy") < seen_lo_y)
                | (F.col("cp.iy") > seen_hi_y)
            )
            .select(
                c_gk, F.col("cp.id").alias("id"), F.col("cp.x").alias("x"),
                F.col("cp.y").alias("y"),
                *[F.col(f"cp.{c}").alias(f"e{i}") for i, c in enumerate(extra_cols)],
            )
        )

        # persist (NOT localCheckpoint): the n_left count below doubles
        # as the materializer, saving one job per round — measured 6.7s
        # -> 3.8s for the 100k self-graph at local[32].  Lineage stays
        # intact (rounds are few, plans stay shallow); the cp alias on
        # pts already disambiguates the self-join.  MEMORY_ONLY is
        # deliberate (f14cfce): finished_parts keep referencing every
        # round's state until the caller consumes the output, so
        # MEMORY_AND_DISK would accumulate disk blocks across a long
        # session; under memory pressure eviction recomputes a
        # deterministic lineage instead (bounded: rounds are few).
        state = (
            frontier.withColumn("gk", q_gk)
            .withColumn("bkt", F.pmod(F.col("gk"), F.lit(n_buckets)))
            .groupBy("bkt")
            .cogroup(
                cand.withColumn(
                    "bkt", F.pmod(F.col("gk"), F.lit(n_buckets))
                ).groupBy("bkt")
            )
            .applyInPandas(round_udf, schema=state_schema)
            .persist(StorageLevel.MEMORY_ONLY)
        )
        _round_states.append(state)

        lb = ring_lower_bound(
            spec, F.col("qx"), F.col("qy"), F.col("qix"), F.col("qiy"), F.col("r_hi")
        )
        state = state.withColumn("lb", lb).withColumn(
            "is_done",
            ((F.col("cnt") >= k) & (F.col("kth") < F.col("lb")))
            | (F.col("r_hi") >= r_max),
        )

        finished_parts.append(
            state.filter("is_done")
            .select("qid", "best_dist", "best_id")
            .mapInPandas(_unpack_best, schema=out_schema)
        )

        next_frontier = (
            state.filter(~F.col("is_done"))
            .withColumn("sx", F.shiftright("qix", _ss))
            .withColumn("sy", F.shiftright("qiy", _ss))
            .withColumn("r_lo", F.col("r_hi"))
            .withColumn(
                # Ring jump: lb(R') >= R'*cs, so R' = floor(kth/cs)+1
                # certifies the current k-th distance in one more round.
                # Geometric clamp (<= 2R+8) bounds halo size; r_max caps
                # at full coverage.
                "r_hi",
                F.least(
                    F.greatest(
                        F.col("r_hi") + 1,
                        F.when(
                            F.col("cnt") >= k,
                            F.floor(F.col("kth") / F.lit(spec.cell_size)) + 1,
                        ).otherwise(F.col("r_hi") * 2 + 8),
                    ),
                    F.col("r_hi") * 2 + 8,
                    F.lit(r_max).cast("long"),
                ),
            )
            .drop("lb", "is_done")
        )
        n_left = next_frontier.count()
        rounds_run = _round + 1
        if stats_on:
            # recomputes the candidate join (cand is uncached) — one
            # extra job per round, opt-in by construction
            shipped_rows += cand.count()
        if debug:
            # candidate-volume diagnostic (costs one extra job; debug
            # only): shipped rows / n_points = the replication factor
            # the annulus trim + khi0 policy control
            n_cand = cand.count()
            print(
                f"[knn round {_round}] left={n_left} cand={n_cand} "
                f"(x{n_cand / max(ext['n'], 1):.2f} of n) "
                f"{_time.monotonic() - _t0:.2f}s cs={spec.cell_size:.3g}",
                flush=True,
            )
        if n_left == 0:
            break
        # small-frontier fallback: stragglers in sparse regions have
        # certify radii that sweep dense areas — ring candidates explode
        # there while a broadcast full scan costs a few flops per point.
        # The absolute row cap bounds the driver collect + closure size
        # even when the point set is tiny (flop gate alone would admit
        # multi-million-row collects).
        if (n_left * ext["n"] <= 4e9 and n_left <= 200_000) or n_left <= 512:
            # cnt/kth ride along: a straggler's carried k-th distance
            # is the exact box-prune bound for the brute scan
            rows = next_frontier.select(
                "qid", "qx", "qy", "cnt", "kth",
                *[f"qe{i}" for i in range(n_extra)],
            ).collect()
            finished_parts.append(
                _small_frontier_knn(points, rows, k, extra_cols=extra_cols)
            )
            brute_tail = n_left
            if debug:
                print(f"[knn brute] {n_left} stragglers via full scan", flush=True)
            break
        frontier = next_frontier
    else:
        raise RuntimeError(
            f"knn_for_queries did not converge in {cfg.max_rounds} rounds"
        )

    if stats_on:
        last_run_stats.clear()
        last_run_stats.update(
            {
                "rounds": rounds_run,
                "shipped_rows": int(shipped_rows),
                "n_points": int(ext["n"]),
                "replication": round(shipped_rows / max(int(ext["n"]), 1), 3),
                "brute_tail_queries": int(brute_tail),
            }
        )
    out = finished_parts[0]
    for part in finished_parts[1:]:
        out = out.unionByName(part)
    # bound the output partition count: the union concatenates one
    # partition set per ring round
    return out.coalesce(max(spark.sparkContext.defaultParallelism, 2))


def build_knn_graph(
    points: DataFrame,
    k: int,
    spec: GridSpec | None = None,
    cfg: EngineConfig | None = None,
    extra_cols: tuple = (),
    extent=None,
) -> DataFrame:
    """The materialized kNN graph: every point's k nearest neighbors
    INCLUDING itself at distance 0.0 / rank 1 (reference invariant:
    a point seeds its own heap with (0.0, self), rindex.rs:481;
    confirmed by neighbors_of in usage.rs:16-17 and the demo edge list
    self-loops, demo/data/knn.csv:1).

    returns: (src long, dst long, dist double, rank int)
    """
    queries = points.select(F.col("id").alias("qid"), "x", "y", *extra_cols)
    g = knn_for_queries(
        points, queries, k, spec=spec, cfg=cfg,
        queries_within_extent=True, extra_cols=extra_cols, extent=extent,
    )
    return g.select(
        F.col("qid").alias("src"), F.col("id").alias("dst"), "dist", "rank"
    )