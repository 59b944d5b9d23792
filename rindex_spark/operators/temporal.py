"""Temporal joins over event streams — the as-of join.

``asof_join(left, right)``: for every left row, the LATEST right row
with the same key and ``right.ts <= left.ts`` (or strictly ``<``) —
the canonical "state at the time of the event" join (prices at trade
time, page version at crawl time, user profile at click time).

Distributed shape — the standard scalable plan, no range explode and
no per-key Python:

1. UNION the two sides (right rows carry ONE struct of all their
   value columns; the struct is null on left rows), tagging each
   row's side.
2. ONE window partitioned by key, ordered by (ts, side-order, right
   tie-break): ``last(struct, ignorenulls=True)`` carries the most
   recent right ROW forward onto every subsequent row.  Carrying the
   whole row as a struct (not per-column lasts) guarantees every
   ``r_*`` output column comes from the SAME right row — including
   that row's genuine nulls (per-column ignorenulls would skip a
   null field and backfill it from an OLDER right row).
3. keep only left rows and unpack the struct fields.

Cost = one keyed shuffle + in-partition sort over |L| + |R| rows —
the same exchange a plain equi-join on the key would pay; Catalyst
runs the carry-forward as a single Window node.  Skewed keys hurt
exactly like any keyed window; salt or split hot keys upstream (the
engine's hot-host/hot-cell pattern).

Equal-timestamp semantics: with inclusive matching a right row AT the
left row's timestamp matches (right sorts before left at equal ts);
with ``strict=True`` it does not.  Ties among right rows at the same
(key, ts) break toward the largest tie-break id — pass
``right_id_col`` for a deterministic winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | tuple = ("user_id",),
    ts_col: str = "ts",
    right_cols: list[str] | tuple | None = None,
    prefix: str = "r_",
    strict: bool = False,
    right_id_col: str | None = None,
) -> DataFrame:
    """left-as-of join: left columns + ``prefix``-renamed right value
    columns (null when no prior right row exists for the key)."""
    key_cols = list(key_cols)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in key_cols and c != ts_col
        ]
    right_cols = list(right_cols)

    # side order: inclusive -> right first at equal ts (so it is
    # visible to the left row); strict -> left first (so it is not)
    l_ord, r_ord = (1, 0) if not strict else (0, 1)
    lt = left.withColumn("_side", F.lit(l_ord))
    rt = right.select(
        *key_cols,
        ts_col,
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_rv"),
    ).withColumn("_side", F.lit(r_ord))
    tie = (
        F.col("_rv").getField(right_id_col)
        if right_id_col is not None and right_id_col in right_cols
        else F.lit(0)
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_rvc", F.last("_rv", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == l_ord).select(
        *left.columns,
        *[F.col("_rvc").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    iid_col: str = "iid",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_width_sec: float | None = None,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Containment join: (iid, event_id) for every event with
    ``t_start <= ts <= t_end`` (inclusive both ends) — events within
    sessions, trades within halts, crawls within outages.

    The 1-D analogue of the spatial ``range_join``'s filter-and-refine:
    time is bucketed at ``bucket_width_sec``, each interval EXPLODES
    to its covering buckets (pure sequence/explode), events map to
    their single bucket, the bucket equi-join prunes, and the exact
    BETWEEN refine runs as a column expression.

    ``bucket_width_sec`` SHOULD be passed explicitly (any width within
    ~an order of magnitude of the mean interval length works; results
    are width-independent).  When omitted, the mean interval span is
    aggregated on every call — a fixed driver job per invocation, the
    same class range_join's ``extent=`` parameter amortizes away
    (callers that loop this operator must pass the width).  An event has exactly ONE bucket, so each (iid, event)
    pair survives at most once — no distinct needed.  A plain
    theta-join here would be a broadcast-nested-loop over
    |events| x |intervals|; the bucket join replaces it exactly like
    covering cells replace the all-pairs distance join.

    Intervals whose covering-bucket count exceeds
    ``max_buckets_per_interval`` (pathologically long spans) take a
    broadcast theta scan instead — the same extent-scale guard as
    range_join; intervals are the dimension side by contract.

    returns (iid, event_id).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    iv = intervals.select(
        F.col(iid_col).alias("iid"),
        s_us.alias("_s"),
        e_us.alias("_e"),
    )
    if bucket_width_sec is None:
        row = iv.agg(F.avg(F.col("_e") - F.col("_s")).alias("m")).collect()[0]
        width_us = max(int(row["m"] or 0), 1_000_000)
    else:
        width_us = max(int(bucket_width_sec * 1_000_000), 1)

    ev = events.select(
        F.col(id_col).alias("event_id"), us.alias("_t")
    ).withColumn("_b", F.expr(f"CAST(_t DIV {width_us} AS LONG)"))

    b_lo = F.expr(f"CAST(_s DIV {width_us} AS LONG)")
    b_hi = F.expr(f"CAST(_e DIV {width_us} AS LONG)")
    n_buckets = b_hi - b_lo + 1

    small = iv.filter(n_buckets <= max_buckets_per_interval)
    big = iv.filter(n_buckets > max_buckets_per_interval)

    covered = small.withColumn("_b", F.explode(F.sequence(b_lo, b_hi)))
    joined = covered.join(ev, "_b").filter(
        (F.col("_t") >= F.col("_s")) & (F.col("_t") <= F.col("_e"))
    )
    scanned = ev.join(F.broadcast(big)).filter(
        (F.col("_t") >= F.col("_s")) & (F.col("_t") <= F.col("_e"))
    )
    return joined.select("iid", "event_id").unionByName(
        scanned.select("iid", "event_id")
    )
