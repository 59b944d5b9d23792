"""Temporal joins over event streams — the as-of join.

``asof_join(left, right)``: for every left row, the LATEST right row
with the same key and ``right.ts <= left.ts`` (or strictly ``<``) —
the canonical "state at the time of the event" join (prices at trade
time, page version at crawl time, user profile at click time).

Distributed shape — the standard scalable plan, no range explode and
no per-key Python:

1. UNION the two sides (right columns null on left rows and vice
   versa), tagging each row's side.
2. ONE window partitioned by key, ordered by (ts, side-order, right
   tie-break): ``last(col, ignorenulls=True)`` carries the most
   recent right values forward onto every subsequent row.
3. keep only left rows.

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
        *[F.col(c).alias(f"_rv_{c}") for c in right_cols],
    ).withColumn("_side", F.lit(r_ord))
    tie = (
        F.col(f"_rv_{right_id_col}")
        if right_id_col is not None and right_id_col in right_cols
        else F.lit(0)
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(
            f"{prefix}{c}", F.last(f"_rv_{c}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("_side") == l_ord).select(
        *left.columns, *[f"{prefix}{c}" for c in right_cols]
    )
