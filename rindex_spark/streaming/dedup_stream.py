"""Streaming exact deduplication — a custom STATEFUL operator
(applyInPandasWithState), the training-pipeline op Spark has no
built-in for: emit each distinct document text exactly once across the
WHOLE stream, not per micro-batch.

Dropping `dropDuplicates` on a stream without watermark keeps state
forever too, but gives no control over WHICH row survives; this
operator deterministically keeps the lowest doc_id of the first batch
that carries the text (so replays/retries converge to the same
survivor set), and its state is one boolean per distinct hash — the
minimum possible.

Scale notes: state is keyed by md5(text) — the shuffle partitions by
hash, so state growth is uniform by construction (no hot keys possible
beyond true duplicate mass).  State size is O(distinct texts); at
10^12-doc scale that calls for RocksDB state store + TTL, which is a
config choice, not a plan change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id long, text_hash string"
STATE_SCHEMA = "seen boolean"


def stream_dedup(
    docs_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """docs stream -> (doc_id, text_hash): the FIRST occurrence of each
    distinct text across all micro-batches (lowest id within the first
    batch that carries it)."""
    hashed = docs_stream.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash")
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # already emitted in an earlier batch: drop everything
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf["doc_id"].min()
                best = m if best is None else min(best, int(m))
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({"doc_id": [int(best)], "text_hash": [key[0]]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
