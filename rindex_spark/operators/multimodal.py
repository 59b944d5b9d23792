"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual codec work is STUBBED behind
``decoder=`` hooks because no image/audio libraries exist in this
container — ``deterministic_fake_decoder`` stands in so the pipeline is
end-to-end testable, and a real decoder (PIL/ffmpeg) drops into the
same signature unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"


def deterministic_fake_decoder(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Stand-in decode+featurize: a deterministic feature vector from
    the payload bytes.  Replace with a real codec (e.g. PIL -> resize ->
    channel means) keeping the same signature."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def real_image_decoder(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """The production hook: decode -> resize -> feature-extract.
    Requires an imaging library that is NOT in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "use deterministic_fake_decoder for plumbing tests"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = deterministic_fake_decoder,
    batch_limit: int = 256,
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> features (FEATURE_SCHEMA) via mapInPandas.

    Arrow streams batches through Python once; ``batch_limit`` re-chunks
    oversized Arrow batches so peak memory stays bounded even with
    multi-MB payloads per row (binary columns dominate batch size, not
    row count)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start in range(0, len(b), batch_limit):
                chunk = b.iloc[start : start + batch_limit]
                feats = [decoder(p, k) for p, k in zip(chunk["payload"], chunk["kind"])]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"].to_numpy(),
                        "feature": [f.tolist() for f in feats],
                        "feat_dim": [len(f) for f in feats],
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def generate_media(spark, n: int, kind: str = "image", partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (same purity rule as datagen.generate_pages)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            payloads = [
                (np.arange(64, dtype=np.uint8) * ((i % 251) + 1) % 256).astype(np.uint8).tobytes()
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": payloads,
                    "mime": [f"{kind}/fake"] * len(ids),
                    "width": [64] * len(ids),
                    "height": [1] * len(ids),
                    "duration_ms": [0] * len(ids),
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)
