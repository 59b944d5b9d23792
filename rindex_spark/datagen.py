"""Deterministic synthetic data generators (no external data).

Everything is a pure function of the row index (splitmix64 hashing), so
generation is DISTRIBUTED (mapInPandas over spark.range) and fully
reproducible regardless of partitioning — the properties a 10^12-doc
posture needs: no driver-side materialization, no RNG state shared
across partitions.

Generated artifacts (FIXTURES.md):
* pages     — Common-Crawl-style web pages (url, warc_ts, html binary,
              text, lang) with coordinates embedded as geo meta tags;
              ``text`` is the canonical extraction of ``html`` so the
              byte-identical invariant is testable.
* op streams — insert/delete sequences mirroring lib/tests/random.rs:
              p(delete)=0.2 of a uniformly-chosen live point, else
              insert uniform in [-100,100)^2.
* tiles     — deterministic diamond (L1-ball) polygons over the data
              extent for point-in-polygon parity tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession

BASE_TS = np.datetime64("2024-10-08T00:00:00")  # reference snapshot date

_WORDS = (
    "the of and to in is that with for was on as are this by from at an "
    "der die und das ist von mit ein auf le la et les des est dans pour "
    "el que de los en una por con para data web page crawl index spatial "
    "graph neighbor query point cluster tile cell grid spark engine"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def _unit(x: np.ndarray, salt: int) -> np.ndarray:
    """id -> deterministic uniform [0, 1)."""
    return _splitmix64(x + np.uint64(salt * 0x9E3779B9)).astype(np.float64) / 2.0**64


def coords_for_ids(ids: np.ndarray, dist: str = "clustered", seed: int = 0):
    """Deterministic (x, y) per id; 'uniform' in [-100,100)^2 (the
    reference's randomized-test domain, lib/tests/random.rs:24-25) or
    'clustered' 3-Gaussian (the demo sparse.csv shape: 108/176/190)."""
    ids = ids.astype(np.uint64)
    u1 = _unit(ids, seed * 4 + 1)
    u2 = _unit(ids, seed * 4 + 2)
    if dist == "uniform":
        x = u1 * 200.0 - 100.0
        y = u2 * 200.0 - 100.0
        return x, y
    # clustered: mixture weights 108/176/190 of 474 (sparse.csv shape)
    w = _unit(ids, seed * 4 + 3)
    centers = np.array([(60.0, 60.0), (-50.0, 10.0), (20.0, -70.0)])
    sigmas = np.array([8.0, 12.0, 5.0])
    c = np.where(w < 108 / 474, 0, np.where(w < (108 + 176) / 474, 1, 2))
    # Box-Muller from the two uniforms (guard u1=0)
    r = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-300)))
    x = centers[c, 0] + sigmas[c] * r * np.cos(2 * np.pi * u2)
    y = centers[c, 1] + sigmas[c] * r * np.sin(2 * np.pi * u2)
    return x, y


def _body_words_batch(ids: np.ndarray, n_words: int = 24) -> list[str]:
    """Deterministic word soup, reference implementation: one LCG step
    per word across the batch, then a per-row join.  Kept as the
    byte-parity oracle for ``_body_words_arrow`` (r6) — the join loop
    was 1.9s of a 3.2s 200k-row batch, so the hot path is Arrow now."""
    h = _splitmix64(ids.astype(np.uint64))
    words = np.asarray(_WORDS)
    cols = []
    mul = np.uint64(6364136223846793005)
    add = np.uint64(1442695040888963407)
    for _ in range(n_words):
        h = h * mul + add  # uint64 wraps (mod 2^64)
        cols.append(words[(h >> np.uint64(33)) % np.uint64(len(words))])
    mat = np.stack(cols, axis=1)
    return [" ".join(row) for row in mat]


def _body_words_arrow(ids: np.ndarray, n_words: int = 24):
    """Vectorized body builder (r6): same LCG word indices as
    ``_body_words_batch``, but the strings never touch Python — each
    word column is a dictionary take on the vocab and the space-join
    is ONE pyarrow kernel over all columns (guide §4.2).  Byte-
    identical by construction (same indices, same separator); measured
    1.35s -> 0.19s per 200k rows."""
    h = _splitmix64(ids.astype(np.uint64))
    words_a = pa.array(_WORDS)
    mul = np.uint64(6364136223846793005)
    add = np.uint64(1442695040888963407)
    nw = np.uint64(len(_WORDS))
    parts = []
    for _ in range(n_words):
        h = h * mul + add  # uint64 wraps (mod 2^64)
        parts.append(words_a.take(pa.array(((h >> np.uint64(33)) % nw).astype(np.int64))))
    return pc.binary_join_element_wise(*parts, " ")


_LANGS = ("en", "de", "fr", "es")


def page_batch(ids: np.ndarray, dist: str, seed: int, n_hosts: int = 97) -> pd.DataFrame:
    """Build one batch of pages for the given ids — reference
    implementation (per-row f-string assembly).  Kept as the
    byte-parity oracle for ``page_batch_arrow`` (r6), which the
    distributed generator uses."""
    ids = ids.astype(np.int64)
    x, y = coords_for_ids(ids.astype(np.uint64), dist=dist, seed=seed)
    # Zipf-ish host skew: inverse-quadratic ramp -> low host ids get
    # quadratically more pages (hot-key workload for salting tests)
    v = _splitmix64((ids + 7).astype(np.uint64)) % np.uint64(n_hosts * n_hosts)
    hosts = (n_hosts - 1) - np.sqrt(v.astype(np.float64)).astype(np.int64)
    bodies = _body_words_batch(ids)
    tss = BASE_TS + ids.astype("timedelta64[s]")

    urls, htmls, texts = [], [], []
    for idx in range(len(ids)):
        i = int(ids[idx])
        url = f"https://site{int(hosts[idx])}.example/page/{i}"
        title = f"Page {i}"
        body = bodies[idx]
        lat, lon = float(y[idx]), float(x[idx])
        html = (
            "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
            f"<meta name=\"geo.position\" content=\"{lat!r};{lon!r}\">"
            f"<title>{title}</title></head>"
            f"<body><h1>{title}</h1><p>{body}</p></body></html>"
        )
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(f"{title}\n{title}\n{body}")
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": tss.astype("datetime64[us]"),
            "html": htmls,
            "text": texts,
            "lang": np.asarray(_LANGS)[ids % 4],
            "page_id": ids,
        }
    )


def page_batch_arrow(ids: np.ndarray, dist: str, seed: int, n_hosts: int = 97) -> pa.RecordBatch:
    """Fully vectorized page builder (r6, guide §4.2): every string
    column is assembled with ONE ``binary_join_element_wise`` kernel
    over constant + per-row pieces; no per-row Python at all.  Byte-
    identity with ``page_batch`` is pinned by test (including the
    float coordinates: numpy's str() of a float64 is the same
    shortest-round-trip decimal as Python's repr()).  2.6-3.0s ->
    0.9-1.2s per 200k-row batch, and returning an Arrow RecordBatch
    lets the generator use mapInArrow — no pandas object-array
    round-trip on top."""
    ids = ids.astype(np.int64)
    x, y = coords_for_ids(ids.astype(np.uint64), dist=dist, seed=seed)
    v = _splitmix64((ids + 7).astype(np.uint64)) % np.uint64(n_hosts * n_hosts)
    hosts = (n_hosts - 1) - np.sqrt(v.astype(np.float64)).astype(np.int64)
    body = _body_words_arrow(ids)
    tss = (BASE_TS + ids.astype("timedelta64[s]")).astype("datetime64[us]")

    ids_s = pa.array(ids.astype("U"))
    hosts_s = pa.array(hosts.astype("U"))
    lat_s = pa.array(y.astype("U32"))
    lon_s = pa.array(x.astype("U32"))
    url = pc.binary_join_element_wise(
        pa.scalar("https://site"), hosts_s, pa.scalar(".example/page/"), ids_s, ""
    )
    title = pc.binary_join_element_wise(pa.scalar("Page "), ids_s, "")
    html = pc.binary_join_element_wise(
        pa.scalar(
            '<!DOCTYPE html><html><head><meta charset="utf-8">'
            '<meta name="geo.position" content="'
        ),
        lat_s,
        pa.scalar(";"),
        lon_s,
        pa.scalar('"><title>'),
        title,
        pa.scalar("</title></head><body><h1>"),
        title,
        pa.scalar("</h1><p>"),
        body,
        pa.scalar("</p></body></html>"),
        "",
    )
    text = pc.binary_join_element_wise(title, pa.scalar("\n"), title, pa.scalar("\n"), body, "")
    return pa.RecordBatch.from_arrays(
        [
            url,
            pa.array(tss),
            pc.cast(html, pa.binary()),
            text,
            pa.array(np.asarray(_LANGS)[ids % 4]),
            pa.array(ids),
        ],
        names=["url", "warc_ts", "html", "text", "lang", "page_id"],
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string, page_id long"


def generate_pages(
    spark: SparkSession,
    n: int,
    dist: str = "clustered",
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed page generation: spark.range -> mapInArrow (r6; was
    mapInPandas — the Arrow path skips the pandas object-array round
    trip and uses the vectorized ``page_batch_arrow`` builder).

    Every row is a pure function of its id, so the output is identical
    under any partitioning — the generator itself scales with the
    cluster (no driver bottleneck)."""

    def gen(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            ids = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
            yield page_batch_arrow(ids, dist=dist, seed=seed)

    rng = spark.range(0, n, 1, partitions or max(1, min(64, n // 10_000 + 1)))
    return rng.mapInArrow(gen, schema=PAGES_SCHEMA)


def generate_ops(n_steps: int, seed: int = 0, p_delete: float = 0.2) -> list[tuple]:
    """Insert/delete stream mirroring lib/tests/random.rs:16-28: at each
    step, with p=0.2 delete a uniformly-chosen live point, else insert a
    uniform point in [-100,100)^2.  Returns rows
    (seq, op, id, x, y) — x/y None for deletes.  Op streams are
    driver-scale metadata (the data-scale path is generate_pages)."""
    rows: list[tuple] = []
    live: list[int] = []
    next_id = 0
    for seq in range(n_steps):
        h = _splitmix64(np.array([seed * 1_000_003 + seq], dtype=np.uint64))
        u = float(h[0]) / 2.0**64
        if live and u < p_delete:
            pick = int(_splitmix64(np.array([seed * 77 + seq + 13], dtype=np.uint64))[0]) % len(
                live
            )
            victim = live.pop(pick)
            rows.append((seq, "delete", victim, None, None))
        else:
            x, y = coords_for_ids(np.array([next_id], dtype=np.uint64), "uniform", seed=seed)
            rows.append((seq, "insert", next_id, float(x[0]), float(y[0])))
            live.append(next_id)
            next_id += 1
    return rows


def generate_tiles(
    extent: tuple[float, float, float, float] = (-100.0, -100.0, 100.0, 100.0),
    tile_r: float = 23.7,
    step: float = 33.0,
) -> list[tuple[int, list[tuple[float, float]]]]:
    """Deterministic diamond tiles (L1 balls as 4-gon polygons) over the
    extent.  Diamonds make PIP independently checkable: containment is
    |x-cx| + |y-cy| <= r.  Returns [(tile_id, [(x,y) vertices ccw])]."""
    x0, y0, x1, y1 = extent
    tiles = []
    tid = 0
    cy = y0
    while cy <= y1:
        cx = x0
        while cx <= x1:
            verts = [
                (cx + tile_r, cy),
                (cx, cy + tile_r),
                (cx - tile_r, cy),
                (cx, cy - tile_r),
            ]
            tiles.append((tid, verts))
            tid += 1
            cx += step
        cy += step
    return tiles
