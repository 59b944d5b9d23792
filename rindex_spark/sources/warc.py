"""WARC ingestion — the Common-Crawl wire format.

The north-star corpus arrives as WARC files (typically ~1 GB gzip
members, one crawl segment per file).  The Spark-first ingestion
grain is the FILE: ``spark.read.format("binaryFile")`` lists and
distributes whole files (no splitting — gzip members aren't
splittable anyway, which is why Common Crawl sizes them ~1 GB), and a
``mapInPandas`` pass parses each file's records.  At 100 TB that is
~100k files = ~100k tasks, an ideal task grain; parallelism comes
from file count, exactly how CC is processed in practice
(maxPartitionBytes plays no role for unsplittable gzip).

Parsing is per-record python inside the file task — unavoidable for a
byte-framed format (Content-Length framing, not line framing) and
IO/decompression-bound in practice; everything DOWNSTREAM of the
(url, warc_ts, html) rows is column expressions.

Only ``WARC-Type: response`` records yield rows (request/metadata/
warcinfo records are skipped, matching how CC consumers read WET/WARC
files).  The HTTP envelope, when present, is stripped so ``html`` is
the raw payload body — and the bytes are passed through VERBATIM (the
byte-identical invariant: extract_text(html) downstream must see
exactly what was crawled).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts string, html binary, warc_file string"


def _parse_warc_stream(buf):
    """Yield (url, warc_ts, payload_body) for each response record read
    from a binary file-like ``buf`` (supports readline/read).

    Framing per the WARC/1.0 spec: header block terminated by CRLF
    CRLF, payload of exactly Content-Length bytes, then CRLF CRLF
    before the next record.  Streaming by construction: resident
    memory is one record's headers + payload, never the whole file.
    """
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # tolerate garbage between records: scan to next version line
            continue
        headers = {}
        while True:
            h = buf.readline()
            if not h or h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        payload = buf.read(length)
        if headers.get(b"warc-type", b"").lower() == b"response":
            url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
            ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
            body = payload
            if body.startswith(b"HTTP/"):
                # strip the HTTP response envelope; body follows the
                # first CRLFCRLF
                sep = body.find(b"\r\n\r\n")
                if sep != -1:
                    body = body[sep + 4 :]
            yield url, ts, body


# output-chunk flush thresholds for _parse_files: bound the pandas
# frame under construction so a 1 GB WARC file (millions of records /
# GBs of payload) never materializes as ONE in-worker frame
_FLUSH_RECORDS = 2000
_FLUSH_BYTES = 64 << 20


def _parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body shared by the batch and streaming readers: each
    input row is one whole (path, content) file; output rows are parsed
    response records, yielded in bounded chunks.

    Gzip members are STREAM-decompressed (``gzip.GzipFile`` over the
    file bytes — r4 verdict item 5: ``gzip.decompress`` held the whole
    ~several-GB raw expansion per task on top of Spark's binaryFile
    copy; now resident memory is O(record) + the zlib window).
    GzipFile reads CONCATENATED members transparently, which real CC
    files rely on (one gzip member per record)."""
    for pdf in batches:
        out = {"url": [], "warc_ts": [], "html": [], "warc_file": []}
        out_bytes = 0

        def flush():
            nonlocal out, out_bytes
            df = pd.DataFrame(out)
            out = {"url": [], "warc_ts": [], "html": [], "warc_file": []}
            out_bytes = 0
            return df

        for fpath, content in zip(pdf["path"], pdf["content"]):
            raw = io.BytesIO(bytes(content))
            buf = gzip.GzipFile(fileobj=raw) if fpath.endswith(".gz") else raw
            for url, ts, body in _parse_warc_stream(buf):
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["html"].append(body)
                out["warc_file"].append(fpath)
                out_bytes += len(body)
                if len(out["url"]) >= _FLUSH_RECORDS or out_bytes >= _FLUSH_BYTES:
                    yield flush()
        if out["url"]:
            yield flush()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """path (glob of .warc / .warc.gz files) -> DataFrame
    (url, warc_ts, html binary, warc_file).

    html is the raw response payload (HTTP envelope stripped),
    byte-identical to the crawl.  warc_ts is the WARC-Date string —
    cast with ``to_timestamp`` downstream when needed.
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(_parse_files, schema=WARC_SCHEMA)


def write_warc(path: str, records: list[tuple[str, str, bytes]], compress: bool = True) -> None:
    """Test/fixture helper: write (url, iso_ts, body) triples as a
    WARC/1.0 file (driver-side, fixture-sized).  Bodies are wrapped in
    a minimal HTTP/1.1 envelope like real crawl captures."""
    chunks = []
    for url, ts, body in records:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        header = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        chunks.append(header + payload + b"\r\n\r\n")
    # a non-response record consumers must skip
    info = b"warcinfo body"
    chunks.insert(
        0,
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        + f"Content-Length: {len(info)}\r\n".encode()
        + b"\r\n"
        + info
        + b"\r\n\r\n",
    )
    raw = b"".join(chunks)
    if compress:
        raw = gzip.compress(raw)
    with open(path, "wb") as f:
        f.write(raw)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_warc``: new WARC files landing under
    ``path`` become micro-batches of parsed (url, warc_ts, html,
    warc_file) rows — the continuous-crawl ingestion shape (each crawl
    segment commits exactly once; downstream foreachBatch folds or
    stream_dedup dedups).  Same per-file parse; the binaryFile
    streaming source requires the schema up front."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    file_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(file_schema)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_files, schema=WARC_SCHEMA)
