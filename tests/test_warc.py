"""WARC ingestion: byte-identical payloads, response-only filtering,
gzip + plain files, multi-file parallel reads."""

from __future__ import annotations

from rindex_spark.sources.warc import read_warc, write_warc


def test_warc_roundtrip_byte_identical(spark, tmp_path):
    recs0 = [
        ("https://example.com/a", "2024-01-01T00:00:00Z", b"<html>alpha \xe2\x82\xac</html>"),
        ("https://example.com/b", "2024-01-01T00:00:01Z", b"<html>beta\r\n\r\nwith crlf</html>"),
    ]
    recs1 = [
        ("https://example.org/c", "2024-01-02T00:00:00Z", b"\x00\x01binary body\xff"),
    ]
    write_warc(str(tmp_path / "seg0.warc.gz"), recs0, compress=True)
    write_warc(str(tmp_path / "seg1.warc"), recs1, compress=False)

    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in read_warc(spark, str(tmp_path / "*.warc*")).collect()
    }
    exp = {u: (ts, body) for u, ts, body in recs0 + recs1}
    assert got == exp  # bodies byte-identical, warcinfo records skipped


def test_warc_feeds_text_pipeline(spark, tmp_path):
    """The parsed html column must plug straight into the corpus
    pipeline: decode -> text stats runs as column expressions."""
    from pyspark.sql import functions as F

    from rindex_spark.functions.text import with_text_stats

    write_warc(
        str(tmp_path / "w.warc.gz"),
        [
            ("https://example.com/x", "2024-01-01T00:00:00Z",
             "some meaningful page text with several words".encode()),
        ],
    )
    docs = (
        read_warc(spark, str(tmp_path / "w.warc.gz"))
        .select(
            "url",
            F.to_timestamp("warc_ts").alias("ts"),
            F.decode("html", "UTF-8").alias("text"),
        )
    )
    row = with_text_stats(docs).collect()[0]
    assert row["n_tokens"] == 7
    assert row["ts"] is not None


def test_warc_to_corpus_end_to_end(spark, tmp_path):
    """The full ingestion chain: WARC bytes -> parsed pages -> text
    stats + language gates -> exact dedup -> per-host cap.  Every stage
    is the production operator; ids derive deterministically from the
    url so the pipeline is replay-stable."""
    from pyspark.sql import functions as F

    from rindex_spark.functions.text import lang_id, with_text_stats
    from rindex_spark.functions.web import per_host_cap, url_host
    from rindex_spark.operators.dedup import dedup_exact

    body = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet green field all day long")
    recs = []
    for i in range(12):
        host = "a.example.com" if i < 8 else "b.example.org"
        # two exact duplicates of page 0 on host a
        text = body if i in (0, 3, 5) else f"{body} variant {i}"
        recs.append(
            (f"https://{host}/p{i}", "2024-01-01T00:00:00Z", text.encode())
        )
    write_warc(str(tmp_path / "crawl.warc.gz"), recs)

    pages = read_warc(spark, str(tmp_path / "crawl.warc.gz")).select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        url_host(F.col("url")).alias("host"),
        F.decode("html", "UTF-8").alias("text"),
    )
    stats = with_text_stats(pages).withColumn("lang_pred", lang_id(F.col("text")))
    gated = stats.filter(
        (F.col("lang_pred") == "en") & (F.col("n_tokens") >= 10)
    )
    keep = dedup_exact(gated)  # (text_hash, n_docs, keep_id)
    deduped = gated.join(
        keep.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    capped = per_host_cap(deduped, max_per_host=5, host_col="host")

    rows = capped.select("doc_id", "host").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    # 12 pages - 2 exact dups = 10 distinct; host a has 8-2=6 -> capped
    # to 5; host b keeps its 4
    assert len(by_host["a.example.com"]) == 5
    assert len(by_host["b.example.org"]) == 4
    # replay determinism: the same WARC yields the same survivor set
    rows2 = capped.select("doc_id").collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in rows2
    )


def test_warc_streaming_ingestion(spark, tmp_path):
    """Streaming WARC: files become micro-batches (maxFilesPerTrigger=1),
    every record lands exactly once with byte-identical payloads."""
    import os

    from rindex_spark.sources.warc import read_warc_stream

    d = tmp_path / "crawl"
    d.mkdir()
    segs = [
        [("https://example.com/0", "2024-01-01T00:00:00Z", b"seg0 body")],
        [("https://example.com/1", "2024-01-01T00:01:00Z", b"seg1 \x00bin"),
         ("https://example.com/2", "2024-01-01T00:02:00Z", b"seg1 second")],
    ]
    base = 1_700_000_000
    for i, recs in enumerate(segs):
        p = str(d / f"seg{i}.warc.gz")
        write_warc(p, recs)
        os.utime(p, (base + i * 10, base + i * 10))

    q = (
        read_warc_stream(spark, str(d) + "/*.warc.gz")
        .writeStream.format("memory")
        .queryName("warc_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["url"]: bytes(r["html"])
        for r in spark.sql("select url, html from warc_stream_out").collect()
    }
    exp = {u: b for seg in segs for u, _, b in seg}
    assert got == exp


def test_warc_concatenated_gzip_members(spark, tmp_path):
    """Real Common-Crawl WARCs are CONCATENATED per-record gzip members
    in one .gz file; the streaming GzipFile parse must read through
    member boundaries transparently (r4 verdict item 5)."""
    import gzip as _gz

    recs_a = [("https://example.com/m0", "2024-01-01T00:00:00Z", b"member zero")]
    recs_b = [
        ("https://example.com/m1", "2024-01-01T00:01:00Z", b"member one \xff\x00"),
        ("https://example.com/m2", "2024-01-01T00:02:00Z", b"member two"),
    ]
    write_warc(str(tmp_path / "a.warc.gz"), recs_a, compress=True)
    write_warc(str(tmp_path / "b.warc.gz"), recs_b, compress=True)
    cat = (tmp_path / "a.warc.gz").read_bytes() + (tmp_path / "b.warc.gz").read_bytes()
    (tmp_path / "cat.warc.gz").write_bytes(cat)
    # sanity: the fixture really is multi-member
    assert _gz.decompress(cat)  # gzip.decompress also handles concat

    got = {
        r["url"]: bytes(r["html"])
        for r in read_warc(spark, str(tmp_path / "cat.warc.gz")).collect()
    }
    assert got == {u: b for u, _, b in recs_a + recs_b}


def test_warc_chunked_output_over_flush_threshold(spark, tmp_path):
    """More records than the per-frame flush threshold: the parse must
    yield multiple bounded chunks, with no record lost or duplicated
    (resident-memory contract: O(chunk), not O(file))."""
    from rindex_spark.sources import warc as warc_mod

    n = warc_mod._FLUSH_RECORDS + 137
    recs = [
        (f"https://example.com/p{i}", "2024-01-01T00:00:00Z",
         f"body {i}".encode())
        for i in range(n)
    ]
    write_warc(str(tmp_path / "big.warc.gz"), recs, compress=True)
    df = read_warc(spark, str(tmp_path / "big.warc.gz"))
    assert df.count() == n
    got = {r["url"]: bytes(r["html"]) for r in df.collect()}
    assert got == {u: b for u, _, b in recs}
