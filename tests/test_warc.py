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
