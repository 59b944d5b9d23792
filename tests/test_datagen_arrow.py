"""r6 round-2 guard: the Arrow page builder must be byte-identical to
the per-row reference implementation, both batch-local and through the
distributed generator (mapInArrow timestamp semantics included)."""

from __future__ import annotations

import numpy as np

from rindex_spark.datagen import (
    _body_words_arrow,
    _body_words_batch,
    generate_pages,
    page_batch,
    page_batch_arrow,
)


def test_body_words_arrow_matches_reference():
    ids = np.concatenate([np.arange(0, 5000), np.array([10**9, 2**40, 2**62])])
    assert _body_words_arrow(ids).to_pylist() == _body_words_batch(ids)


def test_page_batch_arrow_matches_reference_both_dists():
    ids = np.concatenate([np.arange(0, 20000), np.array([123456789, 2**40])])
    for dist in ("clustered", "uniform"):
        ref = page_batch(ids, dist, 42)
        got = page_batch_arrow(ids, dist, 42).to_pandas()
        got["warc_ts"] = got["warc_ts"].astype("datetime64[us]")
        assert list(ref.columns) == list(got.columns)
        for c in ref.columns:
            assert (ref[c].values == got[c].values).all(), c


def test_generate_pages_matches_local_reference(spark):
    rows = sorted(
        generate_pages(spark, 3000, dist="clustered", seed=7, partitions=4).collect(),
        key=lambda r: r.page_id,
    )
    ref = page_batch(np.arange(0, 3000, dtype=np.int64), "clustered", 7)
    assert len(rows) == 3000
    for i in (0, 1, 1234, 2999):
        r = rows[i]
        assert r.url == ref["url"][i]
        assert r.html == ref["html"][i]
        assert r.text == ref["text"][i]
        assert r.lang == ref["lang"][i]
        assert r.warc_ts == ref["warc_ts"][i].to_pydatetime()
