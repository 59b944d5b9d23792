"""Text analysis over web-page payloads — all vectorized pandas/Arrow
UDFs (no per-row Python), per BASELINE.json input_hint.

``extract_text`` is the engine-side inverse of the page generator
(rindex_spark.datagen): the extracted text must be BYTE-IDENTICAL to
the stored ``text`` column per url (input_hint invariant; asserted in
tests/test_text.py).

The reference repo has no string functions at all (SURVEY.md §2.3) —
this layer is the webtext graft: language-ID (stopword heuristic),
quality scoring, token counting, rolling-hash fingerprinting.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_H1_RE = re.compile(r"<h1>(.*?)</h1>", re.S)
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_GEO_RE = re.compile(r'<meta name="geo\.position" content="([^";]+);([^"]+)"')


def extract_text_series(html: pd.Series) -> pd.Series:
    """bytes html -> canonical text: title, h1, then paragraphs, joined
    with newlines.  Deterministic; no entity decoding (the generator
    never emits entities)."""

    def _one(b) -> str:
        s = b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else str(b)
        parts: list[str] = []
        m = _TITLE_RE.search(s)
        if m:
            parts.append(m.group(1))
        m = _H1_RE.search(s)
        if m:
            parts.append(m.group(1))
        parts.extend(_P_RE.findall(s))
        return "\n".join(parts)

    return html.map(_one)


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


@pandas_udf(StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())]))
def extract_geotag(html: pd.Series) -> pd.DataFrame:
    """Parse `<meta name="geo.position" content="lat;lon">`."""
    lats, lons = [], []
    for b in html:
        s = b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else str(b)
        m = _GEO_RE.search(s)
        if m:
            lats.append(float(m.group(1)))
            lons.append(float(m.group(2)))
        else:
            lats.append(None)
            lons.append(None)
    return pd.DataFrame({"lat": lats, "lon": lons})


# ---------------------------------------------------------------------------
# language ID: tiny stopword-profile heuristic — pure column expressions
# (JVM-side, whole-stage codegen; no Python at all)

# insertion order is the tie-break priority: first language with the
# max stopword-hit count wins; all-zero -> "und"
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "ein", "nicht", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"],
    "es": ["el", "la", "que", "de", "los", "en", "una", "por", "con", "para"],
}

_LANG_TOKEN_SPLIT = r"[^a-zà-ÿ]+"


def lang_id(text) -> "F.Column":
    """Column expression: detected language of ``text`` ('en'/'de'/'fr'/
    'es'/'und').  Distinct lowercase tokens intersected with each
    language's stopword profile; argmax with insertion-order tie-break.
    Entirely built-in functions — no UDF, no shuffle."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(F.split(F.lower(F.coalesce(t, F.lit(""))), _LANG_TOKEN_SPLIT))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in _LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_STOPWORDS:
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def lang_id_series(text: pd.Series) -> pd.Series:
    """Pandas twin of ``lang_id`` (test oracle / offline use)."""

    def _one(t: str) -> str:
        toks = set(re.findall(r"[a-zà-ÿ]+", (t or "").lower()))
        best, best_n = "und", 0
        for lang, sw in _LANG_STOPWORDS.items():
            n = len(toks & set(sw))
            if n > best_n:
                best, best_n = lang, n
        return best

    return text.map(_one)


# ---------------------------------------------------------------------------
# quality / token stats — pure column expressions (JVM-side, no UDF)

# BPE-ish pre-tokenization: letter runs, single digits, single
# non-alphanumeric marks — the GPT-2-style split shape (letters chunk,
# digits split, punctuation isolates), minus byte-level merges
_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def with_text_stats(df, text_col: str = "text"):
    """Adds n_chars_calc, n_tokens, n_tokens_bpe, alpha_ratio,
    digit_ratio, punct_ratio, avg_token_len, quality_score — all
    built-in functions, whole-stage codegen.

    r6 round 3: the input is spread to session parallelism FIRST
    (metadata-only guard; a no-op on at-scale inputs) — the stats
    expressions are the expensive part of this lineage, and a few-MB
    cached corpus otherwise computes them on its 1-2 cache partitions
    no matter what a DOWNSTREAM spread does (the regex work sits below
    that exchange; measured 2.2s on 2 of 32 cores feeding
    sample_to_token_budget at 50k docs)."""
    from rindex_spark.plans.scan import spread_scan

    df = spread_scan(df)
    t = F.col(text_col)
    n_chars = F.length(t)
    # character-CLASS counts via translate, not regexp_replace (r6,
    # guide §4.1): translate is one codegen char-map pass; the regex
    # engine alternative measured 2-4x slower on the doc corpus.  The
    # classes are literal ASCII sets, so length(t) - length(translate)
    # is EXACTLY the old count-of-class-members (0 mismatches on a 200k
    # -row unicode-adversarial sweep; same int feeding the same
    # division -> bit-identical ratios).
    _ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    n_alpha = n_chars - F.length(F.translate(t, _ALPHA, ""))
    n_digit = n_chars - F.length(F.translate(t, "0123456789", ""))
    n_punct = n_chars - F.length(F.translate(t, ".,;:!?", ""))
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.5) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - digit_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    )
    n_tokens_bpe = F.size(F.regexp_extract_all(t, F.lit(_BPE_TOKEN_RE), 0))
    all_stop = sorted({w for sw in _LANG_STOPWORDS.values() for w in sw})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    n_stop = F.size(
        F.filter(
            F.split(F.trim(t), r"\s+"),
            lambda w: F.array_contains(stop_arr, F.lower(w)),
        )
    )
    stopword_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("stopword_ratio", stopword_ratio.cast("double"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_tokens_bpe", n_tokens_bpe.cast("long"))
        .withColumn("alpha_ratio", alpha_ratio.cast("double"))
        .withColumn("digit_ratio", digit_ratio.cast("double"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("avg_token_len", avg_tok.cast("double"))
        .withColumn("quality_score", quality.cast("double"))
    )


# ---------------------------------------------------------------------------
# document fingerprint: polynomial rolling hash over the text's Unicode
# CODE POINTS — deterministic 63-bit, fully vectorized (no per-char or
# per-row Python loops): h = sum_j cp_j * BASE^(n-1-j) mod 2^63.
# All arithmetic runs in wrapping uint64 (mod 2^64); the final 63-bit
# mask is exact because 2^63 divides 2^64.

_FP_BASE = np.uint64(1000003)
_FP_MASK = np.uint64((1 << 63) - 1)


def fingerprint_series(text: pd.Series) -> pd.Series:
    texts = ["" if t is None else str(t) for t in text]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nz = np.nonzero(lens)[0]
    if len(nz):
        # one blob for the whole Arrow batch: utf-32-le gives the code
        # points directly as a uint32 vector
        cps = np.frombuffer("".join(texts).encode("utf-32-le"), dtype="<u4").astype(
            np.uint64
        )
        nzlens = lens[nz]
        maxlen = int(nzlens.max())
        pows = np.ones(maxlen, dtype=np.uint64)
        if maxlen > 1:
            pows[1:] = np.multiply.accumulate(
                np.full(maxlen - 1, _FP_BASE, dtype=np.uint64)
            )
        starts = np.zeros(len(nz), dtype=np.int64)
        starts[1:] = np.cumsum(nzlens)[:-1]
        pos = np.arange(len(cps), dtype=np.int64) - np.repeat(starts, nzlens)
        exp = np.repeat(nzlens, nzlens) - 1 - pos
        out[nz] = np.add.reduceat(cps * pows[exp], starts) & _FP_MASK
    return pd.Series(out.astype(np.int64))


@pandas_udf(LongType())
def fingerprint(text: pd.Series) -> pd.Series:
    return fingerprint_series(text)
