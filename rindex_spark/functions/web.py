"""URL / host analysis for web-corpus pipelines.

The reference has no notion of URLs (a pure spatial library); this is
the webtext half of the graft (BASELINE.json north_star: Common-Crawl
-style pages, "Zipfian web hosts" as the canonical skew source).  A
100 TB corpus build needs host-level operations for exactly the same
reason the spatial side needs hot-cell salting: host frequency is
Zipfian, and any per-host grouping or crawl-politeness cap must be one
map-side-combinable aggregate, never a driver-side loop.

Everything here is pure JVM column expressions (parse_url, regexp,
window) — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Host of a URL (JVM ``try_parse_url``), lowercased; null for
    unparseable input (plain ``parse_url`` RAISES under ANSI mode)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


# tracking query parameters stripped by canonical_url — the usual
# analytics/click-id noise that makes byte-equal pages differ by URL
_TRACKING_PARAM_RE = r"utm_[a-zA-Z0-9_]+|gclid|fbclid|mc_eid|igshid|ref_src"


def canonical_url(url: Column) -> Column:
    """Canonical URL for URL-level dedup (r5): the same page crawled
    via different tracking links must collapse to one key before
    per-URL grouping (CC reality: analytics parameters explode URL
    cardinality without changing content).

    Normalization, all pure JVM regexp (no Python, no parsing UDF):
    1. strip the fragment (``#...``),
    2. lowercase the scheme+authority (path/query stay case-sensitive
       per RFC 3986),
    3. remove tracking parameters (utm_*, gclid, fbclid, mc_eid,
       igshid, ref_src) wherever they appear,
    4. repair the separator (first surviving param regains its ``?``)
       and drop a dangling ``?``/``&``.

    URLs without a scheme pass through steps 1/3/4 with the authority
    left untouched (nothing matches the scheme regex, so nothing is
    lowercased — garbage in, unchanged garbage out)."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme_auth = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*)"
    head = F.regexp_extract(u, scheme_auth, 1)
    tail = F.regexp_replace(u, scheme_auth, "")
    u = F.concat(F.lower(head), tail)
    u = F.regexp_replace(u, r"[?&](?:" + _TRACKING_PARAM_RE + r")=[^&#]*", "")
    u = F.regexp_replace(u, r"^([^?&]*)&", "$1?")
    return F.regexp_replace(u, r"[?&]$", "")


def registered_domain(host: Column, suffixes=None) -> Column:
    """Registered domain of a host (``news.example.com -> example.com``).

    Without ``suffixes``: the last-two-labels approximation — exact for
    generic TLDs, documented-wrong for ccSLDs (``co.uk`` has three
    labels; correctness there needs the Mozilla public-suffix list,
    external data this engine does not ship).

    With ``suffixes`` (r3 verdict item 8 — PSL correctness becomes a
    DATA injection, not a code change): an iterable of public-suffix
    strings, or a single-column DataFrame of them (dimension-table
    sized, ~10k rows for the full PSL, so the driver collect is
    bounded).  Longest matching suffix wins; the registered domain is
    that suffix plus one label.  Hosts matching no suffix fall back to
    the two-label heuristic.  The match compiles to per-label-count
    ``isin`` sets — a pure column expression (Catalyst turns big
    literal lists into hash-set InSet lookups), so it runs inside
    whole-stage codegen at any corpus scale: no join, no shuffle, no
    Python.  PSL wildcard (``*.ck``) and exception (``!``) entries are
    not supported and are skipped; pre-expand them if needed.

    The host expression is normalized (lowercased, trailing dot
    stripped) before matching, mirroring the python-side suffix
    normalization — ``News.Example.CO.UK.`` resolves the same as
    ``news.example.co.uk`` (r4 advisor: without this, mixed-case /
    FQDN-dotted hosts silently missed every PSL suffix)."""
    host = F.regexp_replace(F.lower(host), r"\.$", "")
    fallback = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    if suffixes is None:
        return fallback
    if hasattr(suffixes, "collect"):  # DataFrame: one suffix per row
        suffixes = [r[0] for r in suffixes.collect()]
    by_n: dict[int, list[str]] = {}
    for s in suffixes:
        s = str(s).strip().lower().lstrip(".")
        if not s or s.startswith("//") or "*" in s or s.startswith("!"):
            continue
        by_n.setdefault(s.count(".") + 1, []).append(s)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    branches = []
    for k in sorted(by_n, reverse=True):  # longest suffix wins
        tail = F.array_join(F.slice(labels, -k, k), ".")
        reg = F.array_join(F.slice(labels, -(k + 1), k + 1), ".")
        branches.append(F.when((n > k) & tail.isin(by_n[k]), reg))
    return F.coalesce(*branches, fallback)


def host_stats(
    df: DataFrame,
    host_col: str = "host",
    text_col: str | None = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-host profile: one hash aggregate (map-side combinable; the
    shuffle carries one row per DISTINCT host — at web scale that is
    ~1e8 rows from 1e12 pages).

    returns (host, n_docs, n_langs?, sum_chars?, avg_chars?) — the
    lang/text aggregates appear when their columns are named."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if lang_col is not None:
        aggs.append(F.count_distinct(F.col(lang_col)).alias("n_langs"))
    if text_col is not None:
        aggs.append(F.sum(F.length(F.col(text_col))).alias("sum_chars"))
    out = df.groupBy(F.col(host_col).alias("host")).agg(*aggs)
    if text_col is not None:
        out = out.withColumn("avg_chars", F.col("sum_chars") / F.col("n_docs"))
    return out


def host_stats_approx(
    df: DataFrame,
    host_col: str = "host",
    lang_col: str = "lang",
    rsd: float = 0.02,
) -> DataFrame:
    """The sketch variant of ``host_stats`` for 10^12-row corpora:
    ``approx_count_distinct`` (HyperLogLog++) replaces the exact
    count-distinct, which at scale expands to a SECOND shuffle keyed
    on (host, lang) carrying one row per distinct pair — the sketch
    keeps the whole profile ONE map-side-combinable aggregate whose
    shuffle rows are fixed-size HLL registers per host.

    ``rsd`` is the target relative standard deviation (2% default).
    Exactness note: counts are approximate by construction, so this
    profile has no bit-exact SQL oracle; accuracy is asserted in
    pytest against the exact aggregate (test_web).

    returns (host, n_docs, approx_n_langs)."""
    return df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct(F.col(lang_col), rsd).alias("approx_n_langs"),
    )


def hot_hosts(df: DataFrame, host_col: str = "host", factor: float = 8.0) -> DataFrame:
    """Hosts with more than ``factor`` x the mean per-host document
    count — the Zipfian-head detector (textual analogue of the spatial
    layer's hot-cell map; broadcast the result to salt or cap).

    returns (host, n_docs)."""
    counts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    mean = counts.agg(F.avg("n_docs").alias("m"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .filter(F.col("n_docs") > F.col("m") * F.lit(factor))
        .select("host", "n_docs")
    )


def per_host_cap(
    df: DataFrame,
    max_per_host: int,
    host_col: str = "host",
    order_col: Column | str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_per_host`` documents per host — the standard
    corpus-balance / crawl-politeness cap (a Zipfian head otherwise
    dominates the training mix).

    ``order_col`` decides WHICH documents survive: default
    ``xxhash64(id_col)`` (a deterministic uniform shuffle, unbiased by
    crawl order); pass a column for policy ordering (e.g. quality
    score descending).  Ties broken by ``id_col``.

    One window per host partition — Zipfian-skew note: a single
    pathological host (1e9 docs) makes one fat partition; for such
    heads, pre-filter with ``hot_hosts`` and drop or pre-sample them
    before the window (the same two-phase shape as hot-cell salting).
    """
    order = (
        F.xxhash64(F.col(id_col))
        if order_col is None
        else (F.col(order_col) if isinstance(order_col, str) else order_col)
    )
    w = Window.partitionBy(host_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn")
    )
