"""URL provenance ops (operators/urls.py). The full paths are
hash-checked against DuckDB oracles (url_canonical / url_dedup /
domain_blocklist); here each canonicalization rule and the
label-boundary blocklist semantics get crafted-input pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.operators.urls import (
    canonical_urls,
    domain_blocklist,
    url_dedup,
)


def _canon(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return canonical_urls(df).collect()[0].canonical_url


def test_canonicalization_rules(spark):
    # scheme + host case, www., default port, fragment, trailing slash
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/a/b/#frag")
        == "https://example.com/a/b"
    )
    # http default port stripped; https-style :80 on http only
    assert _canon(spark, "http://x.org:80/p") == "http://x.org/p"
    # non-default ports survive
    assert _canon(spark, "https://x.org:8080/p") == "https://x.org:8080/p"
    assert _canon(spark, "http://x.org:443/p") == "http://x.org:443/p"
    # tracking params dropped, survivor ORDER preserved
    assert (
        _canon(spark, "https://x.org/p?utm_source=a&id=1&fbclid=z&b=2")
        == "https://x.org/p?id=1&b=2"
    )
    # all params tracked → no '?' at all
    assert _canon(spark, "https://x.org/p?utm_a=1&gclid=2") == "https://x.org/p"
    # path case preserved (only scheme/host fold)
    assert _canon(spark, "https://X.org/CaseSensitive") == "https://x.org/CaseSensitive"
    # root slash collapses
    assert _canon(spark, "https://x.org/") == "https://x.org"


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.x.org/p?utm_s=1"),
            (2, "HTTPS://x.org/p/"),
            (3, "https://x.org/q"),
        ],
        "doc_id long, url string",
    )
    out = {r.canonical_url: (r.keep_id, r.n_urls) for r in url_dedup(df).collect()}
    assert out == {"https://x.org/p": (1, 2), "https://x.org/q": (3, 1)}


def test_blocklist_label_boundary_and_longest_match(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x"),      # blocked via example.com
            (2, "https://notexample.com/x"),     # NOT blocked (label boundary)
            (3, "https://news.b.org/x"),         # blocked, longest wins
            (4, "https://clean.org/x"),
        ],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.keep, r.blocked_domain)
        for r in domain_blocklist(
            df, ["example.com", "b.org", "news.b.org"]
        ).collect()
    }
    assert out[1] == (False, "example.com")
    assert out[2] == (True, None)
    assert out[3] == (False, "news.b.org")  # not the shorter b.org
    assert out[4] == (True, None)


def test_fragment_question_mark_is_not_a_query(spark):
    # a '?' inside the fragment must not resurrect as a query
    assert _canon(spark, "https://a.com/p#section?x=1") == "https://a.com/p"
    # while a real query containing '?' keeps everything after the first
    assert (
        _canon(spark, "https://a.com/p?a=1?b=2#f") == "https://a.com/p?a=1?b=2"
    )


def test_malformed_urls_do_not_collapse(spark):
    df = spark.createDataFrame(
        [(1, "example.com/a"), (2, "other.org/b"), (3, "mailto:x@y.com"),
         (4, "https://ok.org/x")],
        "doc_id long, url string",
    )
    from graphiti_spark.operators.urls import canonical_urls, url_dedup

    rows = {r.doc_id: r.canonical_url for r in canonical_urls(df).collect()}
    assert rows[1] is None and rows[2] is None and rows[3] is None
    assert rows[4] == "https://ok.org/x"
    # dedup only groups valid canonical URLs — no mass-merge of junk
    out = url_dedup(df).collect()
    assert len(out) == 1 and out[0].canonical_url == "https://ok.org/x"


def test_blocklist_matches_hosts_with_ports(spark):
    df = spark.createDataFrame(
        [(1, "http://ads.example.com:8080/x"), (2, "https://ok.org:8443/y")],
        "doc_id long, url string",
    )
    out = {
        r.doc_id: (r.keep, r.blocked_domain)
        for r in domain_blocklist(df, ["example.com"]).collect()
    }
    assert out[1] == (False, "example.com")  # port can't dodge the list
    assert out[2] == (True, None)


def test_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the canonical form is a
    fixed point, so re-canonicalizing stored canonical URLs (a common
    accident in multi-stage pipelines) never changes keys. One seeded
    constructed batch spanning every rule instead of per-example
    hypothesis (Spark round-trips are too slow per example)."""
    import itertools

    rows = []
    i = 0
    for scheme, sub, port, path, q, frag in itertools.product(
        ["https", "HTTP"], ["", "www.", "api."], ["", ":443", ":8080"],
        ["/p", "/p/", ""], ["", "?utm_a=1", "?id=2&fbclid=x", "?id=2"],
        ["", "#f", "#f?fake=1"],
    ):
        rows.append((i, f"{scheme}://{sub}Host{i % 7}.example.com{port}{path}{q}{frag}"))
        i += 1
    df = spark.createDataFrame(rows, "doc_id long, url string")
    from graphiti_spark.operators.urls import canonical_urls

    once = canonical_urls(df).select(
        "doc_id", F.col("canonical_url").alias("url")
    )
    twice = canonical_urls(once).select("doc_id", "canonical_url")
    a = {r.doc_id: r.url for r in once.collect()}
    b = {r.doc_id: r.canonical_url for r in twice.collect()}
    assert a == b
