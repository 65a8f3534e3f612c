"""URL provenance ops — canonicalization, URL-level dedup, and domain
blocklisting for web-crawl corpora.

Before any content-level dedup runs, a crawl pipeline collapses the
cheapest duplicate class: the SAME resource fetched under trivially
different URLs (scheme/host case, ``www.`` prefix, default ports,
tracking parameters, fragments, trailing slashes). URL
canonicalization + keep-first is pure column algebra — zero Python,
one groupBy — and typically removes a double-digit percentage of a
crawl before a single shingle is computed. Domain blocklisting is the
other table-stakes provenance filter (licensing / opt-out / quality
domain lists), implemented as a suffix-set semi-join so ``example.com``
blocks every subdomain without a per-row regex over the list.

Engine/oracle parity: every step is a shared regex or list operation
both engines execute identically (the `pii_scrub` discipline — the
DuckDB oracle runs the byte-identical expressions), so all three ops
are full value oracles (`url_canonical`, `url_dedup`,
`domain_blocklist`).

Scale shapes: canonicalization is map-only (runs inside the scan);
dedup is one groupBy on the canonical string (hot mirrors are a
groupBy skew, absorbed map-side by partial aggregation); blocklisting
explodes each host into its ≤ label-count suffixes and semi-joins the
blocklist (broadcast — blocklists are thousands of rows, never
corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "canonical_urls",
    "url_dedup",
    "domain_blocklist",
]

# exact (lowercased) tracking-parameter names dropped during
# canonicalization, plus any parameter whose name starts with "utm_"
TRACKING_PARAMS = [
    "gclid", "fbclid", "msclkid", "ref", "ref_src", "mc_cid", "mc_eid",
]

# shared regexes (Java and RE2 agree on these constructs)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query = after the FIRST '?' that precedes any '#' — a '?' inside the
# fragment must NOT resurrect as a query (RFC 3986 §3.4/§3.5)
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _keep_param(kv: Column) -> Column:
    key = F.lower(F.split_part(kv, F.lit("="), F.lit(1)))
    return (
        (kv != "")
        & ~key.startswith("utm_")
        & ~key.isin(TRACKING_PARAMS)
    )


def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds (host, canonical_url) to ``df``:

    - scheme and host lowercased (path/query stay case-sensitive per
      RFC 3986);
    - leading ``www.`` stripped from the host;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - tracking parameters removed from the query (``utm_*`` prefix +
      the TRACKING_PARAMS set), surviving parameters keep their order;
    - fragment dropped;
    - trailing ``/`` stripped from the path.

    Map-only: every step is a regexp/list column expression."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = F.when(
        ((scheme == "http") & host1.endswith(":80"))
        | ((scheme == "https") & host1.endswith(":443")),
        F.regexp_replace(host1, r":\d+$", ""),
    ).otherwise(host1)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.filter(F.split(query, "&"), _keep_param)
    q = F.array_join(kept, "&")
    # a row with no recognizable scheme://host is NOT a canonical-izable
    # absolute URL — surface NULL instead of collapsing every malformed
    # row onto the same '://' key (url_dedup would then mass-merge
    # unrelated documents)
    canonical = F.when(
        (scheme != "") & (host != ""),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )
    return df.withColumn("host", host).withColumn("canonical_url", canonical)


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """(canonical_url, keep_id, n_urls) — keep-first URL-level dedup:
    one row per canonical URL with the smallest id as the keeper and
    the collapse count. One partial-aggregated groupBy on the
    canonical string."""
    c = canonical_urls(df, url_col)
    # rows whose URL has no scheme://host canonicalize to NULL and are
    # excluded — malformed/relative URLs are the caller's cleanup, not
    # a dedup group
    return (
        c.where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_urls"),
        )
    )


def _host_suffixes(host: Column) -> Column:
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def domain_blocklist(
    df: DataFrame,
    blocked: list[str],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, host, blocked_domain, keep) — suffix-set domain filter: a
    row is blocked iff any dot-suffix of its (canonicalized) host is
    in ``blocked``, so blocking ``example.com`` covers every
    subdomain while ``notexample.com`` stays clean (label-boundary
    matching — string ``endswith`` would false-positive there).

    The host explodes into its ≤ #labels suffixes and semi-joins the
    broadcast blocklist; ties report the LONGEST (most specific)
    matching suffix.
    """
    spark = df.sparkSession
    bl = F.broadcast(
        spark.createDataFrame(
            [(b,) for b in sorted({b.lower() for b in blocked})],
            "blocked_domain string",
        )
    )
    c = canonical_urls(df, url_col).select(id_col, "host")
    # suffix-match on the host WITHOUT its port — a blocklisted domain
    # must not escape by serving on :8080 (the blocklist names domains,
    # never ports)
    bare = F.regexp_replace(F.col("host"), r":\d+$", "")
    sfx = c.select(
        id_col, "host", F.explode(_host_suffixes(bare)).alias("sfx")
    )
    best = (
        sfx.join(bl, sfx.sfx == bl.blocked_domain, "inner")
        .groupBy(id_col, "host")
        .agg(
            F.max_by("blocked_domain", F.length("blocked_domain")).alias(
                "blocked_domain"
            )
        )
    )
    return (
        c.join(best, [id_col, "host"], "left")
        .select(
            id_col,
            "host",
            "blocked_domain",
            F.col("blocked_domain").isNull().alias("keep"),
        )
    )
