"""URL canonicalization and URL-level dedup — the first dedup pass of a
web-crawl curation pipeline (CCNet / RefinedWeb run it before any content
hashing: it is free compared to text fingerprints and removes the bulk of
refetches).

Everything is native ``regexp_extract``/``regexp_replace`` column
expressions in the common Java-regex/RE2 dialect (no lookarounds, no
backreferences), so the plan stays inside whole-stage codegen and a SQL
engine on RE2 (the DuckDB oracle) replays it byte-for-byte.

Normalization rules (the conservative, semantics-preserving subset):

* strip the fragment (``#...``);
* lowercase the scheme and host; drop userinfo and a leading ``www.``;
* drop the default port (``:80`` for http, ``:443`` for https);
* drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``) from the query string and tidy separators;
* strip trailing slashes from the path.

Non-URL strings (no ``scheme://``) pass through trimmed but otherwise
untouched — the operator never destroys keys it does not understand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)(.*)$"
# Anchored at start-of-query or '&' so a key only matches as a whole
# parameter name ('href=x'/'refresh=1' must NOT lose their 'ref' infix),
# and WITHOUT consuming the trailing '&' (consuming it would swallow the
# boundary the next tracking param needs — 'a&utm_1=x&utm_2=y' would keep
# utm_2).  Removing '&key=value' leaves the next real param's own '&'
# intact, so no double-separator cleanup is needed.
_TRACK_PAT = r"(^|&)(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&#]*"


def normalize_url_expr(url: Column) -> Column:
    """The canonical-URL column expression (shared by the batch operator
    and any DSL pipeline that wants it inline)."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_PAT, 1))
    auth = F.regexp_extract(u, _URL_PAT, 2)
    rest = F.regexp_extract(u, _URL_PAT, 3)
    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
             .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
             .otherwise(host))
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1),
                            r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    query = F.regexp_replace(query, _TRACK_PAT, "")
    query = F.regexp_replace(query, r"[?&]+$", "")
    query = F.regexp_replace(query, r"^&+", "")
    tail = F.when(query == "", path).otherwise(F.concat(path, F.lit("?"), query))
    return (F.when(scheme == "", F.trim(url))
             .otherwise(F.concat(scheme, F.lit("://"), host, tail)))


def url_domain_expr(url: Column) -> Column:
    """Registered-domain heuristic: the last two labels of the normalized
    host (``a.b.example.com -> example.com``).  Good enough for quota /
    mixture keys on generic TLDs; swap in a public-suffix join table for
    ccTLD precision.

    A non-default port (``example.com:8080`` — the :80/:443 defaults are
    already gone after normalization) is stripped before extraction, and
    a host the two-label pattern cannot match (``localhost``, a bare IP
    octet tail is still matched) falls back to the whole port-stripped
    host — a quota/mixture key must never silently collapse such URLs
    into one empty-string group."""
    norm = normalize_url_expr(url)
    host = F.regexp_extract(norm, _URL_PAT, 2)
    bare = F.regexp_replace(host, r":[0-9]+$", "")
    two = F.regexp_extract(bare, r"([a-z0-9-]+\.[a-z0-9-]+)$", 1)
    return F.when(two == "", bare).otherwise(two)


def normalize_urls(df: DataFrame, url_col: str = "url",
                   out_col: str = "norm_url",
                   domain_col: str | None = "domain") -> DataFrame:
    """Append canonical-URL (and optionally registered-domain) columns.

    Map-only — zero shuffles at any corpus size; at 100 TB this runs as a
    pure projection inside the scan stage."""
    out = df.withColumn(out_col, normalize_url_expr(F.col(url_col)))
    if domain_col:
        out = out.withColumn(domain_col, url_domain_expr(F.col(url_col)))
    return out


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL dedup: ``(norm_url, keep_id, n_docs)`` — one row per
    distinct canonical URL, keeping the smallest id (first fetch under a
    monotone id scheme).

    One hash-partition shuffle on the canonical URL (a high-cardinality,
    near-uniform key), with map-side partial aggregation; the min/count
    pair shrinks every group to one row before the exchange."""
    norm = normalize_url_expr(F.col(url_col)).alias("norm_url")
    return (df.select(norm, F.col(id_col))
              .groupBy("norm_url")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_docs")))
