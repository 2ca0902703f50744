"""URL canonicalization — Catalyst-native, for dedup-by-url at crawl scale.

Re-crawls and mirrors present the same document under trivially-different
URLs (host case, default ports, tracking params, fragments, param order).
Canonicalizing BEFORE the url-keyed operators (resume anti-join, exact
dedup keeper maps, host-salted rebalance) collapses those families without
touching the payload.

Everything is built from regex/array expressions with exact DuckDB
equivalents — deliberately NOT ``parse_url`` (no DuckDB counterpart), so
the whole family is oracle-checkable. The rules (conservative, lossless
for real-world http(s) URLs):

- scheme and host lowercase;
- default ports dropped (``:80`` for http, ``:443`` for https);
- empty path → ``/``;
- fragment dropped;
- tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
  ``mc_eid`` — unambiguous click-id params only; a generic name like
  ``ref`` is content-bearing on many sites and is kept);
- remaining query params sorted (byte order) so param order never splits
  a dedup group.

Not done (documented simplifications): percent-encoding normalization and
dot-segment resolution (rare in crawl frontiers, and ``../`` resolution
is not expressible without a loop); registrable-domain extraction is
last-two-labels (no public-suffix list ships in this sandbox — plug one
in as a broadcast join against a suffix table at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
# query = after the FIRST '?' that precedes any '#': a '?' inside the
# fragment (SPA routes like '#/search?q=x') is fragment text, not query
QUERY_RE = r"^[^#?]*\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=|$)"


def url_scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, SCHEME_RE, 1))


def url_host(col: Column) -> Column:
    """Lowercased host without port/userinfo."""
    auth = F.regexp_extract(col, AUTHORITY_RE, 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d*$", ""))


def url_port(col: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    auth = F.regexp_extract(col, AUTHORITY_RE, 1)
    return F.regexp_extract(auth, r":(\d+)$", 1)


def registrable_domain(col: Column) -> Column:
    """Last two dot-labels of the host (PSL-less approximation)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)


def _canonical_query(col: Column) -> Column:
    q = F.regexp_extract(col, QUERY_RE, 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    return F.array_join(F.sort_array(parts), "&")


def canonicalize_url(col: Column) -> Column:
    """Canonical form per the module rules; non-URL strings (no
    ``scheme://``) pass through unchanged."""
    scheme = url_scheme(col)
    host = url_host(col)
    port = url_port(col)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(col, PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _canonical_query(col)
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(col)
