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
  a dedup group;
- userinfo dropped (``user:pass@host`` → ``host``): credentials never
  distinguish crawl documents, and re-crawl frontiers routinely carry
  the same URL with and without them — a deliberate dedup choice;
- percent-encoding normalized per RFC 3986 §2.3/§6.2.2: hex digits
  uppercased (``%3f`` → ``%3F``) and UNRESERVED characters decoded
  (``%7E`` → ``~``, ``%41`` → ``A``); reserved escapes (``%2F``,
  ``%3F``, ``%25``…) are kept encoded — decoding those would change
  the URL's structure. Malformed escapes (``%zz``, trailing ``%a``)
  pass through untouched.

- dot-segments resolved (RFC 3986 §5.2.4) to a BOUNDED depth: ``/./``
  collapses and ``/seg/../`` pops, via fixed regex passes (8 levels of
  ``..`` nesting — beyond that the residue is left as-is, which only
  under-merges). Leading ``/../`` at the root is kept verbatim (the
  RFC drops it; keeping it is conservative and loses no dedup on real
  URLs, which don't escape their root).

Not done (documented simplifications): registrable-domain extraction is
last-two-labels (no public-suffix list ships in this sandbox — plug one
in as a broadcast join against a suffix table at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNRESERVED = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
              "abcdefghijklmnopqrstuvwxyz"
              "0123456789-._~")

# a path segment that is NOT '.' or '..' — RE2-safe (no lookahead, so
# the DuckDB oracle can run the same pattern): starts with a non-dot, or
# '.'+non-dot, or '..'+at-least-one-more-char
DOT_SEG = r"([^./][^/]*|\.[^./][^/]*|\.\.[^/]+)"
DOT_DEPTH = 8          # bounded '../' resolution depth

SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
# query = after the FIRST '?' that precedes any '#': a '?' inside the
# fragment (SPA routes like '#/search?q=x') is fragment text, not query
QUERY_RE = r"^[^#?]*\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=|$)"


def percent_normalize(col: Column) -> Column:
    """RFC 3986 percent-escape normalization, pure Catalyst: first
    uppercase lowercase hex digits (all first-digit rewrites, THEN all
    second-digit ones — ``%fa`` needs its first digit uppercased before
    ``%([0-9A-F])a`` can see it), then decode the 66 UNRESERVED
    characters with a constant ``replace`` chain. Decoding unreserved
    chars can never introduce a delimiter or a new ``%``, so the chain
    order is safe; reserved escapes survive (uppercased). Gated on a
    ``contains('%')`` pre-check — the 12 regex passes are skipped
    entirely on the overwhelmingly-common escape-free URL."""
    c = col
    for ch in "abcdef":
        c = F.regexp_replace(c, f"%{ch}([0-9a-fA-F])", f"%{ch.upper()}$1")
    for ch in "abcdef":
        c = F.regexp_replace(c, f"%([0-9A-F]){ch}", f"%$1{ch.upper()}")
    for u in UNRESERVED:
        c = F.replace(c, F.lit(f"%{ord(u):02X}"), F.lit(u))
    return F.when(F.contains(col, F.lit("%")), c).otherwise(col)


def url_scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, SCHEME_RE, 1))


def strip_host(authority: Column) -> Column:
    """authority → lowercased host (userinfo and port stripped) — the
    shared normalization behind ``url_host`` and the link-graph's
    href-host resolution."""
    no_user = F.regexp_replace(authority, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d*$", ""))


def url_host(col: Column) -> Column:
    """Lowercased host without port/userinfo."""
    return strip_host(F.regexp_extract(col, AUTHORITY_RE, 1))


def url_port(col: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    auth = F.regexp_extract(col, AUTHORITY_RE, 1)
    return F.regexp_extract(auth, r":(\d+)$", 1)


def registrable_domain(col: Column) -> Column:
    """Last two dot-labels of the host (PSL-less approximation)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)


def resolve_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an already-extracted path: ``/./`` removal
    first (so ``/a/./../b`` resolves correctly), then ``DOT_DEPTH``
    passes of ``/seg/../`` popping (each global pass resolves one
    nesting level), then the end-of-path variants. Every pass is a
    constant-pattern ``regexp_replace`` mirrored verbatim in the DuckDB
    oracle."""
    c = path
    for _ in range(3):
        c = F.regexp_replace(c, r"/\./", "/")
    for _ in range(DOT_DEPTH):
        c = F.regexp_replace(c, f"/{DOT_SEG}/\\.\\./", "/")
        c = F.regexp_replace(c, f"/{DOT_SEG}/\\.\\.$", "/")
    c = F.regexp_replace(c, r"/\.$", "/")
    return F.when(path.rlike(r"/\.\.?(/|$)"), c).otherwise(path)


SESSION_ID_RE = r"(?i)[?&;](sid|sessionid|phpsessid|jsessionid)="


def url_spam_signals(col: Column) -> dict:
    """Crawl-frontier URL quality signals (public recipe: UbiCrawler /
    IRLbot-style spider-trap heuristics) — all pure Catalyst:

    - ``depth``: path segment count (calendar/faceted traps go deep),
    - ``n_params``: query parameter count,
    - ``digit_ratio``: digits / path length (IDs, dates, sessions),
    - ``has_session_id``: well-known session parameter present,
    - ``repeated_segment``: the path repeats with period 1 (``/b/b``
      stutter) or period 2 (the classic ``/a/b/a/b`` crawler loop) —
      segment ``i`` equals segment ``i+1`` or ``i+2``.
    """
    path = F.regexp_extract(col, PATH_RE, 1)
    query = F.regexp_extract(col, QUERY_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    plen = F.length(path)
    digits = F.length(F.regexp_replace(path, r"[^0-9]", ""))
    pad = F.array(F.lit(""), F.lit(""))

    def _shift_match(k):
        # slice EXACTLY size(segs) so zip_with never pads with NULL
        # (a NULL comparison would turn exists() three-valued)
        shifted = F.slice(F.concat(segs, pad), 1 + k, F.size(segs))
        return F.exists(
            F.zip_with(segs, shifted,
                       lambda a, b: (a == b) & (a != "")),
            lambda x: x)

    # guard the degenerate paths (0/1 segments) where slice/zip_with
    # edge semantics would otherwise surface NULL
    rep = F.when(F.size(segs) >= 2,
                 _shift_match(1) | _shift_match(2)).otherwise(F.lit(False))
    return {
        "depth": F.size(segs),
        "n_params": F.when(query == "", F.lit(0)).otherwise(
            F.size(F.split(query, "&"))),
        "digit_ratio": F.round(
            F.when(plen > 0, digits.cast("double") / plen)
            .otherwise(F.lit(0.0)), 6),
        "has_session_id": col.rlike(SESSION_ID_RE),
        "repeated_segment": rep,
    }


def _canonical_query(col: Column) -> Column:
    q = F.regexp_extract(col, QUERY_RE, 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    return F.array_join(F.sort_array(parts), "&")


def canonicalize_url(col: Column) -> Column:
    """Canonical form per the module rules; non-URL strings (no
    ``scheme://``) pass through unchanged."""
    raw = col
    col = percent_normalize(col)
    scheme = url_scheme(col)
    host = url_host(col)
    port = url_port(col)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(col, PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = resolve_dot_segments(path)
    query = _canonical_query(col)
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(raw)
