"""URL analysis for web-scale corpora — pure Catalyst column
expressions (no UDFs), so parsing/canonicalization stays inside
whole-stage codegen at 10^12-row scale.

A Common-Crawl-style pipeline needs URL keys constantly: dedup by
canonical URL, per-domain skew statistics, host-level quality
aggregation, crawl-frontier partitioning. These helpers build those
keys natively:

* ``url_parts``          scheme/host/port/path/query/fragment struct
* ``canonical_url``      lowercased scheme+host, default ports
                         stripped, query params sorted, fragment cut
* ``registered_domain``  public-suffix-lite eTLD+1 (two labels, three
                         for the common co.uk-style multi-part
                         suffixes)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# URL pieces per RFC 3986's regex appendix (simplified: no userinfo)
_RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*):"
_RE_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
_RE_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\d+)"
_RE_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = r"\?([^#]*)"
_RE_FRAGMENT = r"#(.*)$"

#: multi-part public suffixes a web pipeline hits constantly —
#: intentionally a short curated list, not the full PSL (which is a
#: downloadable dataset, out of scope for a sandboxed engine)
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "co.za", "com.ar", "com.tr",
)


def url_parts(url: Column) -> Column:
    """Struct of (scheme, host, port, path, query, fragment) parsed
    with native regexp_extract — empty string where absent."""
    return F.struct(
        F.lower(F.regexp_extract(url, _RE_SCHEME, 1)).alias("scheme"),
        F.lower(F.regexp_extract(url, _RE_HOST, 1)).alias("host"),
        F.regexp_extract(url, _RE_PORT, 1).alias("port"),
        F.regexp_extract(url, _RE_PATH, 1).alias("path"),
        F.regexp_extract(url, _RE_QUERY, 1).alias("query"),
        F.regexp_extract(url, _RE_FRAGMENT, 1).alias("fragment"),
    )


def canonical_url(url: Column) -> Column:
    """Canonical form for dedup keys: scheme+host lowercased, default
    ports (http:80 / https:443) stripped, query parameters sorted
    bytewise, fragment removed, trailing '?' dropped, empty path
    normalized to '/'."""
    p = url_parts(url)
    scheme = p["scheme"]
    default_port = ((scheme == "http") & (p["port"] == "80")) | \
        ((scheme == "https") & (p["port"] == "443"))
    port = F.when(p["port"] == "", F.lit("")) \
        .when(default_port, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    query = F.when(
        p["query"] == "", F.lit("")).otherwise(
        F.concat(F.lit("?"),
                 F.array_join(F.array_sort(F.split(p["query"], "&")),
                              "&")))
    return F.concat(scheme, F.lit("://"), p["host"], port, path, query)


def registered_domain(host: Column) -> Column:
    """eTLD+1: the last two dot-labels, or the last three when the
    final two form a known multi-part suffix (co.uk etc.)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    multi = last2.isin(*MULTIPART_SUFFIXES)
    return F.when(n <= 2, host).when(multi & (n >= 3), last3) \
        .otherwise(last2)


def path_depth(path: Column) -> Column:
    """Number of non-empty path segments — a cheap crawl-depth proxy."""
    return F.size(F.filter(F.split(path, "/"),
                           lambda s: s != F.lit("")))


def resolve_dot_segments(path: Column, max_depth: int = 6) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments as a bounded unroll of two
    native regex rules per level: ``/./`` collapse and
    ``/segment/../`` elimination, then the root-overflow rule
    (``/../`` at the root resolves to ``/``). ``max_depth`` bounds the
    relative-nesting depth resolved (6 covers any non-pathological
    crawl URL; deeper chains just stay partially resolved — routing
    keys degrade gracefully, they don't error). Patterns avoid
    lookaround so the identical rules run on RE2 (DuckDB) and Java
    regex (Spark)."""
    # the consumed segment must not itself be "." or ".." (else one
    # match eats two ups); alternation instead of lookahead so the
    # same pattern runs on RE2
    seg = r"(\.\.[^/]+|\.[^./][^/]*|[^./][^/]*)"
    for _ in range(max_depth):
        path = F.regexp_replace(path, r"/\.(/|$)", "/")
        path = F.regexp_replace(path, "/" + seg + r"/\.\.(/|$)", "/")
    path = F.regexp_replace(path, r"^(/\.\.)+(/|$)", "/")
    return F.when(path == "", F.lit("/")).otherwise(path)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) dedup key — the
    web-archive canonical form (``com,example,www)/path?query``):
    host labels reversed and comma-joined, scheme dropped, default
    ports stripped, dot segments resolved, query params sorted,
    fragment removed. Grouping a 10^12-page crawl by this key is the
    classic same-page-collapse; all native Catalyst."""
    p = url_parts(url)
    rev_host = F.array_join(F.reverse(F.split(p["host"], r"\.")), ",")
    scheme = p["scheme"]
    default_port = ((scheme == "http") & (p["port"] == "80")) | \
        ((scheme == "https") & (p["port"] == "443"))
    port = F.when(p["port"] == "", F.lit("")) \
        .when(default_port, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), p["port"]))
    path = resolve_dot_segments(p["path"])
    query = F.when(
        p["query"] == "", F.lit("")).otherwise(
        F.concat(F.lit("?"),
                 F.array_join(F.array_sort(F.split(p["query"], "&")),
                              "&")))
    return F.concat(rev_host, port, F.lit(")"), path, query)


def hreflang_links(html: Column) -> Column:
    """array<struct<hreflang:string, href:string>> extracted from
    ``<link rel="alternate" hreflang=... href=...>`` tags — the
    signal that groups a multilingual site's pages into translation
    clusters (the dedup unit for multilingual corpus balancing: keep
    one page per cluster per language, not N mirrors). Two zipped
    regexp_extract_all passes over the same tag pattern, native."""
    tag = (r'<link\s+rel="alternate"\s+hreflang="([^"]*)"\s+'
           r'href="([^"]*)"\s*/?>')
    return F.arrays_zip(
        F.regexp_extract_all(html, F.lit(tag), 1).alias("hreflang"),
        F.regexp_extract_all(html, F.lit(tag), 2).alias("href"))
