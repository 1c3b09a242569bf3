"""URL canonicalization + host-suffix scalars — pure Column expressions
(zero Python, whole-stage codegen), the web-curation siblings of
functions/paths.py.

Canonicalization rule set (the common-crawl-style normal form):
  * scheme and host lowercased; a leading ``www.`` label dropped
  * default ports stripped (``:80`` for http, ``:443`` for https);
    non-default ports kept
  * tracking parameters removed (``utm_*``), remaining query params
    SORTED (param order is not semantic; sorting makes the form
    canonical), empty query dropped
  * fragment dropped (client-side only)
  * trailing slashes collapsed; empty path becomes ``/``

Everything is regexp_extract / split / array ops so the DuckDB oracle can
mirror each step exactly (plans/queries.py url_canonicalize).

At 100 TB this runs as a map-only projection inside the scan stage — no
shuffle, no UDF. The suffix expansion (host_suffixes) is bounded by the
DNS label count (practically <= 6), so the blocklist join explodes each
row a constant number of times and stays an EQUI-join: the alternative —
``host LIKE '%' || suffix`` against the blocklist — is a nested loop over
the whole corpus x blocklist at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_PREFIXES = ("utm_",)


def _hostport(url: Column) -> Column:
    return F.regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1)


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, "^([A-Za-z]+)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` label removed."""
    host = F.lower(F.split(_hostport(url), ":").getItem(0))
    return F.regexp_replace(host, "^www\\.", "")


def url_port(url: Column) -> Column:
    """Explicit port as a string, NULL when absent."""
    parts = F.split(_hostport(url), ":")
    return F.when(F.size(parts) > 1, parts.getItem(1))


def url_path(url: Column) -> Column:
    """Path with trailing slashes collapsed; '/' when empty."""
    p = F.regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    trimmed = F.regexp_replace(p, "/+$", "")
    return F.when(trimmed == "", F.lit("/")).otherwise(trimmed)


def _is_tracking(p: Column) -> Column:
    cond = F.lit(False)
    for prefix in TRACKING_PREFIXES:
        cond = cond | p.startswith(prefix)
    return cond


def url_query_canonical(url: Column) -> Column:
    """Sorted, tracking-stripped query string (no leading '?'); ''
    when nothing survives."""
    q = F.regexp_extract(url, "\\?([^#]*)", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    return F.concat_ws("&", F.array_sort(params))


def canonicalize_url(url: Column) -> Column:
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        port.isNotNull() & ~default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    q = url_query_canonical(url)
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), host, port_part, url_path(url), q_part
    )


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host with >= 2 labels, e.g.
    ``cdn.src1.example.com`` -> [``src1.example.com``..., ``example.com``]
    (including the full host itself). Registrable-suffix blocklists match
    by equi-joining this exploded column — never by LIKE."""
    arr = F.split(host, "\\.")
    n = F.size(arr)
    # guard: a single-label host (localhost, intranet names) has no
    # >=2-label suffix — sequence(2, 1) would descend and slice() throws;
    # CaseWhen evaluates only the taken branch, so the guard is total
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda length: F.concat_ws(
                ".", F.slice(arr, n - length + 1, length)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# RFC 3986 scheme prefix: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":"
_SCHEME_PREFIX = r"^[a-zA-Z][a-zA-Z0-9+.\-]*:"


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over a path column, as ONE codegen fold: split on
    '/', aggregate with an array accumulator ('.' skips, '..' pops —
    never past the leading rooted segment), re-join. A trailing '/.'
    or '/..' keeps the trailing slash per the RFC's output table; a
    plain trailing '/' survives as the split's empty last segment."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            (s == "..") & (F.size(acc) > 1),
            F.slice(acc, 1, F.size(acc) - 1),
        )
        .when(s == "..", acc)
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.array_join(folded, "/")
    return F.when(
        path.rlike(r"/\.\.?$"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_url(base: Column, ref: Column) -> Column:
    """Resolve a reference against an absolute hierarchical base URL —
    RFC 3986 §5.2 reference resolution as one codegen CASE: absolute
    refs pass through verbatim (strict parser, no dot-normalization of
    foreign URLs), '//' takes the base scheme, '/' is authority-rooted
    (dot segments removed), '?' replaces only the query, '#' only the
    fragment, '' is the base sans fragment, and a relative path merges
    with the base path's directory then removes dot segments — '..'
    underflow clamps at the root per §5.2.4. This is what turns an
    extracted href column into a link-graph edge: at crawl scale most
    hrefs are relative, and a graph keyed on raw href strings is not a
    graph. Zero Python; composes with canonicalize_url downstream."""
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", 1)
    auth = F.regexp_extract(
        base, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1
    )
    root = F.concat(scheme, F.lit("://"), auth)
    bpath = F.regexp_extract(
        base, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    defrag = F.regexp_replace(base, r"#.*$", "")
    rpath = F.regexp_extract(ref, r"^([^?#]*)", 1)
    rtail = F.substring(ref, F.length(rpath) + 1, F.length(ref))
    bdir = F.regexp_extract(bpath, r"^(.*/)", 1)
    bdir = F.when(bdir == "", F.lit("/")).otherwise(bdir)
    return (
        F.when(ref == "", defrag)
        .when(ref.rlike(_SCHEME_PREFIX), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        .when(ref.startswith("#"), F.concat(defrag, ref))
        .when(ref.startswith("?"), F.concat(root, bpath, ref))
        .when(
            ref.startswith("/"),
            F.concat(root, remove_dot_segments(rpath), rtail),
        )
        .otherwise(
            F.concat(
                root,
                remove_dot_segments(F.concat(bdir, rpath)),
                rtail,
            )
        )
    )
