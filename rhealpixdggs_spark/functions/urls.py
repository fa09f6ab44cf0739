"""URL canonicalization for web-page tables — pure column
expressions, no UDF (engine-level operator; the north star's
per-URL pipeline needs a canonical join/dedup key for pages).

Canonical form (the common crawl-dedup conventions):
  - scheme and host lowercased;
  - userinfo (user:pass@) stripped from the authority — credentials
    never belong in a dedup key;
  - #fragment stripped;
  - default ports dropped (http:80, https:443), others kept;
  - empty path normalized to '/';
  - utm_* tracking params dropped, remaining query params SORTED
    byte-wise so param order never splits a dedup group;
  - empty query string drops its '?'.

Everything compiles to whole-stage-codegen string/array expressions
(regexp_extract, filter, array_sort), so canonicalization adds a
map-only stage to any scan — no shuffle, no Python. The DuckDB twin
in the driver contract re-derives the same form with list_filter /
list_sort, gating every rule bit-for-bit.

Documented limitations (out of scope for the crawl-dedup key):
  - scheme-relative / scheme-less inputs ("//host/x", "host/x")
    produce a canonical form with an empty scheme ("://host/x") —
    crawl URL tables carry absolute URLs; pre-filter or prepend a
    scheme upstream if yours do not;
  - IPv6 host literals ("[::1]:8080") are not parsed — the ':'
    host/port split assumes a reg-name or IPv4 host (the common-crawl
    case); bracketed literals keep their brackets and lose the port.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL column into canonical-ready parts."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    # strip userinfo: RFC 3986 forbids a raw '@' inside host, so
    # everything up to the first '@' in the authority is credentials
    hostport = F.regexp_replace(hostport, "^[^@]*@", "")
    host = F.lower(F.regexp_extract(hostport, "^([^:]*)", 1))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": F.when(path == "", F.lit("/")).otherwise(path),
        "query": query,
    }


def canonical_url(url: Column) -> Column:
    """Canonical URL string (see module docstring for the rules)."""
    p = url_parts(url)
    default_port = (
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == "")
    )
    portpart = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"])
    )
    params = F.filter(
        F.split(p["query"], "&"),
        lambda x: (~x.startswith("utm_")) & (x != ""),
    )
    q = F.array_join(F.array_sort(params), "&")
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(
        p["scheme"], F.lit("://"), p["host"], portpart, p["path"], qpart
    )


def url_host(url: Column) -> Column:
    """Lowercased host — the per-site rollup / partitioning key."""
    return url_parts(url)["host"]
