"""URL functions for web-corpus curation — pure Spark SQL expressions
(whole-stage codegen; exact ANSI-SQL oracles in __spark_entry__).

Crawl pipelines key almost everything on URLs: normalization makes
(url -> doc) dedup keys stable across trivially-different spellings,
and host/domain extraction drives per-site rate caps, domain-level
quality priors and train/test splits by registrable domain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus userinfo/port); '' when the
    URL has no '//' authority. IPv6 bracket literals are matched as a
    unit ([::1]:8080 -> '[::1]') — the bracket alternation must come
    first or the colon-terminated form stops at '['."""
    host = F.regexp_extract(
        url,
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]*)",
        1,
    )
    return F.lower(host)


def url_normalize(url: Column) -> Column:
    """Canonical URL form for dedup keys: lowercase scheme+host, strip
    the fragment, drop a default port (:80 http / :443 https), drop a
    single trailing '/' on an empty path. Purely syntactic — no
    network, no IDNA; documented subset."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_extract(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(.*)$", 1)
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    path = F.substring(rest, F.length(authority) + 1, 1 << 20)
    userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)  # kept verbatim
    hostport = F.regexp_replace(authority, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    norm_hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    norm_path = F.when(path == "/", F.lit("")).otherwise(path)
    return F.when(
        scheme == "", no_frag  # not a //-authority URL: only strip fragment
    ).otherwise(
        F.concat(scheme, F.lit("://"), userinfo, norm_hostport, norm_path)
    )


def registrable_domain(url: Column) -> Column:
    """Last-two-labels heuristic for the registrable domain — the
    Public Suffix List's implicit default rule, correct only for
    single-label public suffixes (example.co.uk -> co.uk is WRONG).
    Use functions.psl.registrable_domain_psl (vendored PSL subset,
    broadcast joins) wherever multi-label suffixes matter; this
    column-expression form remains for suffixless quick passes."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)
