"""Web-corpus curation primitives: URL canonicalization, canonical-URL
deduplication, host-level governance rollups.

Common-crawl-style pipelines dedup and filter by URL before any content
hash runs — the same page arrives as ``http://WWW.Site.com/a/?utm_source=x``
and ``https://site.com/a`` and must collapse to ONE canonical key. The
reference engine has no web surface (its domain is time-series buckets);
this module belongs to the LLM-pipeline extension set next to
``functions/text.py``.

Canonicalization steps (the conservative, loss-free subset of RFC 3986
normalization plus tracking-param removal):

* scheme and host lowercased; ``www.`` prefix stripped;
* default ports ``:80``/``:443`` dropped;
* fragment dropped;
* tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``);
* remaining query parameters SORTED bytewise (Spark ``array_sort`` and
  DuckDB ``list_sort`` agree on ASCII key=value strings);
* trailing slashes stripped from the path (root path becomes empty —
  host-only URLs and ``host/`` collapse together).

Everything is built-in string/regexp/array expressions — whole-stage
codegen on Spark, and every regexp stays inside the Java-regex ∩ RE2
common subset (no backrefs, no lookaround) so the ``*_sql`` twins replay
bit-identically on DuckDB. No UDFs: at 100 TB URL canonicalization runs
on every row of every crawl snapshot — it must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters stripped during canonicalization. Keys only —
#: matched as a whole query-parameter name.
TRACKING_PARAM_RE = r"(utm_[^=&]*|fbclid|gclid)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with ``www.`` prefix and default port stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )


def url_path(url: Column) -> Column:
    """Path with trailing slashes stripped (root path → empty string)."""
    return F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string minus tracking params, parameters sorted bytewise.
    Empty string when nothing survives."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    no_track = F.regexp_replace(q, r"(^|&)" + TRACKING_PARAM_RE + r"=[^&]*", "")
    trimmed = F.regexp_replace(F.regexp_replace(no_track, r"&&+", "&"), r"^&|&$", "")
    return F.when(trimmed == "", F.lit("")).otherwise(
        F.array_join(F.array_sort(F.split(trimmed, "&")), "&")
    )


def canonical_url(url: Column) -> Column:
    """The canonical form: ``scheme://host path [?sorted-query]``."""
    q = url_query_canonical(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


# --- DuckDB twins: the SAME regexes and rebuild order ---------------------


def url_host_sql(expr: str) -> str:
    hostport = f"lower(regexp_extract({expr}, '{_HOSTPORT_RE}', 1))"
    return (
        f"regexp_replace(regexp_replace({hostport}, '^www\\.', ''), "
        f"':(80|443)$', '')"
    )


def url_path_sql(expr: str) -> str:
    return f"regexp_replace(regexp_extract({expr}, '{_PATH_RE}', 1), '/+$', '')"


def url_query_canonical_sql(expr: str) -> str:
    q = f"regexp_extract({expr}, '\\?([^#]*)', 1)"
    no_track = (
        f"regexp_replace({q}, '(^|&){TRACKING_PARAM_RE}=[^&]*', '', 'g')"
    )
    trimmed = (
        f"regexp_replace(regexp_replace({no_track}, '&&+', '&', 'g'), "
        f"'^&|&$', '', 'g')"
    )
    return (
        f"CASE WHEN {trimmed} = '' THEN '' "
        f"ELSE array_to_string(list_sort(string_split({trimmed}, '&')), '&') END"
    )


def canonical_url_sql(expr: str) -> str:
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RE}', 1))"
    q = url_query_canonical_sql(expr)
    return (
        f"{scheme} || '://' || {url_host_sql(expr)} || {url_path_sql(expr)} "
        f"|| (CASE WHEN ({q}) = '' THEN '' ELSE '?' || ({q}) END)"
    )


# --- operators over the canonical key --------------------------------------


def url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Canonical-URL exact dedup: one keeper (min id) per canonical URL
    plus the collapse count — ``(canon_url, keeper_id, dup_count)``.
    Same hash-groupBy shape as ``operators/dedup.exact_dedup_groups``
    (never all-pairs): one shuffle on the canonical key."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canon_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canon_url")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def domain_rollup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    size_col: str,
    blocked_hosts: list[str] | None = None,
) -> DataFrame:
    """Host-level governance rollup with blocklist filtering: per host,
    total docs, distinct canonical URLs (the post-dedup page count) and
    total bytes — after dropping blocklisted hosts. The blocklist is a
    literal predicate (a broadcast anti-join for file-backed lists);
    either way the filter runs BEFORE the aggregate shuffle, so blocked
    hosts never shuffle at all."""
    host = url_host(F.col(url_col))
    out = df.select(
        host.alias("host"),
        canonical_url(F.col(url_col)).alias("canon"),
        F.col(size_col).alias("_sz"),
    )
    if blocked_hosts:
        out = out.where(~F.col("host").isin(list(blocked_hosts)))
    return out.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canon").alias("n_pages"),
        F.sum("_sz").cast("long").alias("total_chars"),
    )
