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
    """Lowercased host: userinfo (``user:pass@``) stripped BEFORE
    lowercasing (credentials never reach canonical keys or rollups),
    ``www.`` prefix stripped, and only the scheme's OWN default port
    dropped (``:80`` for http, ``:443`` for https — ``http://h:443/``
    keeps its port; it is a different origin)."""
    scheme = url_scheme(url)
    hostport = F.lower(
        F.regexp_replace(F.regexp_extract(url, _HOSTPORT_RE, 1), r"^[^/?#@]*@", "")
    )
    nowww = F.regexp_replace(hostport, r"^www\.", "")
    return (
        F.when(scheme == "http", F.regexp_replace(nowww, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(nowww, r":443$", ""))
        .otherwise(nowww)
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
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RE}', 1))"
    hostport = (
        f"lower(regexp_replace(regexp_extract({expr}, '{_HOSTPORT_RE}', 1), "
        f"'^[^/?#@]*@', ''))"
    )
    nowww = f"regexp_replace({hostport}, '^www\\.', '')"
    return (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({nowww}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({nowww}, ':443$', '') "
        f"ELSE {nowww} END)"
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


# --- boilerplate detection / removal ---------------------------------------
#
# CCNet-style site-template removal: a line repeated across MANY documents
# of the same host (nav menus, cookie banners, footers) is boilerplate,
# not content — the curation step between URL dedup and quality filtering.
# Detection is per-(host, line) document counts against per-host totals
# with an integer cross-multiply threshold (no float fractions); removal
# anti-joins the (small, template-sized) boilerplate set back against the
# exploded lines and reassembles documents in original line order. At
# 100 TB: one explode + two keyed aggregates, the boilerplate table
# broadcasts (site templates are tiny next to the corpus).
#
# Detection shuffles HASHES, never raw text (the repo-wide substring-dedup
# discipline): lines collapse to a 60-bit md5 prefix pre-shuffle, counting
# groups on (host, hash), and the exemplar line text joins back ONLY for
# the tiny surviving template set (broadcast semi-filter — non-template
# lines never shuffle as strings). Two distinct same-host lines sharing a
# 60-bit prefix would merge (P ≈ n²/2^61 per host — negligible at any
# real per-host line-template cardinality).


def boilerplate_lines(
    df: DataFrame,
    host_col: str,
    id_col: str,
    text_col: str,
    sep: str = " | ",
    min_frac_ppm: int = 500_000,
) -> DataFrame:
    """Per-host boilerplate lines: lines present in ≥ min_frac_ppm
    (parts-per-million of the host's docs — integer cross-multiply,
    ``n_line·10^6 ≥ ppm·n_host``). Returns
    ``(host, line, n_docs_line, n_docs_host)``. Raw line text never
    shuffles corpus-wide — see the module comment."""
    surviving = detect_boilerplate_hashes(
        df, host_col, id_col, text_col, sep, min_frac_ppm
    ).localCheckpoint(eager=False)
    # ^ referenced twice below (exemplar semi-filter + final join); the
    # checkpoint pins the tiny template set so the detection aggregate
    # runs once (r9 lesson: count/filter aggregates are plans, not values)
    exploded = _exploded_lines(df, host_col, id_col, text_col, sep)
    exemplar = (
        exploded.withColumn("_lh", _line_hash(F.col("line")))
        .join(
            F.broadcast(surviving.select("host", "_lh")), ["host", "_lh"], "left_semi"
        )
        .groupBy("host", "_lh")
        .agg(F.min("line").alias("line"))
    )
    return surviving.join(exemplar, ["host", "_lh"]).select(
        "host", "line", "n_docs_line", "n_docs_host"
    )


def _line_hash(col: Column) -> Column:
    """60-bit md5 prefix of the line — the detection shuffle key."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _exploded_lines(
    df: DataFrame, host_col: str, id_col: str, text_col: str, sep: str
) -> DataFrame:
    import re as _re

    return df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), _re.escape(sep))).alias("line"),
    )


def detect_boilerplate_hashes(
    df: DataFrame,
    host_col: str,
    id_col: str,
    text_col: str,
    sep: str = " | ",
    min_frac_ppm: int = 500_000,
) -> DataFrame:
    """The hash-keyed detection core: ``(host, _lh, n_docs_line,
    n_docs_host)`` for lines over the threshold. Every shuffle here
    carries ``(host, _id, _lh)`` BIGINT/key columns only — plan-pinned
    in tests (no raw-text grouping key anywhere)."""
    hashed = (
        _exploded_lines(df, host_col, id_col, text_col, sep)
        .select("host", "_id", _line_hash(F.col("line")).alias("_lh"))
        .distinct()  # a line twice in one doc counts once
    )
    per_line = hashed.groupBy("host", "_lh").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_line")
    )
    per_host = df.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).cast("long").alias("n_docs_host")
    )
    return per_line.join(F.broadcast(per_host), "host").where(
        F.col("n_docs_line") * F.lit(1_000_000)
        >= F.lit(int(min_frac_ppm)) * F.col("n_docs_host")
    )


def boilerplate_lines_sql(
    src_sql: str,
    host_expr: str,
    id_expr: str,
    text_expr: str,
    sep: str = " | ",
    min_frac_ppm: int = 500_000,
) -> str:
    """DuckDB twin: same hash-keyed counting (identical 60-bit md5
    prefix), same cross-multiply, same exemplar join-back."""
    sep_lit = sep.replace("'", "''")
    return f"""
    WITH src AS MATERIALIZED (
      SELECT {host_expr} AS host, {id_expr} AS _id, {text_expr} AS _txt
      FROM ({src_sql})
    ),
    lines AS MATERIALIZED (
      SELECT host, _id, line,
             CAST(('0x' || substr(md5(line), 1, 15)) AS BIGINT) AS _lh
      FROM (
        SELECT host, _id, unnest(string_split(_txt, '{sep_lit}')) AS line
        FROM src
      )
    ),
    per_line AS (
      SELECT host, _lh, CAST(count(DISTINCT _id) AS BIGINT) AS n_docs_line
      FROM lines GROUP BY host, _lh
    ),
    per_host AS (
      SELECT host, CAST(count(DISTINCT _id) AS BIGINT) AS n_docs_host
      FROM src GROUP BY host
    ),
    surviving AS MATERIALIZED (
      SELECT l.host, l._lh, l.n_docs_line, h.n_docs_host
      FROM per_line l JOIN per_host h USING (host)
      WHERE l.n_docs_line * 1000000 >= {int(min_frac_ppm)} * h.n_docs_host
    ),
    exemplar AS (
      SELECT l.host, l._lh, min(l.line) AS line
      FROM lines l JOIN surviving s ON s.host = l.host AND s._lh = l._lh
      GROUP BY l.host, l._lh
    )
    SELECT s.host, e.line, s.n_docs_line, s.n_docs_host
    FROM surviving s JOIN exemplar e ON e.host = s.host AND e._lh = s._lh
    """


def remove_boilerplate(
    df: DataFrame,
    host_col: str,
    id_col: str,
    text_col: str,
    sep: str = " | ",
    min_frac_ppm: int = 500_000,
) -> DataFrame:
    """Documents with boilerplate lines removed, original line order
    preserved: ``(id, host, clean_text, n_lines_kept, n_lines_dropped)``.
    The boilerplate set broadcasts into the anti-join; reassembly sorts
    each doc's surviving (pos, line) pairs — a per-doc array, never a
    data-wide window."""
    import re as _re

    bp = boilerplate_lines(df, host_col, id_col, text_col, sep, min_frac_ppm)
    exploded = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "line"),
    )
    kept = exploded.join(
        F.broadcast(bp.select("host", "line")), ["host", "line"], "left_anti"
    )
    n_all = exploded.groupBy("host", "_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n_all")
    )
    clean = kept.groupBy("host", "_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
    )
    return (
        n_all.join(clean, ["host", "_id"], "left")
        .select(
            F.col("_id").alias(id_col),
            "host",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("_n_all") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def remove_boilerplate_sql(
    src_sql: str,
    host_expr: str,
    id_expr: str,
    text_expr: str,
    id_name: str,
    sep: str = " | ",
    min_frac_ppm: int = 500_000,
) -> str:
    """DuckDB twin: same boilerplate set, positional unnest, ordered
    string_agg reassembly."""
    sep_lit = sep.replace("'", "''")
    bp = boilerplate_lines_sql(
        src_sql, host_expr, id_expr, text_expr, sep, min_frac_ppm
    )
    return f"""
    WITH bp AS MATERIALIZED ({bp}),
    src2 AS MATERIALIZED (
      SELECT {host_expr} AS host, {id_expr} AS _id, {text_expr} AS _txt
      FROM ({src_sql})
    ),
    exploded AS (
      SELECT host, _id,
             unnest(string_split(_txt, '{sep_lit}')) AS line,
             generate_subscripts(string_split(_txt, '{sep_lit}'), 1) AS pos
      FROM src2
    ),
    kept AS (
      SELECT e.* FROM exploded e
      WHERE NOT EXISTS (
        SELECT 1 FROM bp WHERE bp.host = e.host AND bp.line = e.line
      )
    ),
    n_all AS (
      SELECT host, _id, CAST(count(*) AS BIGINT) AS n_all
      FROM exploded GROUP BY host, _id
    ),
    clean AS (
      SELECT host, _id,
             string_agg(line, '{sep_lit}' ORDER BY pos) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_lines_kept
      FROM kept GROUP BY host, _id
    )
    SELECT a._id AS {id_name}, a.host,
           COALESCE(c.clean_text, '') AS clean_text,
           COALESCE(c.n_lines_kept, 0) AS n_lines_kept,
           CAST(a.n_all - COALESCE(c.n_lines_kept, 0) AS BIGINT)
             AS n_lines_dropped
    FROM n_all a LEFT JOIN clean c USING (host, _id)
    """
