"""URL canonicalization and per-host dedup keys — the crawl-pipeline verb.

A web-scale training corpus keys its dedup, its politeness budgeting and its
per-site quality decisions on a CANONICAL url: the same page fetched as
``HTTPS://WWW.Site.COM:443/p//1/?utm_source=x&b=2&a=1#frag`` and
``https://site.com/p/1?a=1&b=2`` must collapse to one key.  This module
implements the standard normalization subset as PURE Spark column
expressions (no UDF — every step is regexp/array/string built-ins inside
whole-stage codegen) plus a DuckDB expression twin for the oracle:

  1. scheme and host lowercased; trailing host dot and a leading ``www.``
     label stripped;
  2. default ports dropped (http:80, https:443), explicit others kept;
  3. path: runs of ``/`` collapsed, trailing ``/`` stripped, empty -> ``/``;
  4. query: split on ``&``, empty tokens and tracking params (utm_*,
     gclid, fbclid, ...) dropped, remainder byte-sorted and re-joined —
     param ORDER never distinguishes two urls, tracking params never
     contribute to identity;
  5. fragment dropped.

Out of scope (documented, not silently wrong): percent-encoding
normalization, userinfo, IDN/punycode, and relative references — inputs
must be absolute http(s) urls; non-matching strings canonicalize to NULL.

``registered_domain`` reduces a host to its registrable domain with the
last-two-labels heuristic plus a small table of common multi-part public
suffixes (``co.uk`` et al.) — a documented subset of the public-suffix
list, not a bundled copy of it.

Scale shape: everything here is a narrow per-row projection — no shuffle,
no UDF, no collect; the downstream per-host aggregate is the only exchange
and it keys on the (low-cardinality) domain, the exact partitioning a
politeness-aware crawler wants anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# identity-free query parameters (click/campaign trackers)
TRACKING_PARAMS = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
)
# NOT in the list: "ref" — on many real sites (code hosts, marketplaces) it
# is content-distinguishing (branch/tag refs, listing refs); dropping it
# would silently collapse distinct pages into one dedup key, which for a
# training corpus means losing documents, a worse failure than keeping the
# occasional affiliate-ref duplicate.

# common multi-part public suffixes (heuristic subset; the full PSL is a
# drop-in replacement for this tuple)
MULTI_PART_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "co.jp",
    "co.in",
    "co.nz",
    "co.kr",
    "co.za",
    "com.au",
    "com.br",
    "com.cn",
    "com.mx",
    "com.ar",
)

# scheme://authority/path?query#fragment (RFC 3986 appendix-B shape,
# restricted to absolute urls with an authority)
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, _URL_RE, 2)


def host_of(url: Column) -> Column:
    """Lowercased host with trailing dot and leading ``www.`` stripped."""
    h = F.lower(F.regexp_extract(_authority(url), r"^([^:]*)", 1))
    h = F.regexp_replace(h, r"\.$", "")
    return F.regexp_replace(h, r"^www\.", "")


def _port(url: Column) -> Column:
    return F.regexp_extract(_authority(url), r":(\d+)$", 1)


def _path_norm(url: Column) -> Column:
    p = F.regexp_extract(url, _URL_RE, 3)
    p = F.regexp_replace(p, r"/{2,}", "/")
    p = F.regexp_replace(p, r"/$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def _query_norm(url: Column) -> Column:
    """Tracking-free, byte-sorted query string ('' if nothing survives)."""
    toks = F.split(F.regexp_extract(url, _URL_RE, 4), "&")
    kept = F.filter(
        toks,
        lambda t: (t != "")
        & ~F.split_part(t, F.lit("="), F.lit(1)).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) url (NULL if unparseable)."""
    scheme = _scheme(url)
    host = host_of(url)
    port = _port(url)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    q = _query_norm(url)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        _path_norm(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), canon)


def registered_domain(host: Column) -> Column:
    """Registrable domain of an already-normalized host (see module doc)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    last3 = F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2)
    return (
        F.when((n >= 3) & last2.isin(*MULTI_PART_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_dedup_key(url: Column) -> Column:
    """struct(domain, canon): the per-host dedup key pair — partition the
    corpus by ``domain`` (politeness / per-site caps), dedup on ``canon``."""
    canon = canonical_url(url)
    return F.struct(
        registered_domain(host_of(url)).alias("domain"), canon.alias("canon")
    )


# ---------------------------------------------------------------------------
# DuckDB expression twins (same steps, same edge cases)
# ---------------------------------------------------------------------------

_URL_RE_SQL = _URL_RE.replace("'", "''")


def _sql_part(expr: str, group: int) -> str:
    return f"regexp_extract({expr}, '{_URL_RE_SQL}', {group})"


def host_of_sql(expr: str) -> str:
    auth = _sql_part(expr, 2)
    return (
        f"regexp_replace(regexp_replace(lower(regexp_extract({auth}, "
        f"'^([^:]*)', 1)), '\\.$', ''), '^www\\.', '')"
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of `canonical_url` over any VARCHAR expression."""
    scheme = f"lower({_sql_part(expr, 1)})"
    host = host_of_sql(expr)
    port = f"regexp_extract({_sql_part(expr, 2)}, ':(\\d+)$', 1)"
    # NB: DuckDB regexp_replace replaces only the FIRST match unless the
    # 'g' option is passed — Spark's is always global
    path = (
        f"CASE WHEN regexp_replace(regexp_replace({_sql_part(expr, 3)}, "
        f"'/{{2,}}', '/', 'g'), '/$', '') = '' THEN '/' ELSE "
        f"regexp_replace(regexp_replace({_sql_part(expr, 3)}, '/{{2,}}', '/', "
        f"'g'), '/$', '') END"
    )
    not_tracking = " AND ".join(
        f"split_part(t, '=', 1) <> '{p}'" for p in TRACKING_PARAMS
    )
    query = (
        f"array_to_string(list_sort(list_filter(string_split("
        f"{_sql_part(expr, 4)}, '&'), t -> t <> '' AND {not_tracking})), '&')"
    )
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    return (
        f"CASE WHEN {scheme} <> '' AND {host} <> '' THEN "
        f"{scheme} || '://' || {host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || {path} || "
        f"(CASE WHEN {query} <> '' THEN '?' || {query} ELSE '' END) "
        f"END"
    )


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of `registered_domain` over a host VARCHAR expression."""
    labels = f"string_split({host_expr}, '.')"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    last2 = f"({labels})[-2] || '.' || ({labels})[-1]"
    last3 = f"({labels})[-3] || '.' || {last2}"
    return (
        f"CASE WHEN len({labels}) >= 3 AND ({last2}) IN ({suffixes}) "
        f"THEN {last3} "
        f"WHEN len({labels}) >= 2 THEN {last2} "
        f"ELSE {host_expr} END"
    )


def url_policy_decisions(
    urls: "DataFrame",
    rules: list[tuple[str, bool]],
    url_col: str = "url",
) -> "DataFrame":
    """(url, canon, host, allowed, matched_prefix): robots-style crawl
    policy over canonicalized urls — each rule is (canonical-url prefix,
    allow), the decision for a url is the flag of the LONGEST matching
    prefix among the rules for its host, and a url with no matching rule
    is allowed (the robots.txt default).  Longest-match precedence is the
    robots semantics: a specific re-allow ("/p/1") overrides a broader
    deny ("/p/").

    Rules should be written against CANONICAL form (lowercased, no www.,
    no default port — `canonical_url`); the operator canonicalizes the
    url side, so raw crawl urls match normalized rules.

    Scale shape: the rule table is policy-sized (thousands at most) and
    broadcasts; the join is an EQUI join on host — each url meets only
    its own host's rules, never the whole rule set — followed by one
    prefix filter and one struct-max per distinct page (two prefixes of
    equal length both matching the same url are necessarily equal, so
    the max is unambiguous).  Decisions compute once per DISTINCT canon
    and join back, so duplicate mentions cost nothing."""
    spark = urls.sparkSession
    rdf = spark.createDataFrame(
        [(p, bool(a)) for p, a in rules], "prefix string, allow boolean"
    )
    rdf = rdf.select(host_of(F.col("prefix")).alias("host"), "prefix", "allow")
    u = (
        urls.select(
            F.col(url_col).alias("url"),
            canonical_url(F.col(url_col)).alias("canon"),
        )
        .withColumn("host", host_of(F.col("canon")))
        # materialize the regex-heavy projection ONCE: CollapseProject
        # would inline the whole canonical_url expression tree into
        # host_of's regexes, and the frame feeds both the distinct-page
        # derivation and the final decision join (the doc_winnow lesson:
        # separate expensive array/regex builds from their consumers with
        # an exchange or checkpoint)
        .localCheckpoint(eager=True)
    )
    pages = u.select("canon", "host").distinct()
    decided = (
        pages.join(F.broadcast(rdf), "host")
        .where(F.col("canon").startswith(F.col("prefix")))
        .groupBy("canon")
        .agg(
            F.max(
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("allow").cast("int").alias("a"),
                    F.col("prefix").alias("p"),
                )
            ).alias("m")
        )
        .select(
            "canon",
            (F.col("m.a") == 1).alias("_allow"),
            F.col("m.p").alias("matched_prefix"),
        )
    )
    return u.join(decided, "canon", "left").select(
        "url",
        "canon",
        "host",
        F.coalesce(F.col("_allow"), F.lit(True)).alias("allowed"),
        "matched_prefix",
    )


def url_policy_oracle_sql(
    url_expr: str,
    rules_values: str,
    table: str = "events",
) -> str:
    """DuckDB twin of `url_policy_decisions` aggregating nothing — emits
    the same per-mention decision rows.  ``rules_values`` is a VALUES
    list SQL producing (prefix, allow)."""
    canon = canonical_url_sql(url_expr)
    return f"""
WITH up_rules AS MATERIALIZED (
  SELECT {host_of_sql("prefix")} AS host, prefix, allow
  FROM ({rules_values}) r(prefix, allow)
),
up_u AS MATERIALIZED (
  SELECT {url_expr} AS url, {canon} AS canon,
         {host_of_sql(canon)} AS host
  FROM {table}
),
up_pages AS (SELECT DISTINCT canon, host FROM up_u),
up_decided AS (
  SELECT canon, allow AS _allow, prefix AS matched_prefix FROM (
    SELECT p.canon, r.allow, r.prefix,
           -- full struct-max order (length, allow, prefix): deterministic
           -- even if a caller passes duplicate prefixes with conflicting
           -- flags (allow wins, matching the Spark side's max)
           ROW_NUMBER() OVER (PARTITION BY p.canon
                              ORDER BY length(r.prefix) DESC,
                                       r.allow DESC, r.prefix DESC) AS rn
    FROM up_pages p JOIN up_rules r ON p.host = r.host
    WHERE starts_with(p.canon, r.prefix)
  ) WHERE rn = 1
)
SELECT u.url, u.canon, u.host,
       COALESCE(d._allow, TRUE) AS allowed,
       d.matched_prefix
FROM up_u u LEFT JOIN up_decided d ON u.canon = d.canon
"""
