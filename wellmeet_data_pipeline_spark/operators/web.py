"""URL canonicalization + domain-grain corpus curation.

The reference URL-decodes S3 object keys (save-reviews/
lambda_function.py:43) — this module generalizes that one string read
into the URL-grain family a web-scale training-data pipeline needs:
canonical URL keys for exact-dup detection across syntactic variants,
and RefinedWeb-style per-domain frequency caps (Penedo et al. 2023 §3.1
dedup by URL; domain caps bound any single host's share of the corpus).

Everything is pure Catalyst string/array expressions — no UDFs, no
regex inside higher-order-function lambdas (HOF lambda bodies are
interpreted, the NOTES 8-20x class; the tracking-param predicate is a
chain of startswith() string ops instead).

Canonicalization contract (applied in this order, mirrored verbatim by
the DuckDB oracles):

1. scheme := lower(text before "://"); inputs WITHOUT a scheme
   canonicalize to NULL (they are not URLs; callers filter or coalesce).
2. userinfo ("user:pw@") is stripped from the authority.
3. host := lower(authority minus port); IDN hosts are case-folded but
   NOT punycoded (no codec in pure SQL — documented non-goal; IPv6
   bracket hosts are likewise out of contract).
4. default ports are dropped (http:80, https:443); any other explicit
   port is kept as host:port.
5. path: trailing "/" runs are stripped; the empty path becomes "/"
   (percent-encoding and dot-segment normalization are out of contract
   — url_decode exists separately, functions/text.py).
6. query: params split on "&"; tracking params dropped (utm_* prefix
   and the exact/prefix keys in TRACKING_KEYS); survivors SORTED
   byte-wise and re-joined — param order never distinguishes URLs.
7. fragment is always dropped.

Reference: save-reviews/lambda_function.py:43 (unquote_plus on keys) is
the only URL handling the reference does; the canonical form and domain
caps are the scale-pipeline extension the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

# exact keys (also matched as "key=..." prefixes); utm_* is prefix-matched
TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref", "ref_src")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _is_tracking_param(p: Column) -> Column:
    """Pure string-op predicate (no regex — safe inside array lambdas)."""
    cond = p.startswith("utm_")
    for k in TRACKING_KEYS:
        cond = cond | (p == k) | p.startswith(k + "=")
    return cond


def _parts(url: Column):
    """(scheme, host, netloc, path, sorted-filtered query) of a URL
    column — the ONE place authority/host extraction lives, so
    canonical_url and url_domain can never disagree on the host."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    # everything after "://" — substring arithmetic, not ".*" (Java "."
    # excludes \r and U+0085/U+2028/U+2029 where RE2 excludes only \n:
    # dot in a tail-capture diverges on hostile whitespace; negated char
    # classes like [^#] match line terminators identically on both
    # engines, so every capture below uses those instead)
    after = F.substring(url, F.length(scheme) + F.lit(4), F.length(url))
    authority = F.regexp_extract(after, r"^([^/?#]*)", 1)
    rest = F.substring(after, F.length(authority) + F.lit(1), F.length(after))
    auth = F.regexp_replace(authority, r"^[^@]*@", "")
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    netloc = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        host,
    ).otherwise(F.concat(host, F.lit(":"), port))
    # fragment strips FIRST: a '?' inside the fragment is fragment text,
    # not a query (review catch — an unanchored \?-capture read
    # '#sec?a=1' as a query and minted distinct canonical keys for
    # fragment-only variants)
    defrag = F.regexp_extract(rest, r"^([^#]*)", 1)
    path_stripped = F.regexp_replace(
        F.regexp_extract(defrag, r"^([^?]*)", 1), r"/+$", ""
    )
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    query = F.regexp_extract(defrag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"), lambda x: (x != "") & ~_is_tracking_param(x)
    )
    qs = F.array_join(F.array_sort(params), "&")
    return scheme, host, netloc, path, qs


def canonical_url(url: Column) -> Column:
    """The canonical form per the module contract; NULL for non-URLs."""
    scheme, _, netloc, path, qs = _parts(url)
    canon = F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def url_domain(url: Column, strip_www: bool = True) -> Column:
    """Grouping domain: canonical host, minus port/userinfo, minus a
    leading "www." (so www.x.com and x.com pool).  No public-suffix
    registrable-domain reduction (needs the PSL table — callers can join
    one); NULL for non-URLs.  Host comes from the SAME _parts extraction
    canonical_url uses (review catch: a duplicated extraction could
    drift and make the two disagree on the host)."""
    scheme, host, _, _, _ = _parts(url)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(host)


def domain_doc_caps(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 3,
    strip_www: bool = True,
) -> DataFrame:
    """RefinedWeb-style per-domain frequency cap: at most `cap` docs per
    domain survive, lowest `id_col` first (a deterministic total order,
    NOT arrival order — re-runs pick identical survivors).

    Plan shape, skew-free: the per-domain rank comes from
    global_rank_cumsum over the (domain, id) total order — a two-pass
    range-partitioned rank with NO domain-partitioned window, so a
    mega-domain holding 10^9 docs spreads over every range partition
    instead of landing in one task (the windows.py single-partition
    class).  Per-domain offsets (min rank) and counts are one map-side-
    combined aggregation joined back on the domain key; rows entering
    that join are (id, domain, rank) — never document payloads.

    Output: (id, domain, domain_rank, n_domain_docs, keep) — keep=1 for
    survivors; callers semi-join survivors back to the corpus so wide
    rows never ride the rank shuffle."""
    d = docs.select(
        F.col(id_col),
        url_domain(F.col(url_col), strip_www=strip_www).alias("domain"),
    ).filter(F.col("domain").isNotNull())
    ranked = global_rank_cumsum(
        d, [F.col("domain"), F.col(id_col)], rank_col="__grank"
    )
    offs = ranked.groupBy("domain").agg(
        F.min("__grank").alias("__off"),
        F.count("*").alias("n_domain_docs"),
    )
    return ranked.join(offs, "domain").select(
        F.col(id_col),
        "domain",
        (F.col("__grank") - F.col("__off") + 1).cast("long").alias("domain_rank"),
        F.col("n_domain_docs").cast("long").alias("n_domain_docs"),
        (F.col("__grank") - F.col("__off") < cap).cast("int").alias("keep"),
    )
