"""URL canonicalization + URL-keyed dedup — web-corpus pipeline ops.

No reference-repo analogue (Lucene/Solr stop at retrieval); this is the
URL-normalization stage every CommonCrawl-derived pipeline (C4,
RefinedWeb, Dolma) runs before exact/near dedup: two crawls of the same
page under trivially-different URLs must collapse to one key.

Canonical form (conservative, lossless for well-formed http(s) URLs):
1. fragment dropped (``#…`` never reaches the server);
2. scheme and host lowercased (case-insensitive per RFC 3986 §6.2.2.1);
3. default port stripped (``:80`` for http, ``:443`` for https);
4. one trailing slash stripped from a non-root path;
5. tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``, ``igshid``) — session noise, not content;
6. remaining query params sorted bytewise (param order is almost always
   server-insignificant; sorting is what makes the key canonical).

Everything is a JVM expression chain (regexp_extract / filter /
array_sort / concat) — no UDF, no shuffle; dedup is then one groupBy on
the canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid)="


def canonical_url(url: Column) -> Column:
    """Canonicalize one URL column (see module docstring for the rules).
    URLs without a ``scheme://`` prefix pass through with only fragment
    and query normalization (host rules don't apply)."""
    u = F.regexp_replace(url, "#.*$", "")                     # 1. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?]*)", 1))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*([^?]*)", 1)
    query = F.when(u.contains("?"), F.regexp_extract(u, r"\?(.*)$", 1)) \
             .otherwise(F.lit(""))

    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        hostport.substr(F.lit(1), F.length(hostport) - 3)
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        hostport.substr(F.lit(1), F.length(hostport) - 4)
    ).otherwise(hostport)

    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)

    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE)))
    qcanon = F.array_join(params, "&")

    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")))
    # no scheme -> leave structure alone, still normalize fragment+query
    bare = F.concat(
        F.regexp_extract(u, r"^([^?]*)", 1),
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")))
    return F.when(scheme != "", rebuilt).otherwise(bare)


def url_dedup(docs: DataFrame, url_col: str,
              id_col: str = "doc_id") -> DataFrame:
    """Keep one representative doc per canonical URL — the lowest
    ``id_col`` (crawl order: first fetch wins).  Adds ``canonical_url``
    and ``n_dups`` (total docs sharing the key)."""
    keyed = docs.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    return (keyed
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("n_dups", F.count(F.lit(1)).over(
                Window.partitionBy("canonical_url")))
            .filter(F.col("__rn") == 1).drop("__rn"))
