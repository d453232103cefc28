"""Web-crawl curation helpers: URL parsing features and per-domain rollups.

Beyond-reference operators for the crawl-ingest side of a training-data
pipeline: before any text-quality pass, crawl curation filters and
stratifies BY URL STRUCTURE — host/domain mixing, path-depth heuristics
(deep paths correlate with boilerplate/pagination), query-parameter counts
(session ids, trackers). Everything here is built on the JVM ``parse_url``
expression + string functions — map-only, codegen-friendly, no Python in
the path.

Scale shape: :func:`with_url_features` is a pure projection (zero
shuffles); :func:`domain_counts` adds one partially-aggregated ``groupBy``
on the (tiny) domain key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _feature_exprs(u: Column) -> dict:
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.parse_url(u, F.lit("PATH"))
    query = F.parse_url(u, F.lit("QUERY"))
    labels = F.split(host, r"\.")
    # registrable domain as the last two labels — the PSL-free
    # approximation (multi-label suffixes like co.uk need a suffix list)
    domain = F.when(F.size(labels) >= 2,
                    F.concat_ws(".", F.slice(labels, -2, 2))
                    ).otherwise(host)
    depth = F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"),
                            lambda x: x != ""))
    n_params = F.when(query.isNull() | (query == ""), F.lit(0)).otherwise(
        F.size(F.split(query, "&")))
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    return {
        "url_host": host,
        "url_domain": domain,
        "url_path_depth": depth.cast("int"),
        "url_n_params": n_params.cast("int"),
        "url_is_https": (scheme == "https"),
    }


def with_url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append URL-structure feature columns: ``url_host`` (lowercased),
    ``url_domain`` (registrable domain, last-two-labels approximation),
    ``url_path_depth`` (non-empty path segments), ``url_n_params``
    (query parameters), ``url_is_https``. Unparseable URLs yield null
    host/domain/https and 0 depth/params (``parse_url`` is null-safe) —
    corrupt rows never kill the scan. Map-only projection; all
    expressions stay in whole-stage codegen.
    """
    exprs = _feature_exprs(F.col(url_col))
    return df.withColumns(exprs)


def domain_counts(df: DataFrame, url_col: str = "url",
                  top_k: int = 100) -> DataFrame:
    """Top domains by page count with their share of the corpus — the
    crawl-mix diagnostic that decides per-domain caps (one domain owning
    the corpus is the classic crawl failure). One partially-aggregated
    ``groupBy(domain)``; the share denominator comes from a second
    aggregate over the counts table (no corpus rescan). Null/unparseable
    domains count as a row (null domain) so the corruption rate is
    visible. TakeOrdered top-k, count-desc then domain-asc."""
    dom = _feature_exprs(F.col(url_col))["url_domain"]
    counts = df.select(dom.alias("url_domain")).groupBy("url_domain").agg(
        F.count(F.lit(1)).alias("n_pages"))
    total = counts.agg(F.sum("n_pages")).collect()[0][0] or 1
    return (counts
            .withColumn("share", F.col("n_pages") / F.lit(float(total)))
            .orderBy(F.desc("n_pages"), F.asc("url_domain"))
            .limit(top_k))
