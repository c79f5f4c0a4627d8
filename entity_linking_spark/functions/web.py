"""URL canonicalization + URL-keyed dedup for web-corpus ingestion.

Beyond-reference operators (the reference repo consumes a curated KB
dump and never sees raw URLs): the standard first line of web-crawl
dedup — before any content hashing, collapse the URL variants that
crawlers emit for the same resource. The normalization steps are the
widely-published safe subset of RFC 3986 §6 (case of scheme/host,
default ports, empty/root path, fragments) plus the de-facto crawl
conventions (drop tracking parameters, sort the query string, fold the
``www.`` host prefix).

Everything is a pure Column expression (regexp_extract / regexp_replace
/ array ops) — whole-stage codegen end to end, no UDF, so it runs at
scan speed on 100 TB of crawl metadata. The regexes avoid backreference
and lookaround syntax so the same patterns run unchanged on RE2-family
engines (the DuckDB oracle twin uses the identical strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# RFC 3986 appendix-B style splitter, restricted to hierarchical URLs
# (scheme://authority path [?query] [#fragment]); RE2-safe.
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# Tracking parameters dropped during canonicalization: the utm_*
# family plus the common click identifiers. Kept deliberately short
# and documented — canonicalization must never drop a load-bearing
# parameter, so only parameters that are advertising/session noise by
# publisher contract are listed.
TRACKING_PARAM_PREFIX = "utm_"
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a hierarchical URL, as a Column expression.

    Steps (each standard, applied in order):
      1. scheme lowercased;
      2. authority lowercased, a leading ``www.`` folded away, and the
         scheme's default port (``:80`` http, ``:443`` https) stripped;
      3. path kept case-sensitive, trailing slashes stripped (the root
         path canonicalizes to empty);
      4. fragment dropped;
      5. query split on ``&``: empty pairs and tracking parameters
         (``utm_*``, fbclid/gclid/msclkid/ref) dropped, the remainder
         byte-sorted and rejoined (parameter order is not semantic for
         the overwhelming majority of endpoints; callers for whom it is
         can skip canonicalization for those hosts).

    A string that does not look like scheme://... is returned unchanged
    (regexp_extract misses -> empty scheme -> pass-through), so the
    expression is total and never raises on dirty crawl data.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(
        scheme == "https", F.regexp_replace(auth, r":443$", "")
    ).when(
        scheme == "http", F.regexp_replace(auth, r":80$", "")
    ).otherwise(auth)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    # strip the fragment BEFORE extracting the query, so a '?' that
    # first appears inside the fragment is never taken for one
    rawq = F.regexp_extract(F.regexp_replace(u, r"#.*$", ""), _QUERY_RE, 1)
    key = lambda p: F.split_part(p, F.lit("="), F.lit(1))  # noqa: E731
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "")
        & ~key(p).startswith(TRACKING_PARAM_PREFIX)
        & ~key(p).isin(*TRACKING_PARAMS),
    )
    q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str | None = None
) -> DataFrame:
    """Keep one row per canonical URL (the row with the minimum id when
    ``id_col`` is given — ids must be unique; an arbitrary-but-
    deterministic-per-shuffle one otherwise via dropDuplicates).

    Scale shape of the min-id variant: the window runs over a NARROW
    (id, canonical_url) projection and only the VICTIM ids (every row
    but the min-id keeper) feed an anti-join back — so the document
    payload (text/html, the wide columns) never enters an exchange.
    Victims are the duplicate minority, so AQE turns the anti-join into
    a broadcast at typical crawl dup rates; the worst case (massive
    duplication) degrades to the id-keyed shuffle the old full-row
    window always paid. Costs one extra consumption of ``df`` (the
    narrow branch) — callers composing long lazy chains should persist
    upstream (curation.curate_corpus does).

    Rows with a NULL url pass through undeduped: their canonical form
    is NULL too, and grouping them would silently collapse every
    url-less document in the batch into one survivor."""
    from pyspark.sql.window import Window

    out = df.withColumn("canonical_url", canonical_url(url_col))
    if id_col is None:
        # one pass, not a null/non-null union (which would consume the
        # full wide df twice): null-url rows get a per-row-unique dedup
        # key, so each survives; the representative per canonical key is
        # arbitrary-but-deterministic-per-shuffle either way
        return (
            out.withColumn(
                "_dk",
                F.coalesce(
                    F.col("canonical_url"),
                    F.concat(
                        F.lit("\x00null\x00"),
                        F.monotonically_increasing_id().cast("string"),
                    ),
                ),
            )
            .dropDuplicates(["_dk"])
            .drop("_dk")
        )
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    victims = (
        out.select(id_col, "canonical_url")
        .where(F.col("canonical_url").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(id_col)
    )
    return out.join(victims, id_col, "left_anti")
