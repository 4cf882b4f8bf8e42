"""URL canonicalization — the crawl-dedup key, computed entirely JVM-side.

Before a crawl corpus can be deduplicated or re-fetched, URLs that name
the same resource must collapse to one key: scheme/host case, default
ports, dot-segments, duplicate slashes, fragment and query-parameter
order all vary freely across sitemaps, redirects and link extractors.
``canonicalize_url`` implements the standard normalization subset of
RFC 3986 §6 as a SINGLE Catalyst column expression — regexp part
extraction, a higher-order ``aggregate`` fold for dot-segment removal
(``.`` skipped, ``..`` pops, empty segments collapsed), ``array_sort``
for query-parameter order — so the hot path is whole-stage codegen with
zero Python and zero shuffles; the dedup itself is then one hash
aggregation on the canonical string.

Normalization choices (documented, deterministic):
- scheme and host lowercase; default ports (:80 http, :443 https)
  stripped; fragments dropped.
- path dot-segments resolved; empty segments (``//``) collapsed; the
  result always starts with ``/``; a trailing slash is NOT preserved
  (``/a/b/`` == ``/a/b`` for dedup purposes).
- query parameters sorted bytewise; empty params dropped; an empty
  query drops its ``?``.
- inputs without a ``scheme://`` prefix are returned unchanged
  (relative URLs have no canonical absolute form without a base).

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no crawl path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """RFC 3986 §6 normalization subset as one codegen-friendly column
    expression (see module docstring for the exact choices)."""
    u = F.regexp_replace(url, "#.*$", "")  # drop fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    # dot-segment removal as a stack fold: '.' and '' skipped, '..' pops
    folded = F.aggregate(
        F.split(path, "/"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: (
            F.when((s == "") | (s == "."), acc)
            .when(
                s == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    canon_path = F.concat(F.lit("/"), F.array_join(folded, "/"))
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        canon_path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )
    return F.when(scheme == "", url).otherwise(rebuilt)
