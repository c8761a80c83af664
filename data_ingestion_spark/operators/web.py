"""Web-corpus URL operators: canonicalization and URL-key dedup.

URL dedup is the cheapest, highest-precision first pass of every web-scale
training-data pipeline (CCNet, RefinedWeb, FineWeb all dedup on a normalized
URL key before any content hashing): two crawls of the same page differ in
scheme case, ``www.``, default ports, parameter order, tracking parameters
and fragments, so the raw URL string under-deduplicates badly.

``canonicalize_url`` is a pure Column expression — a chain of JVM-side
regex/array primitives, zero shuffles, fully whole-stage-codegen — with an
exactly-equivalent DuckDB formulation (registry2.URL_DEDUP_DOCS_SQL), which
is what makes the operator oracle-checkable. The dedup itself is then one
hash aggregation on the canonical key: at 100 TB that is a single shuffle of
(key, id) pairs, never of document payloads.

Canonical form (a DEDUP KEY, not a fetchable URL — hence whole-string
lowercasing, the standard trade in dedup pipelines):

1. lowercase + trim;
2. drop the fragment (``#...``);
3. drop the scheme (``http://`` / ``https://`` — the two are one page);
4. drop a leading ``www.``;
5. drop an explicit default port (``:80`` / ``:443``) at the authority end;
6. split off the query string; drop tracking parameters
   (``utm_*``, ``fbclid``, ``gclid``, ``ref``) and empties;
7. SORT the surviving parameters (order never identifies a resource);
8. strip trailing slashes from the path;
9. re-attach ``?`` + sorted params if any survive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never identify content (tracking/attribution).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|ref)="


def canonicalize_url(col: Column | str) -> Column:
    """Canonical dedup key for a URL column (see module docstring)."""
    u = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    u = F.regexp_replace(u, r"^https?://", "")    # scheme
    u = F.regexp_replace(u, r"^www\.", "")        # www
    # default port at the end of the authority (before path/query/end);
    # capture groups, not lookahead — RE2 (the oracle's engine) has no
    # lookahead, and the canonical form must be replayable there
    u = F.regexp_replace(u, r"^([^/?:]+):(?:80|443)([/?]|$)", r"$1$2")
    path = F.regexp_replace(F.regexp_replace(u, r"\?.*$", ""), r"/+$", "")
    qs = F.when(u.contains("?"), F.regexp_replace(u, r"^[^?]*\?", "")).otherwise(
        F.lit("")
    )
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(params) > 0,
        F.concat(path, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(path)
