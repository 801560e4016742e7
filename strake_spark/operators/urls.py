"""URL canonicalization — the CommonCrawl-style dedup key.

Reference context: the reference has no URL toolkit (its curation
surface is result-set scrubbing, README.md:29); this operator family is
part of the training-data-pipeline extension the brief calls for. A
web-corpus dedup keyed on raw URLs misses the bulk of duplicates —
scheme flips, host case, trailing slashes, tracking params, and
fragments all produce distinct strings for one resource.

``canonicalize_url`` is a pure column expression (parse_url + filter/
array_sort/array_join, all JVM built-ins, whole-stage-codegen'd): at
100 TB it is a map-only pass, and the dedup it feeds shuffles once on
the canonical key (see the ``pipeline_url_canonical_dedup`` inventory
entry and its plan-shape test).

Canonical form (idempotent — pinned by tests/test_url_canonical.py):
  scheme  -> https
  host    -> lowercased; explicit port preserved UNLESS it is a scheme
             default (80/443 — the canonical scheme is https and an
             explicit default port names the same resource), because
             parse_url HOST alone would collapse site:8080 with
             site:9090
  path    -> trailing slash stripped
  query   -> utm_* params and empties dropped, survivors sorted
  fragment-> dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(col: Column | str) -> Column:
    """Normalize a URL column to its canonical DEDUP KEY — a
    many-to-one reduction, deliberately lossier than a resolver:

    - scheme is normalized to https and ports 80/443 are dropped
      REGARDLESS of the original scheme, so 'http://h/x', 'https://h/x',
      'http://h:443/x' and 'https://h:80/x' all share one key (for
      dedup, scheme/default-port variants of one resource should
      collapse; a fidelity-preserving variant would drop the port only
      when it matches the ORIGINAL scheme's default);
    - userinfo ('user:pass@') is silently DISCARDED via HOST
      extraction — credentials never belong in a dedup key (nor in
      stored canonical forms);
    - utm_* query params are removed, remaining params sorted, trailing
      slashes stripped (fixpoint), host lowercased."""
    url = F.col(col) if isinstance(col, str) else col
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
            lambda x: (~x.startswith("utm_")) & (x != ""),
        )
    )
    q = F.array_join(params, "&")
    # AUTHORITY = [userinfo@]host[:port]; HOST drops the port, so pull
    # any explicit non-default port back into the canonical key
    authority = F.coalesce(F.try_parse_url(url, F.lit("AUTHORITY")), F.lit(""))
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    keep_port = (port != "") & (port != "80") & (port != "443")
    host = F.try_parse_url(url, F.lit("HOST"))
    canonical = F.concat(
        F.lit("https://"),
        F.lower(host),
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        # '/+$' (all trailing slashes), not '/$': stripping only one
        # would make '/a//' canonicalize to '/a/' — a non-fixpoint
        F.regexp_replace(F.try_parse_url(url, F.lit("PATH")), "/+$", ""),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(""),
    )
    # try_parse_url (parse_url throws under ANSI on invalid input)
    # yields NULL host for undecomposable URLs — those must NOT
    # collapse into one NULL dedup group with every other malformed
    # input — pass it through verbatim as its own key
    return F.when(host.isNull(), url).otherwise(canonical)
