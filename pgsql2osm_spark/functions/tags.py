"""Tag-map merge semantics — the reference's hstore/jsonb handling, Spark-side.

Reproduces the quirk set catalogued in SURVEY.md §5.5 with built-in map
functions only (no UDFs):

* right-biased merge: ``{**col_tags, **tags}`` — middle-table tags win
  (/root/reference/pgsql2osm/pgsql2osm.py:525, 680-681).
* NULL elision: the reference's row reader drops NULL values before they can
  become tags (dbutils.py:59) — ``map_filter`` on value is-not-null.
* relation column-tag quirk: ``rel_to_xml`` iterates ``tags`` twice, so
  column-derived tags are NEVER emitted for relations (pgsql2osm.py:473-474),
  unlike ways/nodes (648-651, 736-740). Behind ``strict_reference_parity``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def elide_nulls(m: Column) -> Column:
    """Drop entries whose value is NULL — 'column absent' ≡ 'NULL'."""
    return F.map_filter(m, lambda k, v: v.isNotNull())


def merge_tags(col_tags: Column, tags: Column) -> Column:
    """Right-biased merge, NULLs elided first: later map wins on key clash,
    exactly ``{**col_tags, **tags}``. Both inputs may be NULL."""
    left = F.coalesce(elide_nulls(col_tags), F.expr("map()"))
    right = F.coalesce(elide_nulls(tags), F.expr("map()"))
    # map_concat in Spark 3+ with spark.sql.mapKeyDedupPolicy=LAST_WIN would
    # also work, but building via map_filter keeps the policy explicit and
    # session-config-independent: keep left entries not overridden, concat right.
    kept_left = F.map_filter(left, lambda k, v: ~F.array_contains(F.map_keys(right), k))
    return F.map_concat(kept_left, right)


def entity_tags(
    kind: Column, col_tags: Column, tags: Column, strict_reference_parity: bool = False
) -> Column:
    """Final emitted tag map per entity. With strict parity on, relations drop
    their column-derived tags entirely (the reference's rel_to_xml bug —
    pgsql2osm.py:473-474 iterates `tags` twice)."""
    merged = merge_tags(col_tags, tags)
    if not strict_reference_parity:
        return merged
    rel_only = F.coalesce(elide_nulls(tags), F.expr("cast(map() as map<string,string>)"))
    return F.when(kind == F.lit("R"), rel_only).otherwise(merged)
