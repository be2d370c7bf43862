"""Presentation-sort helper for driver-bounded result sets.

Every registry query ends with a total-order sort so the driver's
correctness gate sees deterministic rows. A plain ``df.orderBy(...)``
plans an ``Exchange rangepartitioning``, and building a RangePartitioner
costs a SEPARATE sampling job that re-executes the child plan: every
narrow operator between the last shuffle (or the scan, when the lineage
is shuffle-free) and the sort runs TWICE — measured 2-8x wall on
UDF/broadcast-heavy queries (audio_features 4.6s -> 0.5s, doc_features
2.4s -> 0.5s cold; BENCH/PLANS.md r6). Shuffle map stages below the sort
are reused across the two jobs, so the penalty is exactly the
post-exchange narrow chain — which for most registry queries is the whole
query.

``presentation_sort`` keeps the identical total order (same sort keys)
without the sampling pass: one round-robin shuffle into a single
partition + an in-partition sort. The upstream lineage stays fully
parallel and runs ONCE; only the final sort of the RESULT rows is serial.

Scale rationale: this is for result sets that are by contract collected
to the driver (the correctness gate does ``toPandas()`` on every one), so
they are driver-memory-bounded no matter the input scale — a
single-partition sort of a driver-bounded set is O(result), not O(input).
For genuinely large distributed outputs keep ``orderBy`` (range sort) and
pay the sampling pass, or cut it with a lazy ``localCheckpoint`` below
the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def presentation_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order ``df`` by ``cols`` for a driver-bounded result set.

    Equivalent rows and ordering to ``df.orderBy(*cols)`` (same keys, ties
    unordered in both), but planned as repartition(1) + in-partition sort:
    no RangePartitioner sampling job, so the lineage below executes once.
    """
    return df.repartition(1).sortWithinPartitions(*cols)
