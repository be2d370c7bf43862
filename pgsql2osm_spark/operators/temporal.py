"""As-of and range joins — custom operators Spark's built-ins lack.

Both reuse the engine's core two-stage pattern (cheap bucket-key equi-join
for candidates, exact predicate after — the same shape as the spatial
cover-then-refine join, SURVEY.md X2), so neither degenerates into a
cartesian theta join at scale.

* ``asof_join``   — for each probe row, the latest build row with
  build.ts <= probe.ts within the same key (the time-series point lookup;
  DuckDB expresses it natively as ASOF JOIN, which is the test oracle).
  Implemented with the union+window trick: one shuffle, no per-row search.
* ``range_join``  — probe value within [lo, hi] intervals: intervals explode
  to fixed-step buckets, probes compute one bucket key, equi-join then exact
  BETWEEN filter. Candidate volume ~ interval_width/step per probe instead
  of |probe| x |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    build_cols: list[str],
    probe_id: str,
) -> DataFrame:
    """For each probe row: columns of the latest build row at-or-before its
    time, NULL when none exists (left as-of semantics).

    One union + one window sort per key — the standard distributed as-of
    shape; both inputs shuffle once on ``key``.
    """
    pid_type = probe.schema[probe_id].dataType
    # the matched build ROW travels as one struct: per-column last(ignorenulls)
    # would stitch values from DIFFERENT build rows whenever the latest row
    # has a NULL column (a row that never existed); a struct is non-null as a
    # whole for build rows, so last(ignorenulls) picks one real row
    b = build.select(
        F.col(key),
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(pid_type).alias("_pid"),
        F.struct(F.col(time_col).alias("asof_ts"), *[F.col(c) for c in build_cols]).alias("_row"),
    )
    p = probe.select(
        F.col(key),
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.col(probe_id).alias("_pid"),
        F.lit(None).cast(b.schema["_row"].dataType).alias("_row"),
    )
    u = b.unionByName(p)
    # build rows sort before probe rows at equal timestamps (_side 0 < 1), so
    # a same-instant build row IS visible to the probe (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_row", ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).select(
        F.col("_pid").alias(probe_id),
        F.col(key),
        F.col("_t").alias(time_col),
        F.col("_m.asof_ts").alias("asof_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in build_cols],
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 1.0,
) -> DataFrame:
    """Inner join of probe rows to every interval containing their value.

    Buckets of width ``step``: each interval explodes to ceil(width/step)+1
    bucket keys, each probe computes one key, the equi-join meets only
    same-bucket pairs, an exact BETWEEN keeps true containment. Pick ``step``
    near the median interval width: candidates ~ O(width/step) per probe.
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / step).cast("long"),
                F.floor(F.col(hi_col) / step).cast("long"),
            )
        ),
    )
    pr = probe.withColumn("_bucket", F.floor(F.col(value_col) / step).cast("long"))
    return (
        pr.join(iv, "_bucket", "inner")
        .where(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )
