"""Skew handling: salted repartition + adaptive cell splitting (SURVEY.md X1).

Dense metro cells concentrate a huge share of rows on a few cell keys. Two
explicit mitigations, both plain DataFrame rewrites (no Catalyst rules),
layered on top of AQE's runtime skew-join splitting:

WHEN TO USE (measured, BENCH/PLANS.md): only for holistic aggregations
(exact median/percentile, collect_list) and skewed shuffle joins — measured
1.46x on a holistic agg. Algebraic aggregations (count/sum/avg/stddev) are
already neutralized by map-side partial aggregation; splitting them is pure
overhead (measured 2x SLOWER). Let AQE handle join skew first.

* ``salted_repartition`` — repartition on (cell, salt) so one hot cell
  spreads across ``n_salts`` partitions. Joins against per-cell dimensions
  replicate the dimension across salts (classic salt-and-replicate).
* ``split_hot_cells`` — re-encode rows in cells whose measured count exceeds
  a threshold at res+1 (finer cells), the data-dependent analogue of the
  reference's adaptive chunk shrink on timeout
  (/root/reference/pgsql2osm/pgsql2osm.py:106-119).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def salted_repartition(df: DataFrame, cell_col: str, n_salts: int = 8, n_parts: int | None = None) -> DataFrame:
    """Spread hot cell keys over n_salts synthetic subkeys before a shuffle.

    The salt is derived from a stable hash of the row (not rand()) so the
    plan stays deterministic and re-runnable for checkpoint resume."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    if n_parts:
        return salted.repartition(n_parts, F.col(cell_col), F.col("_salt"))
    return salted.repartition(F.col(cell_col), F.col("_salt"))


def replicate_dim_for_salt(dim: DataFrame, n_salts: int = 8) -> DataFrame:
    """Replicate the dimension side across all salt values so a salted
    equi-join on (key, _salt) stays correct."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    return dim.select("*", salts)


def measure_cell_counts(df: DataFrame, cell_col: str) -> DataFrame:
    """Cheap groupBy(cell).count() — the probe that drives adaptive decisions
    (the Spark analogue of the reference's statement_timeout='1s' probe)."""
    return df.groupBy(cell_col).count()


def split_hot_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_col: str = "cell",
    res: int = 7,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Adaptive cell splitting: rows in cells with count > hot_threshold get
    a finer (res+1) cell id in ``cell_split``; cold rows keep the res id.
    Downstream partitioning on ``cell_split`` then bounds per-key volume.

    One extra shuffle-free pass (the hot set is a broadcast semi-join); the
    count probe itself is one cheap aggregation over the cell column.
    """
    counts = measure_cell_counts(df, cell_col)
    hot = counts.where(F.col("count") > hot_threshold).select(cell_col)
    fine = C.cell_expr(F.col(lon), F.col(lat), res + 1)
    hot_marked = df.join(F.broadcast(hot), cell_col, "left_semi").withColumn("cell_split", fine)
    cold = df.join(F.broadcast(hot), cell_col, "left_anti").withColumn(
        "cell_split", F.col(cell_col)
    )
    return hot_marked.unionByName(cold)
