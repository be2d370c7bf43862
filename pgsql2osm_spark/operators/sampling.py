"""Deterministic sampling for training-data pipelines.

Training mixes need reproducible subsets: the same corpus + the same config
must yield the same sample on every run, every cluster size, every partition
layout (SURVEY.md O1's determinism contract applied to sampling — Spark's
df.sample() is seed-stable only per partitioning, which a 10^12-row pipeline
cannot pin). Both operators therefore derive per-row pseudo-randomness from
an ARITHMETIC hash of the row id (the same multiplicative-mod scheme as the
derived test points) — pure Column math, whole-stage codegen, replicable in
any SQL engine for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MULT = 2654435761  # Knuth multiplicative hash constant (public)
_MOD = 4294967296
_LO = 65536  # 2^16 split for overflow-free modular multiply


def hash_col(id_col) -> F.Column:
    """Deterministic u32 hash of an integer id — identical arithmetic is
    expressible in DuckDB SQL (see hash_sql).

    Overflow-safe under Spark 4 ANSI at ANY long id: a naive id*MULT
    overflows signed 64-bit for ids above ~3.46e9 (ANSI throws — exactly
    the 10^12-row regime these operators target), so the multiply runs on
    the 16-bit split of id mod 2^32: every intermediate stays below 2^49.
    pmod also normalizes negative ids. For non-negative ids < 2^32 the
    bits equal the naive (id*MULT) % 2^32."""
    a = F.pmod(F.col(id_col), F.lit(_MOD))
    a_hi = F.expr(f"pmod({id_col}, {_MOD}) DIV {_LO}")
    a_lo = a % F.lit(_LO)
    return (
        (a_lo * F.lit(_MULT)) % F.lit(_MOD)
        + ((a_hi * F.lit(_MULT)) % F.lit(_LO)) * F.lit(_LO)
    ) % F.lit(_MOD)


def hash_sql(id_expr: str) -> str:
    """DuckDB SQL replicating hash_col bit-for-bit (same split multiply;
    DuckDB's % keeps the dividend sign, so negatives normalize explicitly)."""
    a = f"((({id_expr}) % {_MOD} + {_MOD}) % {_MOD})"
    return (
        f"((({a} % {_LO}) * {_MULT}) % {_MOD} "
        f"+ (({a} // {_LO}) * {_MULT} % {_LO}) * {_LO}) % {_MOD}"
    )


def stratified_sample_n(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum (fewer if the stratum is smaller), chosen
    by hash rank with id tie-break — one window shuffle keyed by stratum.
    Strata are typically low-cardinality (lang, label, source); skewed
    stratum SIZES are fine (the window sorts within strata), but if a single
    stratum dominates the corpus, pre-filter with proportional_sample to cut
    the sort volume."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_col(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def proportional_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows by hash threshold — a pure narrow filter (no
    shuffle, no state), the scale path for downsampling before expensive
    stages. Deterministic: the same id is always in or out."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(hash_col(id_col) < F.lit(int(fraction * _MOD)))
