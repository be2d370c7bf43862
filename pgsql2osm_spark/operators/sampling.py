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


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights_permille: dict[str, int],
    total_target: int,
) -> DataFrame:
    """Deterministic domain-mixture sampling — the data-MIXING stage of a
    training pipeline: downsample each domain so the output approximates
    ``total_target`` rows distributed per ``weights_permille`` (integer
    thousandths; domains absent from the dict are dropped).

    Per domain d: n_target_d = total_target * w_d // 1000 and the keep rule
    is hash(id) < 2^32 * n_target_d // n_d (capped at 2^32 — an
    under-represented domain keeps everything rather than oversampling;
    upsampling/repetition is a loader concern, not a corpus transform).
    ALL math is integer (hash threshold semantics identical in DuckDB — see
    mixture_sample_sql), so the sample is bit-reproducible on any engine,
    cluster size, or partition layout.

    Scale shape: one small groupBy for the per-domain counts (map-side
    combined; domain cardinality is tiny), broadcast back onto the corpus,
    then a pure narrow hash filter — the fact table never shuffles. Counts
    are approximate per domain (hash thresholding, like proportional_sample)
    but unbiased; exact-n mixes go through stratified_sample_n at the cost
    of a window shuffle."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_nd"))
    wmap = F.create_map(
        *[x for k, v in sorted(weights_permille.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    # build _nt (per-domain target rows) first, then the integer threshold —
    # expression split keeps the arithmetic readable and the tree linear
    thr = (
        counts.withColumn("_w", wmap[F.col(domain_col)])
        .where(F.col("_w").isNotNull())
        .withColumn("_nt", F.expr(f"CAST({total_target} AS BIGINT) * _w DIV 1000"))
        .withColumn("_thr", F.least(F.lit(_MOD).cast("long"),
                                    F.expr(f"CAST({_MOD} AS BIGINT) * _nt DIV _nd")))
        .select(domain_col, "_thr")
    )
    return (
        df.join(F.broadcast(thr), domain_col, "inner")
        .where(hash_col(id_col) < F.col("_thr"))
        .drop("_thr")
    )


def mixture_sample_sql(
    domain_expr: str,
    id_col: str,
    weights_permille: dict[str, int],
    total_target: int,
    source: str = "documents",
) -> str:
    """DuckDB oracle replicating mixture_sample bit-for-bit (same integer
    thresholds, same hash)."""
    wcase = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(weights_permille.items())
    )
    return f"""
        WITH t AS (
          SELECT *, {domain_expr} AS _dom FROM {source}
        ), c AS (
          SELECT _dom, count(*) AS _nd,
                 CASE _dom {wcase} ELSE NULL END AS _w
          FROM t GROUP BY _dom
        ), thr AS (
          SELECT _dom,
                 least(CAST({_MOD} AS BIGINT),
                       CAST({_MOD} AS BIGINT) * (CAST({total_target} AS BIGINT) * _w // 1000) // _nd
                 ) AS _thr
          FROM c WHERE _w IS NOT NULL
        )
        SELECT t.{id_col}, t._dom AS domain
        FROM t JOIN thr USING (_dom)
        WHERE {hash_sql(f"t.{id_col}")} < _thr
        ORDER BY {id_col}
    """
