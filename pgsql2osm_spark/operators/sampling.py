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
    thr = domain_thresholds(counts, domain_col, weights_permille, total_target)
    return (
        df.join(F.broadcast(thr), domain_col, "inner")
        .where(hash_col(id_col) < F.col("_thr"))
        .drop("_thr")
    )


def domain_thresholds(
    counts: DataFrame,
    domain_col: str,
    weights_permille: dict[str, int],
    total_target: int,
) -> DataFrame:
    """(domain, _nd row count) -> (domain, _thr) keep-threshold table.

    _thr = floor(2^32 * min(n_target, n_d) / n_d), computed EXACTLY with
    overflow-safe base-2^16 long division (Spark 4 ANSI throws on int64
    overflow, and the naive 2^32 * _nt intermediate overflows once a
    domain's target rows exceed ~2.1e9 — precisely the 10^12-row regime
    this module targets). With _nt clamped to _nd first, _nt * 2^16 stays
    below 2^63 for any _nd < 2^47 (~1.4e14 rows per domain, the documented
    input bound), and

        floor(2^32*nt/nd) = q1*2^16 + floor((r1*2^16)/nd),
        q1 = (nt*2^16) div nd, r1 = (nt*2^16) mod nd

    is exact (q1 <= 2^16 since nt <= nd). Factored out of mixture_sample so
    the arithmetic is unit-testable at planet-scale counts without
    materializing the rows; mirrored limb-for-limb in mixture_sample_sql."""
    wmap = F.create_map(
        *[x for k, v in sorted(weights_permille.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    return (
        counts.withColumn("_w", wmap[F.col(domain_col)])
        .where(F.col("_w").isNotNull())
        .withColumn(
            "_nt",
            F.expr(f"least(CAST({total_target} AS BIGINT) * _w DIV 1000, _nd)"),
        )
        .withColumn("_q1", F.expr(f"(_nt * {_LO}) DIV _nd"))
        .withColumn("_r1", F.expr(f"(_nt * {_LO}) % _nd"))
        .withColumn("_thr", F.expr(f"_q1 * {_LO} + (_r1 * {_LO}) DIV _nd"))
        .select(domain_col, "_thr")
    )


def mixture_sample_sql(
    domain_expr: str,
    id_col: str,
    weights_permille: dict[str, int],
    total_target: int,
    source: str = "documents",
) -> str:
    """DuckDB oracle replicating mixture_sample bit-for-bit (same integer
    thresholds via the SAME overflow-safe base-2^16 long division as
    domain_thresholds — DuckDB BIGINT shares the 2^63 ceiling, so the naive
    2^32 * nt form would overflow there too; same hash)."""
    wcase = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(weights_permille.items())
    )
    return f"""
        WITH t AS (
          SELECT *, {domain_expr} AS _dom FROM {source}
        ), c AS (
          SELECT _dom, CAST(count(*) AS BIGINT) AS _nd,
                 CASE _dom {wcase} ELSE NULL END AS _w
          FROM t GROUP BY _dom
        ), nt AS (
          SELECT _dom, _nd,
                 least(CAST({total_target} AS BIGINT) * _w // 1000, _nd) AS _nt
          FROM c WHERE _w IS NOT NULL
        ), thr AS (
          SELECT _dom,
                 ((_nt * {_LO}) // _nd) * {_LO}
                 + (((_nt * {_LO}) % _nd) * {_LO}) // _nd AS _thr
          FROM nt
        )
        SELECT t.{id_col}, t._dom AS domain
        FROM t JOIN thr USING (_dom)
        WHERE {hash_sql(f"t.{id_col}")} < _thr
        ORDER BY {id_col}
    """
