"""Benchmark job: headline throughput + per-query timings.

Headline metric (BASELINE.json): images/sec through H3-encode + PIP-join +
tile-assign over the synthetic image+caption point table, measured at two
parallelism levels (local[N] and local[4N] standing in for N and 4N
executors — no real cluster in this sandbox) with scaling efficiency
throughput@4N / (4 x throughput@N). Results go to stdout as ONE JSON line
and to BENCH/BASELINE.md.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir for the query suite (default sf0.1)
  SPARK_GRAFT_CPUS     cores for the full-suite session (default 32)
  SPARK_GRAFT_BENCH_N  headline pipeline row count (default 500,000,000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "500000000"))
# Scaling pair: this sandbox carries a persistent ~7-core external load
# (loadavg ~7 with no local processes), so parallelism levels above ~24
# threads contend with it and corrupt the scaling signal. N=4 vs 4N=16
# stays below the contention ceiling while still exercising 4x parallelism.
SCALE_LO = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
SCALE_HI = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))

# headline pipeline resolutions (north rule: H3 res 7-11)
RES_SET = (7, 8, 9, 10, 11)


def headline_pipeline(spark, n_rows: int, n_parts: int):
    """H3-encode (res 7-11, JVM) + two-stage PIP join + tile-assign (z12) +
    per-(region, tile) aggregation — the flagship dataflow end to end."""
    from pgsql2osm_spark.functions import cells as C
    from pgsql2osm_spark.functions import geometry as G
    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    pts = FX.points_jvm_df(spark, n_rows, parts=n_parts)
    pts, h3_names = C.with_cell_columns(pts, "lon", "lat", RES_SET)
    regions = FX.gen_admin_polygons(12)
    joined = SJ.pip_join(
        spark,
        pts,
        regions,
        keep_cols=["image_id", "lon", "lat", "h3_7"],
        cell_cols=dict(zip(RES_SET, h3_names)),
    )
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 12)
    tiles = joined.withColumn("tx", x).withColumn("ty", y)
    return tiles.groupBy("region_id", "tx", "ty").agg(F.count(F.lit(1)).alias("n"))


def _one_headline_session(master_cores: int, n_rows: int, trials: int) -> float:
    from pgsql2osm_spark.session import get_spark

    spark = get_spark(
        app=f"bench_headline_{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=max(master_cores * 2, 8),
        # tmpfs shuffle dir: measured multi-second fs contention on the
        # (shared) sandbox disk polluted the scaling signal
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JIT/codegen + python workers + the broadcast path
    headline_pipeline(spark, 50_000, master_cores).count()
    best = float("inf")
    for _ in range(trials):
        # chunky tasks: per-task Python-runner overhead dominates small
        # tasks, so partition count tracks cores, not a multiple of them
        out = headline_pipeline(spark, n_rows, master_cores)
        t0 = time.perf_counter()
        out.count()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def run_scaling_pair(lo_cores: int, hi_cores: int, n_rows: int, rounds: int = 2) -> tuple[dict, dict]:
    """Interleave lo/hi measurement sessions (A/B/A/B...) so both parallelism
    levels sample the same external-load profile — the sandbox's background
    load drifts on a minutes timescale, and measuring lo entirely before hi
    was observed to swing the efficiency ratio 0.66..0.87."""
    best = {lo_cores: float("inf"), hi_cores: float("inf")}
    for _ in range(rounds):
        for cores in (lo_cores, hi_cores):
            best[cores] = min(best[cores], _one_headline_session(cores, n_rows, trials=2))
    mk = lambda cores: {
        "cores": cores,
        "rows": n_rows,
        "sec": best[cores],
        "images_per_sec": n_rows / best[cores],
    }
    return mk(lo_cores), mk(hi_cores)


def run_query_suite(sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E
    from pgsql2osm_spark.session import get_spark

    spark = get_spark(app="bench_suite", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:
            print(f"bench: query {name} failed: {ex}", file=sys.stderr)
            timings[name] = -1.0
    spark.stop()
    return timings


def main():
    lo_cores = SCALE_LO
    res_lo, res_hi = run_scaling_pair(lo_cores, SCALE_HI, BENCH_N)
    efficiency = res_hi["images_per_sec"] / (4.0 * res_lo["images_per_sec"])
    queries = run_query_suite(SF_DIR)

    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH — measured results

Headline: images/sec through H3-encode (res 7-11, JVM bit math) + two-stage
broadcast PIP join (12 nested regions) + tile-assign (z12) + per-tile agg,
on {BENCH_N:,} synthetic skewed points (FIXTURES.md), same input at both
parallelism levels (sandbox stand-in for N vs 4N executors; best over 2 interleaved A/B rounds x 2 trials
per level). Pair local[{lo_cores}]/local[{SCALE_HI}] chosen because
this sandbox carries a persistent ~7-core external background load
(loadavg ~7 with no local processes) that corrupts measurements above ~24
threads — see bench.py SCALE_LO/SCALE_HI.

| parallelism | wall sec | images/sec |
|---|---|---|
| local[{lo_cores}] (N) | {res_lo['sec']:.2f} | {res_lo['images_per_sec']:,.0f} |
| local[{SCALE_HI}] (4N) | {res_hi['sec']:.2f} | {res_hi['images_per_sec']:,.0f} |

**Scaling efficiency** = throughput@4N / (4 x throughput@N) =
**{efficiency:.3f}** (target >= 0.8).

Reference single-node baseline (BASELINE.md): ~4.2-6.7 K elements/s.
This engine at local[{SCALE_HI}]: {res_hi['images_per_sec']:,.0f} images/s
({res_hi['images_per_sec']/6700:.0f}x the reference's best rate).

Per-query wall seconds at {SF_DIR} (noop sink, local[{CPUS}]): see BENCH_r*.json.
"""
        )
    result = {
        "metric": "headline_h3_pip_tile_wall_sec_at_4N",  # value is SECONDS per the
        # driver contract (unit: sec); throughput lives in images_per_sec_{lo,hi}
        "value": round(res_hi["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows": BENCH_N,
        "images_per_sec_hi": round(res_hi["images_per_sec"], 1),
        "images_per_sec_lo": round(res_lo["images_per_sec"], 1),
        "cores_hi": SCALE_HI,
        "cores_lo": lo_cores,
        "suite_cores": CPUS,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
