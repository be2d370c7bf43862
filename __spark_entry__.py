"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 (or a
training-data-pipeline operator), run against /root/testdata parquet; each
``oracle_sql()`` entry is the exact-equivalent DuckDB SQL. Spatial queries
derive deterministic lon/lat from integer keys with pure arithmetic so the
SQL oracle reproduces the same doubles bit-for-bit; engine-only spatial paths
(multi-res cover, ring kNN, image decode) are registered rows-only and get
their exact checks from tests/ golden oracles instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# self-locating: the engine package lives beside this file; the driver may
# import this module from any cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsql2osm_spark.functions import cells as C
from pgsql2osm_spark.functions import geometry as G

# ---------------------------------------------------------------------------
# Deterministic derived points (identical arithmetic in Spark and DuckDB).
# ---------------------------------------------------------------------------

_M1 = 2654435761
_M2 = 1566083941
_MOD = 4294967296


def _lon_col(key):
    return ((key * _M1) % _MOD) / float(_MOD) * 360.0 - 180.0


def _lat_col(key):
    return ((key * _M2 + 12345) % _MOD) / float(_MOD) * 170.0 - 85.0


def _lon_sql(key: str) -> str:
    return f"((({key} * {_M1}) % {_MOD}) / {_MOD}.0 * 360.0 - 180.0)"


def _lat_sql(key: str) -> str:
    return f"((({key} * {_M2} + 12345) % {_MOD}) / {_MOD}.0 * 170.0 - 85.0)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    return c.select(
        k.alias("id"), _lon_col(k).alias("lon"), _lat_col(k).alias("lat")
    )


_POINTS_SQL = (
    f"SELECT c_custkey AS id, {_lon_sql('c_custkey')} AS lon, "
    f"{_lat_sql('c_custkey')} AS lat FROM customer"
)

# Convex hexagon for the SQL-checkable PIP query (CCW vertices).
_HEX = [
    (35.0, 20.0),
    (22.5, 41.65),
    (-2.5, 41.65),
    (-15.0, 20.0),
    (-2.5, -1.65),
    (22.5, -1.65),
]


def _table(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def load(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    return load


# ---------------------------------------------------------------------------
# Query implementations.
# ---------------------------------------------------------------------------


def q_h3_encode(spark, sf_dir):
    """S1/F1: hierarchical cell encode at res 7 and 11 via the production
    shared-spread path (one Morton spread at res 26, shift-derived)."""
    p = _points(spark, sf_dir)
    out, names = C.with_cell_columns(p, "lon", "lat", [7, 11], names=["h3_7", "h3_11"])
    return out.select("id", *names)


def q_tile_assign(spark, sf_dir):
    """P2/J12: slippy z/x/y tile assignment at z=7 (JVM mercator math)."""
    p = _points(spark, sf_dir)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 7)
    return p.select("id", x.alias("tx"), y.alias("ty"))


def q_pip_convex(spark, sf_dir):
    """J1/X2: full two-stage PIP join against a convex hexagon boundary."""
    from pgsql2osm_spark.operators import spatial_join as SJ
    import numpy as np

    p = _points(spark, sf_dir)
    region = [{"region_id": 1, "rings": [np.asarray(_HEX, dtype=np.float64)]}]
    out = SJ.pip_join(spark, p, region, keep_cols=["id"])
    return out.select("id").orderBy("id")


def q_knn_planar(spark, sf_dir):
    """J11 (oracle-checkable flavor): exact k=3 NN by squared planar distance
    from 25 nation-derived query points to customer-derived points."""
    p = _points(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    q = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("query_id"),
            _lon_col((F.col("n_nationkey") + 1000).cast("long")).alias("qlon"),
            _lat_col((F.col("n_nationkey") + 1000).cast("long")).alias("qlat"),
        )
    )
    j = p.crossJoin(q).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (
            (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon"))
            + (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
        ).alias("d2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("neighbor_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def q_semi_join_parents(spark, sf_dir):
    """J2/J3: reverse membership — orders containing any seed part."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    seeds = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_partkey") % 97 == 0)
        .select(F.col("p_partkey").alias("id"))
    )
    edges = li.select(F.col("l_orderkey").alias("parent_id"), F.col("l_partkey").alias("ref"))
    return (
        edges.join(F.broadcast(seeds), edges["ref"] == seeds["id"], "left_semi")
        .select(F.col("parent_id").alias("id"))
        .distinct()
        .orderBy("id")
    )


def q_forward_expand(spark, sf_dir):
    """J5/J6: forward membership — distinct parts of seed orders."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_orderkey") % 199 == 0)
        .select(F.col("l_partkey").alias("id"))
        .distinct()
        .orderBy("id")
    )


def q_anti_join(spark, sf_dir):
    """J9/U2: customers with no orders (left-anti id subtraction)."""
    from pgsql2osm_spark.operators import closure as CL

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("id")
    )
    return CL.subtract_ids(c, o).orderBy("id")


def q_priority_cascade(spark, sf_dir):
    """J9 cascade: nation ids sourced first-wins from customer > supplier >
    nation (the polygon > line > middle table-priority semantics)."""
    from pgsql2osm_spark.operators import closure as CL

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_nationkey").cast("long").alias("id"), F.lit("customer").alias("src")
    ).distinct()
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_nationkey").cast("long").alias("id"), F.lit("supplier").alias("src")
    ).distinct()
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("id"), F.lit("nation").alias("src")
    ).distinct()
    return CL.priority_cascade([(c, 0), (s, 1), (n, 2)]).orderBy("id")


def q_union_distinct(spark, sf_dir):
    """U1: distinct union of part ids from two scans."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = li.where(F.col("l_quantity") >= 49.0).select(F.col("l_partkey").alias("id"))
    b = pt.where(F.col("p_size") >= 49).select(F.col("p_partkey").alias("id"))
    return a.unionByName(b).distinct().orderBy("id")


def q_grouped_counts(spark, sf_dir):
    """A1/A2/A5: grouped aggregation with exact-representable measures."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count_distinct("l_partkey").alias("n_parts"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_topk_customers(spark, sf_dir):
    """O2/A3: arg-max style top-10 customers by order count."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.groupBy(F.col("o_custkey").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("id"))
        .limit(10)
    )


def q_window_rank(spark, sf_dir):
    """§2.5: ranking window — first 3 orders per customer by key."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").asc())
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select(F.col("o_custkey").alias("id"), F.col("o_orderkey").alias("okey"), "rank")
        .orderBy("id", "rank")
    )


def q_rollup_counts(spark, sf_dir):
    """A-family extension: rollup counts region -> nation."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    j = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name", "n_name")
    )


def q_cube_counts(spark, sf_dir):
    """A-family extension: CUBE over (returnflag, linestatus) — all grouping
    sets with exact measures."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_events_hourly(spark, sf_dir):
    """A4/streaming-analogue: tumbling 1h buckets per event type (batch
    form of the windowed agg; string buckets are TZ-stable)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.col("event_type"),
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))
        .orderBy("event_type", "hour_bucket")
    )


def q_events_top_users(spark, sf_dir):
    """Top-3 users per event type by event count (window over agg)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .orderBy("event_type", "rank")
    )


def q_events_sessions(spark, sf_dir):
    """Sessionization: gap > 30 min starts a new session; per-user session
    counts + max session length (lag + cumulative-sum window pattern)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        # parquet reads as TIMESTAMP_NTZ; wall-clock seconds via
        # timestampdiff from the NTZ epoch — session-timezone-FREE, so the
        # result matches DuckDB's naive epoch() whatever TZ the driver's
        # session uses
        "tsec",
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("tsec").asc(), F.col("event_id").asc()
    )
    prev = F.lag("tsec").over(w_user)
    gapped = e.withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.col("tsec") - prev > 1800), 1).otherwise(0).cast("long"),
    )
    sess = gapped.withColumn("sess_id", F.sum("new_sess").over(w_user))
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def q_phash_near_dups(spark, sf_dir):
    """Image near-dup by perceptual hash on fixture images with a planted
    duplicate (prefix-bucket + exact hamming)."""
    from pgsql2osm_spark.operators import dedup as DD
    from pgsql2osm_spark.sources import fixtures as FX

    images = FX.images_df(spark, 128)
    dup = images.limit(4).withColumn("image_id", F.concat(F.lit("dup_"), F.col("image_id")))
    return DD.phash_near_dups(images.unionByName(dup), max_hamming=2).orderBy("id_a", "id_b")


def q_asof_join(spark, sf_dir):
    """As-of join (custom operator Spark lacks): for each order, the user's
    latest event at-or-before the order date — events as the build side
    keyed by user, orders as probes keyed by custkey%150."""
    from pgsql2osm_spark.operators import temporal as TP

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id"),
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").alias("tsec"),
        F.col("event_id"),
    )
    # dedup equal (user, tsec) build rows deterministically (max event_id)
    e = e.groupBy("user_id", "tsec").agg(F.max("event_id").alias("event_id"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("pid"),
        (F.col("o_custkey") % 150).cast("long").alias("user_id"),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
        ).alias("tsec"),
    )
    out = TP.asof_join(o, e, key="user_id", time_col="tsec",
                       build_cols=["event_id"], probe_id="pid")
    # no-match encoded as -1: NULL/NaN round-trips are hash-fragile across
    # engines; -1 is unambiguous (tsec and event_id are non-negative)
    return out.select(
        "pid",
        "user_id",
        F.coalesce("asof_ts", F.lit(-1)).alias("asof_ts"),
        F.coalesce("event_id", F.lit(-1)).alias("event_id"),
    ).orderBy("pid")


def q_range_join(spark, sf_dir):
    """Range join (custom operator Spark lacks): order totalprice within
    part-derived [lo, hi) price bands — bucketed two-stage, exact BETWEEN."""
    from pgsql2osm_spark.operators import temporal as TP

    p = spark.read.parquet(f"{sf_dir}/part.parquet").where(F.col("p_partkey") % 53 == 0)
    intervals = p.select(
        F.col("p_partkey").alias("iv_id"),
        (F.col("p_retailprice") * 100.0).alias("lo"),
        (F.col("p_retailprice") * 100.0 + 5000.0).alias("hi"),
    )
    probe = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("pid"), F.col("o_totalprice").alias("value")
    )
    out = TP.range_join(probe, intervals, value_col="value", step=2500.0)
    return out.select("pid", "iv_id").orderBy("pid", "iv_id")


def q_doc_tokens(spark, sf_dir):
    """Text analysis: token/stopword counts + md5 fingerprint (all JVM)."""
    from pgsql2osm_spark.operators import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        TX.token_count_col().cast("long").alias("n_tokens"),
        TX.stopword_count_col().cast("long").alias("n_stopwords"),
        TX.fingerprint_col().alias("fingerprint"),
    ).orderBy("doc_id")


def q_doc_quality(spark, sf_dir):
    from pgsql2osm_spark.operators import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TX.quality_features(d).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_stopwords", "n_punct", "quality_ok"
    ).orderBy("doc_id")


def q_doc_langid(spark, sf_dir):
    from pgsql2osm_spark.operators import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", TX.lang_id_col().alias("pred_lang")).orderBy("doc_id")


def q_lang_quality_agg(spark, sf_dir):
    from pgsql2osm_spark.operators import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = TX.quality_features(d)
    return (
        feats.groupBy("lang", "quality_ok")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("lang", "quality_ok")
    )


def q_exact_dedup(spark, sf_dir):
    """Dedup: exact (hash-groupBy) over normalized text."""
    from pgsql2osm_spark.operators import dedup as DD

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.exact_dedup(d).select("fingerprint", "doc_id", "dup_count").orderBy("doc_id")


def q_word_jaccard(spark, sf_dir):
    """Dedup verification: word-set Jaccard for deterministic pairs
    (doc i vs doc i+17, same-lang only)."""
    from pgsql2osm_spark.operators import dedup as DD

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("la"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"))
    pairs = a.join(b, (F.col("id_b") == F.col("id_a") + 17) & (F.col("la") == F.col("lb"))).select(
        "id_a", "id_b"
    )
    return DD.word_jaccard_pairs(d, pairs).orderBy("id_a")


def q_cosine_topk(spark, sf_dir):
    """Similarity search: exact brute-force cosine top-5 for 5 query vectors."""
    from pgsql2osm_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.cosine_topk_bruteforce(emb, queries, 5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


def q_ann_ivf(spark, sf_dir):
    """Similarity scale path: IVF inverted-list ANN (seeded codebook,
    n_probe lists, exact re-rank) — recall-tested vs brute force in
    tests/test_text_dedup_sim.py; rows-only here (approximate by design)."""
    from pgsql2osm_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.ivf_topk(spark, emb, queries, 5, dim=64, n_centroids=16, n_probe=6)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


def q_streaming_tiles(spark, sf_dir):
    """Structured Streaming path: bounded replay of the events-as-points
    stream through the watermarked tile aggregation (equals the batch agg —
    tests/test_streaming.py); rows-only here."""
    import tempfile

    import numpy as np
    import pandas as pd

    from pgsql2osm_spark.sources import fixtures as FX
    from pgsql2osm_spark.streaming import incremental as ST

    n = 4000
    lon, lat = FX.gen_points_slice(0, n)
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(np.arange(n) % 900, unit="s")
    work = tempfile.mkdtemp(prefix="stream_q_")
    spark.createDataFrame(
        pd.DataFrame({"ts": ts, "lon": lon, "lat": lat})
    ).repartition(4).write.mode("overwrite").parquet(f"{work}/src")
    out = ST.run_bounded_replay(spark, f"{work}/src", f"{work}/ckpt", "q_stream_tiles", z=9)
    return out.select(
        F.col("window.start").cast("string").alias("w_start"), "z", "x", "y", "h3", "n"
    ).orderBy("w_start", "x", "y")


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (LSH self-join + exact filter) with
    planted duplicate vectors."""
    from pgsql2osm_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dup = emb.limit(10).select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label")
    out = SIM.embedding_near_dups(emb.unionByName(dup), threshold=0.999, n_planes=10)
    return out.select("id_a", "id_b").orderBy("id_a", "id_b")


def q_embedding_label_centroid_rank(spark, sf_dir):
    """Grouped vector agg: per-label sizes + extremes (JVM array math)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = F.element_at("embedding", 1).cast("double")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(first).alias("min_e0"),
            F.max(first).alias("max_e0"),
        )
        .orderBy("label")
    )


# --- engine-only (rows-only check; exact oracles live in tests/) -----------


def q_pip_fixture_regions(spark, sf_dir):
    """Full spatial path on fixture images x nested fixture polygons
    (multi-res cover, holes, boundary refine) — golden-tested in
    tests/test_spatial_join.py; rows-only here."""
    import pandas as pd

    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    n = 20000
    lon, lat = FX.gen_points_slice(0, n)
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"img{i:012d}" for i in range(n)], "lon": lon, "lat": lat})
    )
    out = SJ.pip_join(spark, pts, FX.gen_admin_polygons(12), keep_cols=["image_id"])
    return out.groupBy("region_id").agg(F.count(F.lit(1)).alias("n")).orderBy("region_id")


def q_pip_partitioned_fixture(spark, sf_dir):
    """Shuffle-partitioned PIP fallback (unbroadcastable region sets) on the
    fixture points — exact-equal to the broadcast path per
    tests/test_spatial_join.py; rows-only here."""
    import pandas as pd

    from pgsql2osm_spark.operators import spatial_join as SJ
    from pgsql2osm_spark.sources import fixtures as FX

    n = 20000
    lon, lat = FX.gen_points_slice(0, n)
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"img{i:012d}" for i in range(n)], "lon": lon, "lat": lat})
    )
    rdf = SJ.regions_to_df(spark, FX.gen_admin_polygons(12))
    out = SJ.pip_join_partitioned(spark, pts, rdf, keep_cols=["image_id"])
    return out.groupBy("region_id").agg(F.count(F.lit(1)).alias("n")).orderBy("region_id")


def q_knn_rings_fixture(spark, sf_dir):
    """Ring-expansion kNN (haversine) on fixture points — equals brute force
    by tests/test_knn.py; rows-only here."""
    import numpy as np
    import pandas as pd

    from pgsql2osm_spark.operators import knn as K
    from pgsql2osm_spark.sources import fixtures as FX

    n = 5000
    lon, lat = FX.gen_points_slice(0, n)
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"img{i:012d}" for i in range(n)], "lon": lon, "lat": lat})
    )
    rng = np.random.default_rng(5)
    queries = pd.DataFrame(
        {"query_id": np.arange(8), "lon": rng.uniform(-170, 170, 8), "lat": rng.uniform(-55, 65, 8)}
    )
    return K.knn_rings(spark, pts, queries, 5).select("query_id", "neighbor_id", "rank")


def q_image_decode_stats(spark, sf_dir):
    """Multimodal: Arrow-batch image decode -> tile stats (PNG codec real,
    lossy stand-in for jpeg; pixel parity golden-tested)."""
    from pgsql2osm_spark.operators import tiling as TL
    from pgsql2osm_spark.sources import fixtures as FX

    images = FX.images_df(spark, 256)
    return TL.image_tile_stats(images, 12).select(
        "image_id", "z", "x", "y", "px_count", "phash"
    )


def q_minhash_pairs(spark, sf_dir):
    """Dedup: MinHash+LSH near-dup candidates over documents (pytest-verified
    against planted near-dups; rows-only here)."""
    from pgsql2osm_spark.operators import dedup as DD

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dup = d.limit(20).select((F.col("doc_id") + 1000000).alias("doc_id"),
                             F.concat(F.col("text"), F.lit(" tail")).alias("text"))
    # 8 rows/band: the synthetic docs share a 20-word vocabulary, so loose
    # bands bucket half the corpus together; stricter bands keep candidate
    # volume proportional to true near-dups
    return DD.minhash_lsh_candidates(
        d.unionByName(dup), bands=8
    ).orderBy("id_a", "id_b")


def q_simhash(spark, sf_dir):
    """Dedup: 64-bit SimHash per document, pure Spark built-ins (verified
    against an independent numpy recomputation in tests)."""
    from pgsql2osm_spark.operators import dedup as DD

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", DD.simhash_fast_col().alias("simhash")).orderBy("doc_id")


def q_regions_lookup(spark, sf_dir):
    """S8: iso-code -> region dimension lookup (regions.csv analogue;
    substring/exact semantics tested in tests/test_tags_regions.py)."""
    from pgsql2osm_spark.sources import regions as RG

    dim = RG.fixture_regions_dim(spark, 64)
    parts = [
        RG.regions_lookup(dim, iso).withColumn("query", F.lit(iso))
        for iso in ("za", "zb-02", "zc")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("query", "osm_id")


def q_s2_encode(spark, sf_dir):
    """F1: s2-style cube-face cell encode (numpy pandas UDF; trig-based so
    no bit-exact SQL oracle — cross-checked by tests/test_cells.py)."""
    from pgsql2osm_spark.functions import udfs

    p = _points(spark, sf_dir)
    s2 = udfs.make_s2_udf(16)
    return p.select("id", s2(F.col("lon"), F.col("lat")).alias("s2_16")).orderBy("id")


def q_export_pipeline(spark, sf_dir):
    """Full reference lifecycle on the fixture graph: spatial seed ->
    nwr closure -> attribute cascade -> tag merge -> export rows with
    coordinate inner-join (SURVEY.md §3 phases within/children/parents/write;
    golden-tested in tests/test_attributes.py + test_closure.py)."""
    import pandas as pd

    from pgsql2osm_spark.operators import attributes as AT
    from pgsql2osm_spark.operators import closure as CL
    from pgsql2osm_spark.sources import fixtures as FX

    mdf = FX.memberships_df(spark)
    out = CL.nwr_within_closure(
        mdf,
        spark.createDataFrame([(i,) for i in range(1, 120)], "id long"),
        spark.createDataFrame([(503,), (507,)], "id long"),
        spark.createDataFrame([(9001,), (9002,), (9006,)], "id long"),
    )
    # attribute sources derived from the membership fixture's tag maps
    parents = mdf.select(
        F.col("parent_kind").alias("kind"),
        F.col("parent_id").alias("id"),
        F.create_map(F.lit("fixture"), F.lit("1")).alias("col_tags"),
        F.col("tags"),
    )
    nodes = (
        spark.range(1, 400)
        .select(
            F.lit("N").alias("kind"),
            F.col("id"),
            F.create_map(F.lit("ele"), (F.col("id") % 100).cast("string")).alias("col_tags"),
            F.when(F.col("id") % 7 == 0, F.create_map(F.lit("amenity"), F.lit("bench")))
            .otherwise(F.lit(None))
            .cast("map<string,string>")
            .alias("tags"),
        )
    )
    lon, lat = FX.gen_points_slice(0, 400)
    coords = spark.createDataFrame(
        pd.DataFrame({"id": range(1, 401), "lon": lon, "lat": lat})
    )
    rows = AT.export_rows(out, [(parents, 0), (nodes, 1)], coordinates=coords)
    return rows.select(
        "kind", "id", F.size("tags").alias("n_tags"), "lon", "lat"
    ).orderBy("kind", "id")


def q_closure_fixture(spark, sf_dir):
    """Membership closure (2-pass nesting, parent lookup, way-node
    reconstruction) on the typed member-graph fixture."""
    from pgsql2osm_spark.operators import closure as CL
    from pgsql2osm_spark.sources import fixtures as FX

    mdf = FX.memberships_df(spark)
    out = CL.nwr_within_closure(
        mdf,
        spark.createDataFrame([(i,) for i in range(1, 80)], "id long"),
        spark.createDataFrame([(505,), (510,)], "id long"),
        spark.createDataFrame([(9001,), (9004,)], "id long"),
    )
    parts = [df.select(F.lit(k).alias("kind"), "id") for k, df in out.items()]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.orderBy("kind", "id")


# ---------------------------------------------------------------------------
# Contract functions.
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: H3-encode + two-stage PIP join of derived points against a
    boundary polygon, on sf0.001 (SURVEY.md §7 step 1)."""
    return q_pip_convex(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "h3_encode": q_h3_encode,
        "tile_assign": q_tile_assign,
        "pip_convex": q_pip_convex,
        "knn_planar": q_knn_planar,
        "semi_join_parents": q_semi_join_parents,
        "forward_expand": q_forward_expand,
        "anti_join": q_anti_join,
        "priority_cascade": q_priority_cascade,
        "union_distinct": q_union_distinct,
        "grouped_counts": q_grouped_counts,
        "topk_customers": q_topk_customers,
        "window_rank": q_window_rank,
        "rollup_counts": q_rollup_counts,
        "cube_counts": q_cube_counts,
        "events_hourly": q_events_hourly,
        "events_top_users": q_events_top_users,
        "events_sessions": q_events_sessions,
        "phash_near_dups": q_phash_near_dups,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "doc_tokens": q_doc_tokens,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "lang_quality_agg": q_lang_quality_agg,
        "exact_dedup": q_exact_dedup,
        "word_jaccard": q_word_jaccard,
        "cosine_topk": q_cosine_topk,
        "ann_ivf": q_ann_ivf,
        "embedding_near_dups": q_embedding_near_dups,
        "streaming_tiles": q_streaming_tiles,
        "embedding_label_stats": q_embedding_label_centroid_rank,
        # engine-only paths (rows-only driver check; exact golden in tests/)
        "pip_fixture_regions": q_pip_fixture_regions,
        "pip_partitioned_fixture": q_pip_partitioned_fixture,
        "knn_rings_fixture": q_knn_rings_fixture,
        "image_decode_stats": q_image_decode_stats,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "closure_fixture": q_closure_fixture,
        "s2_encode": q_s2_encode,
        "export_pipeline": q_export_pipeline,
        "regions_lookup": q_regions_lookup,
    }


def oracle_sql() -> dict[str, str]:
    from pgsql2osm_spark.operators import text as TX

    pts = _POINTS_SQL
    # half-plane conjunction for the CCW convex hexagon
    hp = []
    for i in range(len(_HEX)):
        x0, y0 = _HEX[i]
        x1, y1 = _HEX[(i + 1) % len(_HEX)]
        hp.append(f"(({x1} - {x0}) * (lat - {y0}) - (lon - {x0}) * ({y1} - {y0}) >= 0)")
    pip_pred = " AND ".join(hp)

    tx_sql, ty_sql = G.tile_sql("lon", "lat", 7)
    lang_parts, lang_expr = TX.lang_id_sql()

    return {
        "h3_encode": (
            f"SELECT id, {C.cell_sql('lon', 'lat', 7)} AS h3_7, "
            f"{C.cell_sql('lon', 'lat', 11)} AS h3_11 FROM ({pts})"
        ),
        "tile_assign": f"SELECT id, {tx_sql} AS tx, {ty_sql} AS ty FROM ({pts})",
        "pip_convex": f"SELECT id FROM ({pts}) WHERE {pip_pred} ORDER BY id",
        "knn_planar": f"""
            WITH q AS (
              SELECT n_nationkey AS query_id,
                     {_lon_sql('CAST(n_nationkey + 1000 AS BIGINT)')} AS qlon,
                     {_lat_sql('CAST(n_nationkey + 1000 AS BIGINT)')} AS qlat
              FROM nation
            ), d AS (
              SELECT q.query_id, p.id AS neighbor_id,
                     (p.lon - q.qlon) * (p.lon - q.qlon)
                     + (p.lat - q.qlat) * (p.lat - q.qlat) AS d2
              FROM ({pts}) p CROSS JOIN q
            )
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY d2 ASC, neighbor_id ASC) AS BIGINT) AS rank
            FROM d QUALIFY rank <= 3
        """,
        "semi_join_parents": """
            SELECT DISTINCT l_orderkey AS id FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_partkey % 97 = 0)
            ORDER BY id
        """,
        "forward_expand": """
            SELECT DISTINCT l_partkey AS id FROM lineitem
            WHERE l_orderkey % 199 = 0 ORDER BY id
        """,
        "anti_join": """
            SELECT c_custkey AS id FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY id
        """,
        "priority_cascade": """
            WITH u AS (
              SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS id, 'customer' AS src, 0 AS prio FROM customer
              UNION ALL
              SELECT DISTINCT CAST(s_nationkey AS BIGINT), 'supplier', 1 FROM supplier
              UNION ALL
              SELECT DISTINCT CAST(n_nationkey AS BIGINT), 'nation', 2 FROM nation
            )
            SELECT id, src FROM u
            QUALIFY row_number() OVER (PARTITION BY id ORDER BY prio ASC) = 1
            ORDER BY id
        """,
        "union_distinct": """
            SELECT DISTINCT id FROM (
              SELECT l_partkey AS id FROM lineitem WHERE l_quantity >= 49.0
              UNION ALL
              SELECT p_partkey FROM part WHERE p_size >= 49
            ) ORDER BY id
        """,
        "grouped_counts": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n,
                   sum(l_quantity) AS sum_qty,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "topk_customers": """
            SELECT o_custkey AS id, count(*) AS n_orders FROM orders
            GROUP BY 1 ORDER BY n_orders DESC, id ASC LIMIT 10
        """,
        "window_rank": """
            SELECT o_custkey AS id, o_orderkey AS okey,
                   CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS BIGINT) AS rank
            FROM orders QUALIFY rank <= 3 ORDER BY id, rank
        """,
        "rollup_counts": """
            SELECT r_name, n_name, count(*) AS n
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name, n_name
        """,
        "cube_counts": """
            SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "events_hourly": """
            SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
                   count(*) AS n, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_top_users": """
            WITH c AS (
              SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
            )
            SELECT event_type, user_id, n,
                   CAST(row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS BIGINT) AS rank
            FROM c QUALIFY rank <= 3 ORDER BY event_type, rank
        """,
        "events_sessions": """
            WITH g AS (
              SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
              FROM events
            ), l AS (
              SELECT user_id, event_id, tsec,
                     lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec ASC, event_id ASC) AS prev
              FROM g
            ), s AS (
              SELECT user_id, event_id,
                     SUM(CASE WHEN prev IS NULL OR tsec - prev > 1800 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY tsec ASC, event_id ASC) AS sess_id
              FROM l
            ), per AS (
              SELECT user_id, sess_id, count(*) AS n_events FROM s GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
            FROM per GROUP BY 1 ORDER BY 1
        """,
        "asof_join": """
            WITH b AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
                     max(event_id) AS event_id
              FROM events GROUP BY 1, 2
            ), p AS (
              SELECT o_orderkey AS pid,
                     CAST(o_custkey % 150 AS BIGINT) AS user_id,
                     CAST(floor(epoch(o_orderdate)) AS BIGINT) AS tsec
              FROM orders
            )
            SELECT p.pid, p.user_id,
                   coalesce(b.tsec, -1) AS asof_ts,
                   coalesce(b.event_id, -1) AS event_id
            FROM p ASOF LEFT JOIN b
              ON p.user_id = b.user_id AND p.tsec >= b.tsec
            ORDER BY pid
        """,
        "range_join": """
            SELECT o.o_orderkey AS pid, p.p_partkey AS iv_id
            FROM orders o
            JOIN (SELECT p_partkey, p_retailprice * 100.0 AS lo,
                         p_retailprice * 100.0 + 5000.0 AS hi
                  FROM part WHERE p_partkey % 53 = 0) p
              ON o.o_totalprice BETWEEN p.lo AND p.hi
            ORDER BY pid, iv_id
        """,
        "doc_tokens": (
            f"SELECT doc_id, CAST({TX.token_count_sql()} AS BIGINT) AS n_tokens, "
            f"CAST({TX.stopword_count_sql()} AS BIGINT) AS n_stopwords, "
            f"{TX.fingerprint_sql()} AS fingerprint FROM documents ORDER BY doc_id"
        ),
        "doc_quality": (
            f"SELECT doc_id, {TX.quality_sql()} FROM documents ORDER BY doc_id"
        ),
        "doc_langid": (
            f"SELECT doc_id, {lang_expr} AS pred_lang FROM "
            f"(SELECT doc_id, {', '.join(lang_parts)} FROM documents) ORDER BY doc_id"
        ),
        "lang_quality_agg": f"""
            WITH f AS (
              SELECT lang,
                     (length(text) >= 32 AND length(text) <= 4096
                      AND {TX.token_count_sql()} >= 8
                      AND {TX.stopword_count_sql()} * 20 >= {TX.token_count_sql()}) AS quality_ok,
                     CAST({TX.token_count_sql()} AS BIGINT) AS n_tokens
              FROM documents
            )
            -- DuckDB sum(BIGINT) -> HUGEINT materializes as float64 in pandas;
            -- Spark returns int64 — cast so the driver's value hash matches
            SELECT lang, quality_ok, count(*) AS n,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM f GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "exact_dedup": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
                   min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY 1 ORDER BY doc_id
        """,
        "word_jaccard": """
            WITH t AS (
              SELECT doc_id, lang,
                     list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / len(list_distinct(a.toks || b.toks)) AS jaccard
            FROM t a JOIN t b ON b.doc_id = a.doc_id + 17 AND a.lang = b.lang
            ORDER BY id_a
        """,
        "cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
            ), d AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))) AS cosine
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM d QUALIFY rank <= 5 ORDER BY query_id, rank
        """,
        "embedding_label_stats": """
            SELECT label, count(*) AS n,
                   min(CAST(embedding[1] AS DOUBLE)) AS min_e0,
                   max(CAST(embedding[1] AS DOUBLE)) AS max_e0
            FROM embeddings GROUP BY label ORDER BY label
        """,
    }
