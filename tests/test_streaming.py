"""Streaming tile refresh: bounded replay equals the batch aggregation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pgsql2osm_spark.functions import cells as C
from pgsql2osm_spark.functions import geometry as G
from pgsql2osm_spark.sources import fixtures as FX
from pgsql2osm_spark.streaming import incremental as ST


def test_streaming_tiles_match_batch(spark, tmp_path):
    n = 5000
    lon, lat = FX.gen_points_slice(0, n)
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(np.arange(n) % 600, unit="s")
    pdf = pd.DataFrame({"ts": ts, "lon": lon, "lat": lat})
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)

    got = ST.run_bounded_replay(
        spark, src, str(tmp_path / "ckpt"), "stream_tiles", z=10
    ).toPandas()

    batch = spark.read.parquet(src)
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), 10)
    exp = (
        batch.withColumn("x", x)
        .withColumn("y", y)
        .withColumn("z", F.lit(10).cast("int"))
        .withColumn("h3", C.cell_expr(F.col("lon"), F.col("lat"), 7))
        .groupBy(F.window("ts", "5 minutes"), "z", "x", "y", "h3")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    def key(df):
        return {
            (str(r.window["start"]), r.z, r.x, r.y, r.h3): r.n for r in df.itertuples()
        }
    assert key(got) == key(exp)
    assert len(got) > 100


def test_stateful_streaming_dedup(spark, tmp_path):
    """Duplicate image_ids across micro-batch files are emitted exactly once
    (applyInPandasWithState custom stateful operator)."""
    import numpy as np

    from pgsql2osm_spark.streaming import stateful as SF

    n = 800
    lon, lat = FX.gen_points_slice(0, n)
    ids = [f"img{i % 500:06d}" for i in range(n)]  # 300 duplicate ids
    pdf = pd.DataFrame({"image_id": ids, "lon": lon, "lat": lat})
    src = str(tmp_path / "dsrc")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1,
    # duplicates split across batches to exercise cross-batch state
    spark.createDataFrame(pdf.iloc[:400]).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf.iloc[400:]).coalesce(1).write.mode("append").parquet(src)

    out = SF.run_dedup_replay(spark, src, str(tmp_path / "dckpt"), "dedup_out").toPandas()
    assert len(out) == 500  # every distinct id exactly once
    assert out["image_id"].is_unique
    assert set(out["image_id"]) == set(ids)

    # bloom mode: CONSTANT per-bucket state; at 500 ids into 2^16-bit filters
    # the FP probability is ~0, so the replay matches exact mode
    out_b = SF.run_dedup_replay(
        spark, src, str(tmp_path / "bckpt"), "dedup_bloom",
        mode="bloom", bloom_bits=1 << 16, bloom_hashes=7, n_buckets=8,
    ).toPandas()
    assert out_b["image_id"].is_unique
    assert set(out_b["image_id"]) == set(ids)
    # and the checkpointed state is the fixed filter size, not the id set
    import pyspark.sql.functions as F

    state = (
        spark.read.format("statestore")
        .load(str(tmp_path / "bckpt"))
        .select(F.length("value.groupState.bloom").alias("sz"))
        .collect()
    )
    assert state and all(r["sz"] == (1 << 16) // 8 for r in state)


def test_streaming_dedup_state_ttl(spark, tmp_path):
    """ttl_ms expires IDLE bucket state (processing-time timeout): an id
    re-ingested after its bucket expired is re-emitted as first_seen — the
    documented re-admission trade that keeps long-lived dedup state from
    pinning retired id shards forever (VERDICT r2 next #7)."""
    import time as _time

    from pgsql2osm_spark.streaming import stateful as SF

    # two ids in DIFFERENT hash buckets (a bucket only times out in a batch
    # where it receives no data, so the expiring batch must carry traffic
    # for the other bucket)
    probe = spark.createDataFrame(
        [(f"img{i:06d}",) for i in range(16)], "image_id string"
    ).select("image_id", F.pmod(F.xxhash64("image_id"), F.lit(2)).alias("b")).collect()
    id_a = next(r["image_id"] for r in probe if r["b"] == 0)
    id_b = next(r["image_id"] for r in probe if r["b"] == 1)

    src, ckpt = str(tmp_path / "tsrc"), str(tmp_path / "tckpt")

    def run(name, expect_rows):
        # TTL replays return CUMULATIVE rows (parquet sink — the memory sink
        # cannot recover a checkpoint across the multi-run aging this needs)
        out = SF.run_dedup_replay(
            spark, src, ckpt, name, mode="exact", ttl_ms=1500, n_buckets=2,
            expect_rows=expect_rows,
        ).toPandas()
        return sorted(out["image_id"])

    def write(ids, mode):
        spark.createDataFrame(
            pd.DataFrame({"image_id": ids, "lon": 0.0, "lat": 0.0})
        ).coalesce(1).write.mode(mode).parquet(src)
        _time.sleep(1.1)  # FileStreamSource orders batches by mtime

    write([id_a], "overwrite")
    assert run("ttl_r1", 1) == [id_a]
    _time.sleep(3.0)  # > ttl: id_a's bucket is now idle-expired
    # traffic on the OTHER bucket triggers the timeout sweep for id_a's;
    # within-run duplicates of id_b are still suppressed (its state is live)
    write([id_b, id_b], "append")
    assert run("ttl_r2", 2) == sorted([id_a, id_b])
    # id_a re-ingested after expiry -> re-emitted (flagged re-admission)
    write([id_a], "append")
    assert run("ttl_r3", 1) == sorted([id_a, id_a, id_b])


def test_watermark_late_data_contract(spark, tmp_path):
    """The engine's (= Spark's) append-mode late-data contract, pinned by
    a 4-micro-batch replay (maxFilesPerTrigger=1, files ordered by mtime):
    late rows arriving while their window is STILL IN STATE merge into it
    (no data loss before eviction), rows arriving AFTER the window was
    evicted+emitted are dropped (numRowsDroppedByWatermark), and every
    (window, tile) key is emitted EXACTLY once — the exactly-once upsert
    guarantee downstream tile stores rely on."""
    import collections
    import time as _time

    src = str(tmp_path / "lsrc")
    base = pd.Timestamp("2026-01-01 01:00:00")

    def write(pdf, mode):
        spark.createDataFrame(pdf).coalesce(1).write.mode(mode).parquet(src)
        _time.sleep(1.1)  # FileStreamSource orders batches by modification time

    lon, lat = FX.gen_points_slice(0, 20)
    # batch 0: 20 events in window [base, base+5min)
    write(pd.DataFrame({"ts": [base + pd.Timedelta(seconds=10 * i) for i in range(20)],
                        "lon": lon, "lat": lat}), "overwrite")
    # batches 1-2: advance the watermark past the window end (watermark
    # application lags one batch, so two advancing batches force eviction)
    lon2, lat2 = FX.gen_points_slice(20, 25)
    write(pd.DataFrame({"ts": [base + pd.Timedelta(minutes=30)] * 5,
                        "lon": lon2, "lat": lat2}), "append")
    lon3, lat3 = FX.gen_points_slice(25, 30)
    write(pd.DataFrame({"ts": [base + pd.Timedelta(minutes=31)] * 5,
                        "lon": lon3, "lat": lat3}), "append")
    # batch 3: 5 rows for the ALREADY-EMITTED window -> must be dropped
    lon4, lat4 = FX.gen_points_slice(30, 35)
    write(pd.DataFrame({"ts": [base + pd.Timedelta(minutes=2)] * 5,
                        "lon": lon4, "lat": lat4}), "append")

    stream = spark.readStream.schema("ts timestamp, lon double, lat double") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        ST.tile_count_stream(stream, z=10)
        .writeStream.outputMode("append")
        .format("memory").queryName("late_test")
        .option("checkpointLocation", str(tmp_path / "lckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("late_test").toPandas()
    keys = [(str(w["start"]), x, y, h)
            for w, x, y, h in zip(got["window"], got["x"], got["y"], got["h3"])]
    assert not [k for k, c in collections.Counter(keys).items() if c > 1]
    # window-1 emitted with exactly its 20 on-time rows; the 5 post-eviction
    # rows never re-open it
    w1 = got[[str(w["start"]) == str(base) for w in got["window"]]]
    assert int(w1["n"].sum()) == 20
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress for op in p.get("stateOperators", [])
    )
    assert dropped == 5, f"expected the 5 post-eviction rows dropped, got {dropped}"
