"""Incremental tile refresh via Structured Streaming — beyond-reference.

The reference is a pure batch exporter (its "streaming" is constant-memory
iteration, /root/reference/README.md:58-64 — SURVEY.md §2.9). This module
adds the event-time path a continuously-ingesting image pipeline needs:
a stream of geotagged records -> cell/tile keys (same JVM bit math as the
batch path) -> watermarked sliding/tumbling aggregation -> upserted tile
counts. Late data beyond the watermark is dropped deterministically.

All transformations are the SAME Column expressions the batch operators
use (cells.cell_expr / geometry.tile_expr), so batch and streaming tiles
agree by construction — tested in tests/test_streaming.py by replaying a
bounded stream with trigger availableNow and diffing against the batch agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geometry as G


def tile_count_stream(
    stream: DataFrame,
    z: int = 12,
    cell_res: int = 7,
    event_time: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Streaming per-(window, tile) counts with late-data handling.

    stream: a streaming DataFrame with (ts:timestamp, lon:double,
    lat:double). Returns a streaming aggregation keyed by
    (window, z, x, y, h3_cell) in update mode semantics.
    """
    x, y = G.tile_expr(F.col("lon"), F.col("lat"), z)
    keyed = (
        stream.withWatermark(event_time, watermark)
        .withColumn("x", x)
        .withColumn("y", y)
        .withColumn("z", F.lit(z).cast("int"))
        .withColumn("h3", C.cell_expr(F.col("lon"), F.col("lat"), cell_res))
    )
    return keyed.groupBy(
        F.window(F.col(event_time), window), "z", "x", "y", "h3"
    ).agg(F.count(F.lit(1)).alias("n"))


def run_bounded_replay(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    out_table: str,
    z: int = 12,
    state_partitions: int | None = None,
):
    """Replay a bounded parquet directory as a stream (availableNow) into an
    in-memory sink — the deterministic test/demo harness for the streaming
    path; checkpointing makes a second run resume with no duplicate output
    (the streaming face of the engine's resume story).

    ``state_partitions`` sizes the stateful aggregation's shuffle — and
    therefore the STATE STORE instance count, pinned into the checkpoint
    for the query's lifetime. Each state partition costs a store instance
    plus delta/snapshot files per micro-batch, so it should track the
    stateful key cardinality, not the session's scan parallelism: the
    session default (2 x cores) spends most of its wall on empty-state
    bookkeeping for small key sets (measured: 64 -> 8 partitions cuts the
    bounded replay's state-task count 8x at identical output). Default 8
    here (tile-key replays are small); override per deployment via
    SPARK_GRAFT_STREAM_STATE_PARTS or the argument — a planet-scale tile
    stream wants it near the cluster's core count."""
    import os

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    n_parts = state_partitions or int(
        os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "8")
    )
    stream = spark.readStream.schema(
        "ts timestamp, lon double, lat double"
    ).parquet(input_dir)
    agg = tile_count_stream(stream, z=z)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(out_table)
