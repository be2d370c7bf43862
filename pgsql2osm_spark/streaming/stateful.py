"""Custom stateful streaming operator: cross-batch exact dedup.

A continuously-ingesting image pipeline must not re-emit an image_id it has
already processed (the streaming face of the reference's done_ids guard,
/root/reference/pgsql2osm/pgsql2osm.py:521-522 — SURVEY.md J9). Built on
``applyInPandasWithState``: state per key group is the set of seen ids;
each micro-batch emits only first-seen rows.

Keys are grouped by a hash bucket of the id (not the raw id) so state count
stays bounded at ``n_buckets`` GroupState entries while the sets inside grow
with distinct ids — the right shape when ids are high-cardinality but state
must be scannable/checkpointable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "image_id string, lon double, lat double, first_seen boolean"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key, pdf_iter, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdf_iter:
        fresh = pdf[~pdf["image_id"].isin(seen)]
        # also dedup within the batch itself
        fresh = fresh.drop_duplicates(subset=["image_id"], keep="first")
        seen.update(fresh["image_id"].tolist())
        if len(fresh):
            out = fresh[["image_id", "lon", "lat"]].copy()
            out["first_seen"] = True
            yield out
    state.update((sorted(seen),))


def streaming_dedup(stream: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Emit each image_id at most once across all micro-batches."""
    keyed = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets))
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_replay(spark, input_dir: str, checkpoint_dir: str, out_table: str):
    """Bounded replay harness (availableNow) for tests/demos."""
    stream = spark.readStream.schema(
        "image_id string, lon double, lat double"
    ).option("maxFilesPerTrigger", 1).parquet(input_dir)
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
