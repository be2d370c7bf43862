"""Sequence packing — assign documents to fixed-size training chunks.

Pretraining pipelines concatenate the token stream and cut it at max_len
(GPT-style concat-and-chunk): every document gets (stream, chunk, offset)
coordinates in the packed corpus. Doing this as one global sequential scan
is the naive shape; the distributed form splits the corpus into n_streams
independent substreams by arithmetic id-hash (each stream is packed
independently — exactly how multi-worker data loaders shard anyway), and
inside a stream the assignment is pure window math:

    cum_before = sum(n_tokens) over (stream order by id, preceding rows)
    chunk      = cum_before DIV max_tokens
    offset     = cum_before MOD max_tokens

One shuffle (the window partition), integer outputs only, deterministic
under any input partitioning — and therefore bit-replicable in SQL for the
driver oracle. Documents longer than max_tokens simply span chunks, exactly
like the concatenated-stream semantics they model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_col, hash_sql


def chunk_assignments(
    df: DataFrame,
    n_tokens_col: str,
    id_col: str,
    max_tokens: int,
    n_streams: int = 64,
) -> DataFrame:
    """df + (stream, chunk, offset): the packed-corpus coordinates of every
    document. Streams are id-hash shards; within a stream documents pack in
    id order."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    stream = hash_col(id_col) % F.lit(n_streams)
    w = (
        Window.partitionBy("stream")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("stream", stream)
    out = out.withColumn(
        "_cum_before", F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0))
    )
    return (
        # integer DIV, not float division + cast: exact at any magnitude
        out.withColumn("chunk", F.expr(f"_cum_before DIV {max_tokens}"))
        .withColumn("offset", F.col("_cum_before") % max_tokens)
        .drop("_cum_before")
    )


def chunk_assignments_sql(
    n_tokens_expr: str, id_expr: str, max_tokens: int, n_streams: int = 64,
    table: str = "documents",
) -> str:
    """DuckDB equivalent (identical integer arithmetic)."""
    h = hash_sql(id_expr)
    return f"""
        SELECT {id_expr} AS doc_id, stream,
               CAST(cum_before // {max_tokens} AS BIGINT) AS chunk,
               CAST(cum_before % {max_tokens} AS BIGINT) AS "offset"
        FROM (
          SELECT {id_expr},
                 ({h}) % {n_streams} AS stream,
                 coalesce(sum({n_tokens_expr}) OVER (
                   PARTITION BY ({h}) % {n_streams}
                   ORDER BY {id_expr} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM {table}
        )
    """
