"""Batch sinks: partitioned/bucketed parquet hist tables, gated JDBC.

The reference persists to Postgres via COPY + upsert
(populate_postgres.sql) and suggests parquet-on-S3 for cloud (README
"cloud environment" sketch). The Spark-native hist store is a parquet
table partitioned by a date column (partition pruning for time-range
queries) and optionally bucketed by trip_key (shuffle-free upsert
anti-joins at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_hist_parquet(df: DataFrame, path: str,
                       partition_by: tuple[str, ...] = (),
                       mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_hist_bucketed(df: DataFrame, table: str, key: str = "trip_key",
                        buckets: int = 64, mode: str = "overwrite",
                        path: str | None = None) -> None:
    """Bucketed table: co-locates rows by key so the upsert anti-join
    (pipeline.trips.upsert_bucketed) needs no shuffle on the hist side.
    Pass ``path`` for an external-location table (else the warehouse
    dir). Size ``buckets`` to the join parallelism
    (spark.sql.shuffle.partitions): if they differ, EnsureRequirements
    re-shuffles the bucketed side to match the other side's
    partition count and the co-location is wasted."""
    w = (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_jdbc(df: DataFrame, url: str, table: str,
               properties: dict[str, str] | None = None,
               mode: str = "append") -> None:
    """JDBC sink (insert_postgres.py:24 ``df.write.jdbc``). Requires a
    driver jar; gated behind the caller in this environment."""
    df.write.jdbc(url, table, mode=mode, properties=properties or {})


def write_range_clustered(df: DataFrame, path: str, cluster_col: str,
                          n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-clustered parquet: repartitionByRange + sortWithinPartitions
    on the cluster column gives every output file a DISJOINT min/max
    range, so a point or range predicate prunes to O(1) files via
    parquet footer stats instead of scanning the table — the
    single-column analog of Z-ordering, and the difference between
    reading 1 file and 10,000 at 100 TB for time-range queries on an
    append-only hist table.
    """
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet (one directory per partition
    value). Partition columns become directory keys, so a filter on
    them is resolved from the file LISTING — zero data files are even
    opened for pruned partitions (``PartitionFilters`` in the scan
    node, vs ``PushedFilters`` which still opens footers). The layout
    for append-only time-series at 100 TB: daily ingest appends one
    new directory, readers touch only the days they ask for, and
    retention is a directory delete. Keep partition cardinality in the
    thousands (day, not minute) so the listing itself stays cheap.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
