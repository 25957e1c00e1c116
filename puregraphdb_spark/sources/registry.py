"""Source registry: the ten fixture tables (FIXTURES.md) + generic readers.

Parquet is the canonical format (only format present in the test
environment — SURVEY.md §2.2). The readers are thin on purpose: a bare
``spark.read.parquet`` gives Catalyst the embedded schema, the vectorized
reader, row-group statistics skipping, predicate pushdown and column
pruning for free. Anything we wrapped around it (manual partitioning,
eager caching) would only remove optimizer freedom.

At 100 TB the same entry point works unchanged: point ``data_dir`` at a
directory tree partitioned by a natural key (e.g. ship month) and Spark
adds partition pruning on top; see ``write_partitioned`` for the writer
that produces that layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The canonical table set (driver registers the same names as DuckDB views).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, data_dir: str, name: str) -> DataFrame:
    """Read one named table from ``{data_dir}/{name}.parquet`` (or a
    partitioned directory of the same name, transparently)."""
    path = os.path.join(data_dir, f"{name}.parquet")
    if not os.path.exists(path):
        # partitioned-directory layout (100-TB posture)
        alt = os.path.join(data_dir, name)
        if os.path.exists(alt):
            path = alt
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, data_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, data_dir, n) for n in names}


def write_partitioned(df: DataFrame, path: str,
                      partition_by: list[str] | None = None,
                      bucket_by: tuple[int, list[str]] | None = None,
                      table_name: str | None = None) -> None:
    """Write a table in the layout large deployments need.

    - ``partition_by``: hive-style directory partitioning → partition
      pruning on those columns at read time.
    - ``bucket_by=(n, cols)``: pre-shuffled bucketed layout → joins and
      aggregations on ``cols`` skip the shuffle entirely (requires a
      saveAsTable catalog entry, hence ``table_name``).
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketed writes need table_name (catalog-backed)")
        w.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name)
        return
    w.parquet(path)
