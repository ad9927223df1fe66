"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up when the source has fewer partitions than cores —
    a single small parquet file otherwise serializes every downstream
    Arrow kernel onto one task. No-op when the input is already wide
    (the real-table case at scale: thousands of files/splits)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
