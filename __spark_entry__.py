"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (BM25 + sequential RM3 PRF expansion
top-k) on sf0.001. ``queries`` / ``oracle_sql`` expose every implemented
operator family from SURVEY.md §2 plus the training-data-pipeline
operators; implementations live in
``sequential_query_expansion_spark.driver_contract``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sequential_query_expansion_spark.driver_contract import (  # noqa: E402
    SPARK_QUERIES,
    build_oracle_sql,
    q_bm25_rm3_topk,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k with sequential RM3 PRF expansion, sf0.001."""
    return q_bm25_rm3_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
