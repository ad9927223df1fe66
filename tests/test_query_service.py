"""QueryService: the serving path must return results identical to the
plain score_topk / rm3_topk plans (it only resizes the per-query
exchanges), and must restore the session conf afterwards."""

from __future__ import annotations

import numpy as np
import pytest

from sequential_query_expansion_spark.expansion.rm3 import rm3_topk
from sequential_query_expansion_spark.scoring.bm25 import (
    query_term_table,
    score_topk,
)
from sequential_query_expansion_spark.scoring.service import QueryService


@pytest.fixture(scope="module")
def qt(spark, tiny_corpus):
    return query_term_table(spark.createDataFrame(tiny_corpus.queries)).persist()


def test_service_results_identical(spark, index_tables, qt):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    svc = QueryService(spark, index_tables, shuffle_partitions=2)
    got = (
        svc.topk(qt, k=10, rank_round=9)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        score_topk(index_tables, qt, k=10, rank_round=9)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert list(got.qid) == list(want.qid)
    assert list(got.doc_id) == list(want.doc_id)
    assert np.allclose(got.score, want.score, atol=1e-12)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_service_rm3_identical(spark, index_tables, qt):
    svc = QueryService(spark, index_tables, shuffle_partitions=2, warm=False)
    got = (
        svc.rm3_topk(qt, k=5)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        rm3_topk(index_tables, qt, k=5)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert list(got.qid) == list(want.qid)
    assert list(got.doc_id) == list(want.doc_id)
    assert np.allclose(got.score, want.score, atol=1e-12)
