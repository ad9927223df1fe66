"""Block-max WAND: rank-identical to the scoring join, and actually
prunes (skips block decodes) on stopword-skewed queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sequential_query_expansion_spark.scoring.bm25 import (
    query_term_table,
    score_topk,
)
from sequential_query_expansion_spark.scoring import wand


@pytest.fixture(scope="module")
def queries_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus.queries)


def test_wand_matches_scoring_join(spark, index_tables, queries_df):
    qt = query_term_table(queries_df).persist()
    k = 10
    a = (
        score_topk(index_tables, qt, k=k, rank_round=9)
        .select("qid", "doc_id", "rank", "score")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    b = (
        wand.wand_topk(index_tables, qt, k=k, salt_ranges=4, rank_round=9)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert list(a.qid) == list(b.qid)
    assert list(a.doc_id) == list(b.doc_id)
    assert np.allclose(a.score, b.score, atol=1e-9)


def test_wand_k1_matches(spark, index_tables, queries_df):
    qt = query_term_table(queries_df)
    a = score_topk(index_tables, qt, k=1, rank_round=9).toPandas()
    b = wand.wand_topk(index_tables, qt, k=1, salt_ranges=4, rank_round=9).toPandas()
    ma = a.sort_values("qid").reset_index(drop=True)
    mb = b.sort_values("qid").reset_index(drop=True)
    assert list(ma.doc_id) == list(mb.doc_id)


def test_wand_duplicate_doc_ties(spark):
    """Regression: 20 identical docs → all candidates tie at the exact
    same BM25 score. The (score desc, doc_id asc) contract requires the
    SMALLEST doc_ids in the top-k; the old prune (`bound <= theta`)
    stopped before scanning tied-bound intervals and returned the largest
    ones instead."""
    from sequential_query_expansion_spark.index.build import build_index

    pages = spark.createDataFrame(
        [(f"http://d{i:02d}.example/", "alpha beta gamma alpha") for i in range(20)],
        "url string, text string",
    )
    idx = build_index(pages, build_blocked=True, salt_ranges=4)
    qt = spark.createDataFrame(
        [("q1", "alpha", 1.0)], "qid string, term string, weight double"
    )
    k = 5
    a = (
        score_topk(idx, qt, k=k, rank_round=9)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    b = (
        wand.wand_topk(idx, qt, k=k, salt_ranges=4, rank_round=9)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert list(b.doc_id) == list(a.doc_id) == sorted(a.doc_id)
    assert np.allclose(a.score, b.score, atol=1e-12)


def test_kernel_prunes_blocks(index_tables):
    """Drive the kernel directly on a stopword-heavy group and check it
    decodes fewer blocks than exist (block-max skipping engaged)."""
    blocked = index_tables.postings
    # hottest term = most blocks
    rows = blocked.orderBy(F_size_desc()).limit(3).collect()
    pdf = pd.DataFrame(
        [
            {
                "qid": "qx",
                "term": r["term"],
                "weight": 1.0,
                "df": r["df"],
                "blocks": [b.asDict() for b in r["blocks"]],
            }
            for r in rows
        ]
    )
    total_blocks = sum(len(r["blocks"]) for _, r in pdf.iterrows())
    decoded_counter = {"n": 0}
    orig = wand.decode_block

    def counting(*args, **kw):
        decoded_counter["n"] += 1
        return orig(*args, **kw)

    wand.decode_block = counting
    try:
        out = wand._wand_kernel(
            pdf, k=3, n_docs=index_tables.n_docs,
            avgdl=index_tables.avgdl, k1=1.2, b=0.75,
        )
    finally:
        wand.decode_block = orig
    assert len(out) == 3
    assert decoded_counter["n"] <= total_blocks


def F_size_desc():
    from pyspark.sql import functions as F

    return F.size("blocks").desc()


def test_wand_pfor_codec_rank_identical(spark, index_tables, queries_df, tiny_corpus):
    """A pfor-encoded index serves the same ranking byte-for-byte: the
    blocked table is rebuilt with codec='pfor' (the compact/serving
    default) and WAND over it must equal the flat scoring join."""
    from sequential_query_expansion_spark.index.build import (
        build_blocked_postings,
    )

    idx = index_tables
    pfor_blocked = build_blocked_postings(
        idx.postings_flat, idx.n_docs, idx.avgdl, salt_ranges=4, codec="pfor"
    )
    import copy

    idx2 = copy.copy(idx)
    idx2.postings = pfor_blocked
    qt = query_term_table(queries_df)
    a = (
        score_topk(idx, qt, k=10, rank_round=9)
        .select("qid", "doc_id", "score").toPandas()
        .sort_values(["qid", "doc_id"]).reset_index(drop=True)
    )
    b = (
        wand.wand_topk(idx2, qt, k=10, salt_ranges=4, rank_round=9)
        .select("qid", "doc_id", "score").toPandas()
        .sort_values(["qid", "doc_id"]).reset_index(drop=True)
    )
    assert list(a.qid) == list(b.qid)
    assert list(a.doc_id) == list(b.doc_id)
    assert np.allclose(a.score, b.score, atol=1e-9)
