"""RM3 expansion + eval metrics: Spark vs the pure-Python oracle.

The north_rule requires rank-identical top-k docIDs and BM25 scores on
both unexpanded and EXPANDED runs — this is the expanded half.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sequential_query_expansion_spark import oracle
from sequential_query_expansion_spark.evalmetrics import evaluate
from sequential_query_expansion_spark.expansion.rm3 import rm3_expand_df, rm3_topk
from sequential_query_expansion_spark.scoring.bm25 import (
    query_term_table,
    score_topk,
)

FB_DOCS, FB_TERMS, ORIG_W = 10, 15, 0.6


@pytest.fixture(scope="module")
def queries_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus.queries)


@pytest.fixture(scope="module")
def url_to_doc(index_tables):
    return {
        r["url"]: r["doc_id"] for r in index_tables.docmap.collect()
    }


def test_rm3_weights_match_oracle(spark, index_tables, oracle_index,
                                  tiny_corpus, queries_df):
    got = (
        rm3_expand_df(
            index_tables,
            query_term_table(queries_df),
            fb_docs=FB_DOCS,
            fb_terms=FB_TERMS,
            orig_weight=ORIG_W,
        )
        .toPandas()
        .set_index(["qid", "term"])["weight"]
        .to_dict()
    )
    for _, row in tiny_corpus.queries.iterrows():
        qid, terms = row["qid"], row["text"].split()
        want = oracle.rm3_expand(
            oracle_index, terms, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
            orig_weight=ORIG_W,
        )
        got_q = {t: w for (q, t), w in got.items() if q == qid}
        assert set(got_q) == set(want), f"{qid}: term sets differ"
        for t, w in want.items():
            assert got_q[t] == pytest.approx(w, abs=1e-9), (qid, t)


def test_expanded_topk_rank_identical(spark, index_tables, oracle_index,
                                      tiny_corpus, queries_df):
    got = (
        rm3_topk(
            index_tables,
            query_term_table(queries_df),
            k=20,
            fb_docs=FB_DOCS,
            fb_terms=FB_TERMS,
            orig_weight=ORIG_W,
        )
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    for _, row in tiny_corpus.queries.iterrows():
        qid, terms = row["qid"], row["text"].split()
        weights = oracle.rm3_expand(
            oracle_index, terms, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
            orig_weight=ORIG_W,
        )
        want = oracle.bm25_topk(
            oracle_index, list(weights), k=20, weights=weights
        )
        sub = got[got.qid == qid]
        assert list(sub.doc_id) == [d for d, _ in want], qid
        assert np.allclose(sub.score, [s for _, s in want], atol=1e-9), qid


def test_eval_metrics_match_oracle(spark, index_tables, oracle_index,
                                   tiny_corpus, queries_df, url_to_doc):
    k = 50
    run = score_topk(index_tables, query_term_table(queries_df), k=k)
    qrels_pdf = tiny_corpus.qrels.assign(
        doc_id=lambda d: d.url.map(url_to_doc)
    )[["qid", "doc_id", "rel"]]
    qrels = spark.createDataFrame(qrels_pdf)
    got = (
        evaluate(run.select("qid", "doc_id", "rank", "score"), qrels)
        .toPandas()
        .set_index(["metric", "qid"])["value"]
        .to_dict()
    )

    per_q_map = []
    for _, row in tiny_corpus.queries.iterrows():
        qid, terms = row["qid"], row["text"].split()
        ranked = [d for d, _ in oracle.bm25_topk(oracle_index, terms, k=k)]
        grades = dict(
            zip(qrels_pdf[qrels_pdf.qid == qid].doc_id,
                qrels_pdf[qrels_pdf.qid == qid].rel)
        )
        rel = {d for d, g in grades.items() if g > 0}
        ap = oracle.average_precision(ranked, rel)
        p10 = oracle.precision_at(ranked, rel, 10)
        ndcg = oracle.ndcg_at(ranked, grades, 10)
        rr = oracle.reciprocal_rank(ranked, rel)
        rprec = oracle.r_precision(ranked, rel)
        bp = oracle.bpref(ranked, rel, set())
        per_q_map.append(ap)
        assert got[("map", qid)] == pytest.approx(ap, abs=1e-9), qid
        assert got[("P_10", qid)] == pytest.approx(p10, abs=1e-9), qid
        assert got[("ndcg_cut_10", qid)] == pytest.approx(ndcg, abs=1e-9), qid
        assert got[("recip_rank", qid)] == pytest.approx(rr, abs=1e-9), qid
        assert got[("Rprec", qid)] == pytest.approx(rprec, abs=1e-9), qid
        assert got[("bpref", qid)] == pytest.approx(bp, abs=1e-9), qid
    assert got[("map", "all")] == pytest.approx(
        float(np.mean(per_q_map)), abs=1e-9
    )


def test_bpref_with_judged_nonrelevant(spark):
    """bpref must penalize judged-nonrelevant docs ranked above relevant
    ones (the pseudo-qrels path never has judged nonrelevant, so this
    exercises the N>0 branch directly)."""
    # run: ranks 1..5 = docs 10,11,12,13,14
    results = spark.createDataFrame(
        [("q1", 10 + i, i + 1, 5.0 - i) for i in range(5)],
        "qid string, doc_id long, rank int, score double",
    )
    # rel: 11, 13 relevant; 10, 12 judged nonrelevant; 14 unjudged
    qrels = spark.createDataFrame(
        [("q1", 10, 0), ("q1", 11, 1), ("q1", 12, 0), ("q1", 13, 2)],
        "qid string, doc_id long, rel int",
    )
    got = {
        (r["metric"], r["qid"]): r["value"]
        for r in evaluate(results, qrels).collect()
    }
    ranked = [10, 11, 12, 13, 14]
    want = oracle.bpref(ranked, {11, 13}, {10, 12})
    # hand check: R=2, N=2, min(R,N)=2; doc11 has 1 nonrel above →
    # 1 - 1/2 = 0.5; doc13 has 2 above, capped at min(2,R)=2 → 0.0;
    # bpref = (0.5 + 0.0) / 2 = 0.25
    assert want == pytest.approx(0.25)
    assert got[("bpref", "q1")] == pytest.approx(want, abs=1e-9)
    assert got[("Rprec", "q1")] == pytest.approx(0.5, abs=1e-9)  # top-2 has 1 rel


def test_rm3_dir_method_rank_identical(spark, index_tables, oracle_index, tiny_corpus):
    """RM3 with Dirichlet-LM feedback (the reference's actual Indri PRF
    configuration): expansion weights and the final expanded run are
    rank-identical to the pure-python oracle, with feedback-doc
    posteriors computed by softmax over the log-QL scores."""
    from collections import Counter

    import pytest as _pytest

    from sequential_query_expansion_spark.expansion.rm3 import rm3_topk
    from sequential_query_expansion_spark.functions.text import tokenize_py
    from sequential_query_expansion_spark.oracle import (
        dirichlet_topk as oracle_dir,
        rm3_expand as oracle_rm3,
    )
    from sequential_query_expansion_spark.scoring.bm25 import query_term_table

    qt = query_term_table(spark.createDataFrame(tiny_corpus.queries))
    got_rows = rm3_topk(
        index_tables, qt, k=20, fb_docs=5, fb_terms=10, orig_weight=0.6,
        rank_round=9, method="dir", mu=1600.0,
    ).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid in got:
        got[qid].sort()
    for _, qrow in tiny_corpus.queries.iterrows():
        qid, text = qrow["qid"], qrow["text"]
        toks = tokenize_py(text)
        expanded = oracle_rm3(
            oracle_index, toks, fb_docs=5, fb_terms=10, orig_weight=0.6,
            method="dir", mu=1600.0,
        )
        expected = oracle_dir(
            oracle_index, sorted(expanded), k=20, mu=1600.0, weights=expanded
        )
        spark_ranked = got.get(qid, [])
        assert len(spark_ranked) == len(expected), qid
        for (rank, doc_id, score), (e_doc, e_score) in zip(spark_ranked, expected):
            assert doc_id == e_doc, f"{qid} rank {rank}: {doc_id} != {e_doc}"
            assert score == _pytest.approx(e_score, abs=1e-8)
