"""Inferred measures (infAP / infNDCG, sample_eval analogue):
full-judgment reduction to exact AP / NDCG, and sampled estimates
tracking the truth."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from sequential_query_expansion_spark.evalmetrics import (
    evaluate,
    evaluate_inferred,
)


def _mk(spark, ranked_rel, qrels_rel):
    """ranked_rel: {qid: [doc ids in rank order]}; qrels_rel: {qid: {doc: rel}}."""
    res_rows = [
        (q, d, i + 1, float(100 - i))
        for q, docs in ranked_rel.items()
        for i, d in enumerate(docs)
    ]
    qr_rows = [
        (q, d, r) for q, dd in qrels_rel.items() for d, r in dd.items()
    ]
    res = spark.createDataFrame(
        res_rows, "qid string, doc_id long, rank int, score double"
    )
    qr = spark.createDataFrame(qr_rows, "qid string, doc_id long, rel int")
    return res, qr


@pytest.fixture(scope="module")
def synthetic(spark):
    rng = random.Random(11)
    ranked, qrels = {}, {}
    for qi in range(6):
        qid = f"q{qi}"
        docs = list(range(100))
        rng.shuffle(docs)
        ranked[qid] = docs[:50]
        rel = {d: rng.choice([1, 1, 2]) for d in rng.sample(range(100), 30)}
        qrels[qid] = rel
    return _mk(spark, ranked, qrels)


def test_rate_one_reduces_to_exact_ap(spark, synthetic):
    res, qr = synthetic
    full = qr.withColumn("rate", qr.rel * 0 + 1.0)
    inf = evaluate_inferred(res, full).toPandas()
    exact = evaluate(res, qr).toPandas()
    m_inf = inf[(inf.metric == "infAP") & (inf.qid != "all")].set_index("qid").value
    m_map = exact[(exact.metric == "map") & (exact.qid != "all")].set_index("qid").value
    pd.testing.assert_series_equal(
        m_inf.sort_index(), m_map.sort_index(), check_names=False, atol=1e-12
    )


def test_rate_one_infndcg_is_full_depth_ndcg(spark, synthetic):
    """Hand-compute full-depth NDCG per query and compare."""
    res, qr = synthetic
    full = qr.withColumn("rate", qr.rel * 0 + 1.0)
    inf = evaluate_inferred(res, full).toPandas()
    got = inf[(inf.metric == "infNDCG") & (inf.qid != "all")].set_index("qid").value

    res_pd = res.toPandas()
    qr_pd = qr.toPandas()
    for qid, g in res_pd.groupby("qid"):
        rels = dict(zip(qr_pd[qr_pd.qid == qid].doc_id, qr_pd[qr_pd.qid == qid].rel))
        dcg = sum(
            (2 ** rels[d] - 1) / math.log2(r + 1)
            for d, r in zip(g.doc_id, g["rank"])
            if rels.get(d, 0) > 0
        )
        ideal = sorted(rels.values(), reverse=True)
        idcg = sum(
            (2 ** g_ - 1) / math.log2(i + 2) for i, g_ in enumerate(ideal)
        )
        assert got[qid] == pytest.approx(dcg / idcg, abs=1e-12), qid


def test_half_sample_tracks_truth(spark, synthetic):
    """50% deterministic sample with rate 0.5: estimates within a loose
    tolerance of the full-judgment values (IPW unbiasedness check)."""
    res, qr = synthetic
    full = qr.withColumn("rate", qr.rel * 0 + 1.0)
    samp = qr.filter(qr.doc_id % 2 == 0).withColumn("rate", qr.rel * 0 + 0.5)
    t = evaluate_inferred(res, full).toPandas()
    s = evaluate_inferred(res, samp).toPandas()
    t_all = t[(t.qid == "all")].set_index("metric").value
    s_all = s[(s.qid == "all")].set_index("metric").value
    for m in ("infAP", "infNDCG"):
        assert s_all[m] == pytest.approx(t_all[m], abs=0.15), m
