"""`lr` feature weighting: logistic regression over the 14-feature block
(golden families evals/lr/*) must learn weights that beat the uniform
combine on held-out queries of the hard synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.corpus import make_corpus
from sequential_query_expansion_spark.expansion import concept_graph as cg
from sequential_query_expansion_spark.expansion.train import (
    _map_for_weights,
    lr_labels,
    lr_weights,
)
from sequential_query_expansion_spark.index.build import build_index
from sequential_query_expansion_spark.scoring.bm25 import query_term_table


@pytest.fixture(scope="module")
def setup(spark):
    c = make_corpus(n_docs=800, n_queries=16, seed=5, hard_fraction=0.6)
    idx = build_index(spark.createDataFrame(c.pages).repartition(4))
    qt = query_term_table(spark.createDataFrame(c.queries)).persist()
    u2d = {r["url"]: r["doc_id"] for r in idx.docmap.collect()}
    qrels = spark.createDataFrame(
        c.qrels.assign(doc_id=lambda d: d.url.map(u2d))[["qid", "doc_id", "rel"]]
    ).persist()
    graph = spark.createDataFrame(c.graph_edges)
    feats = cg.concept_features(idx, qt, graph, top_t=10).persist()
    return idx, qt, qrels, feats


def test_lr_beats_uniform_on_held_out(spark, setup):
    idx, qt, qrels, feats = setup
    qids = sorted(r["qid"] for r in qt.select("qid").distinct().collect())
    train_q, test_q = qids[::2], qids[1::2]

    labels = lr_labels(idx, feats, qrels)
    trained = lr_weights(
        feats.filter(F.col("qid").isin(train_q)),
        labels.filter(F.col("qid").isin(train_q)),
    )
    assert set(trained) == set(cg.FEATURES)
    assert any(abs(v) > 1e-6 for v in trained.values())

    held_feats = feats.filter(F.col("qid").isin(test_q))
    held_qt = qt.filter(F.col("qid").isin(test_q))
    held_qrels = qrels.filter(F.col("qid").isin(test_q))
    m_uniform = _map_for_weights(
        idx, held_feats, held_qt, held_qrels, {f: 1.0 for f in cg.FEATURES}
    )
    m_trained = _map_for_weights(
        idx, held_feats, held_qt, held_qrels, trained
    )
    assert m_trained >= m_uniform, (m_trained, m_uniform)


def test_trained_weights_artifact_loads():
    """The checked-in coordinate-ascent run (the reference's
    coordinateAscent/steps.txt analogue) must load and carry every
    feature plus a non-empty step history."""
    import json
    from pathlib import Path

    from sequential_query_expansion_spark.expansion.train import (
        load_trained_weights,
    )

    path = Path(__file__).parents[1] / "artifacts" / "coordinate_ascent_steps.json"
    w = load_trained_weights(str(path))
    assert set(w) == set(cg.FEATURES)
    data = json.loads(path.read_text())
    assert len(data["steps"]) >= len(cg.FEATURES)
    assert data["best_map"] >= max(0.0, data["steps"][0]["map"])


def test_lr_labels_shape(spark, setup):
    idx, qt, qrels, feats = setup
    lab = lr_labels(idx, feats, qrels)
    assert set(lab.columns) >= {"qid", "cand", "label"}
    vals = {r["label"] for r in lab.select("label").distinct().collect()}
    assert vals <= {0.0, 1.0} and len(vals) == 2
    assert lab.count() == feats.select("qid", "cand").distinct().count()
