"""Stemming stage (X5): engine and oracle agree with stemming enabled,
on a corpus where the stemmer actually fires (plural/ing/ed forms)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sequential_query_expansion_spark import oracle
from sequential_query_expansion_spark.functions.text import stem_py, tokenize_py
from sequential_query_expansion_spark.index.build import build_index
from sequential_query_expansion_spark.scoring.bm25 import (
    query_term_table,
    score_topk,
)

DOCS = [
    "cats running quickly through houses",
    "the cat runs and jumps over fences",
    "he makes tables while she made chairs",
    "running shoes for runners who run races",
    "a house of cards crashed when winds blew",
    "fence posts and table legs were repaired",
    "she jumped the fences chasing cats",
    "crashes happen when racing cars slide",
]


def test_stemmer_changes_tokens():
    assert stem_py("cats") == "cat"
    assert stem_py("running") == "run"
    assert stem_py("houses") == "house"
    assert stem_py("made") == "made"  # irregulars untouched (rule subset)


def test_stemmed_topk_rank_identical(spark):
    pages = pd.DataFrame(
        {
            "url": [f"u{i:03d}" for i in range(len(DOCS))],
            "text": DOCS,
        }
    )
    idx = build_index(spark.createDataFrame(pages).repartition(2), stem=True)
    oidx = oracle.build_index(
        pages.url.tolist(), pages.text.tolist(), stem=True
    )
    assert idx.n_docs == oidx.n_docs
    # vocab must be the stemmed vocabulary on both sides
    got_vocab = {r["term"]: (r["df"], r["cf"]) for r in idx.vocab.collect()}
    assert got_vocab == oidx.vocab

    raw_queries = {"q1": "running cat", "q2": "fences crashed", "q3": "tables"}
    # both sides stem the query terms (reference stems queries via Indri
    # processTerm before building configs)
    stemmed = {
        q: " ".join(stem_py(t) for t in tokenize_py(text))
        for q, text in raw_queries.items()
    }
    qdf = spark.createDataFrame(
        sorted(stemmed.items()), "qid string, text string"
    )
    got = (
        score_topk(idx, query_term_table(qdf), k=8)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    for qid, text in stemmed.items():
        want = oracle.bm25_topk(oidx, text.split(), k=8)
        sub = got[got.qid == qid]
        assert list(sub.doc_id) == [d for d, _ in want], qid
        assert np.allclose(sub.score, [s for _, s in want], atol=1e-9), qid
