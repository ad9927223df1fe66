"""Phrase-clause scoring (#odN / #uwN as scoring sub-expressions):
rank-identity vs the pure-Python oracle, plus sparse-uw-kernel and
duplicate-term regressions."""

from __future__ import annotations

import random

import numpy as np
import pytest

from sequential_query_expansion_spark.functions.positional import (
    od_count_py,
    uw_count_py,
)
from sequential_query_expansion_spark.functions.text import tokenize_py
from sequential_query_expansion_spark.index.positions import (
    _uw_from_positions,
    build_positional_postings,
    phrase_counts,
)
from sequential_query_expansion_spark import oracle
from sequential_query_expansion_spark.scoring.phrase import (
    concept_query_topk,
    default_uw_n,
    render_concept_clauses,
)

# frequent Zipf terms → phrase windows genuinely match in the corpus
CONCEPTS = {
    "c1": "term00000 term00001",
    "c2": "term00002 term00000 term00004",
    "c3": "term00003",
}


@pytest.fixture(scope="module")
def positional(index_tables):
    return build_positional_postings(index_tables.doc_terms).persist()


@pytest.fixture(scope="module")
def doc_tokens(tiny_corpus):
    pages = tiny_corpus.pages.sort_values("url")  # engine doc_id order
    return {i: tokenize_py(t) for i, t in enumerate(pages.text.tolist())}


def test_phrase_topk_rank_identical_to_oracle(
    spark, index_tables, oracle_index, positional, doc_tokens
):
    k = 10
    got = (
        concept_query_topk(
            spark, index_tables, positional, CONCEPTS, k=k, rank_round=9
        )
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    term_rows, phrase_rows = render_concept_clauses(sorted(CONCEPTS.items()))
    want = oracle.phrase_weighted_topk(
        oracle_index, doc_tokens, term_rows, phrase_rows, k=k
    )
    for qid in CONCEPTS:
        g = got[got.qid == qid]
        w = want.get(qid, [])
        assert list(g.doc_id) == [d for d, _ in w], qid
        assert np.allclose(g.score, [s for _, s in w], atol=1e-9), qid


def test_phrase_clauses_actually_contribute(
    spark, index_tables, positional, doc_tokens
):
    """The od/uw clauses must change scores vs terms-only scoring —
    i.e. at least one phrase clause has real matches in the corpus."""
    term_rows, phrase_rows = render_concept_clauses(sorted(CONCEPTS.items()))
    any_match = any(
        (od_count_py if ordered else uw_count_py)(toks, terms, n) > 0
        for _, _, terms, n, ordered, _ in phrase_rows
        for toks in doc_tokens.values()
    )
    assert any_match, "corpus has no phrase matches; concepts too rare"


def test_render_weights():
    term_rows, phrase_rows = render_concept_clauses([("q", "a b c")])
    assert [(r[1], r[2]) for r in term_rows] == [
        ("a", pytest.approx(0.8 / 3)),
        ("b", pytest.approx(0.8 / 3)),
        ("c", pytest.approx(0.8 / 3)),
    ]
    ods = [r for r in phrase_rows if r[4]]
    uws = [r for r in phrase_rows if not r[4]]
    assert [(r[2], r[3], r[5]) for r in ods] == [
        (["a", "b"], 4, pytest.approx(0.05)),
        (["b", "c"], 4, pytest.approx(0.05)),
    ]
    assert [(r[2], r[3], r[5]) for r in uws] == [
        (["a", "b", "c"], default_uw_n(3), pytest.approx(0.1))
    ]
    # single-term phrase degenerates to the bare term at full weight
    t1, p1 = render_concept_clauses([("q", "solo")])
    assert t1 == [("q", "solo", 1.0)] and p1 == []


def test_sparse_uw_kernel_matches_dense_oracle():
    """The sparse event-stream kernel must equal uw_count_py on random
    token streams (the dense rebuild it replaced)."""
    rng = random.Random(7)
    alphabet = ["a", "b", "c", "x"]
    for _ in range(200):
        toks = [rng.choice(alphabet) for _ in range(rng.randint(0, 60))]
        terms = rng.sample(["a", "b", "c"], rng.randint(1, 3))
        n = rng.randint(2, 12)
        pos = [
            np.asarray(
                [i for i, t in enumerate(toks) if t == term], dtype=np.int64
            )
            for term in terms
        ]
        assert _uw_from_positions(pos, n) == uw_count_py(toks, terms, n), (
            toks, terms, n,
        )


def test_phrase_counts_duplicate_terms_uw(spark, index_tables, positional):
    """#uwN with a duplicated term must equal the deduplicated query
    (regression: the old dense kernel returned 0 for such queries)."""
    t = "term00000"
    a = phrase_counts(positional, [t], 5, ordered=False).toPandas()
    b = phrase_counts(positional, [t, t], 5, ordered=False).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.matches) == list(b.matches)
