"""Positional postings: phrase counts from the index must equal the
forward-index window kernels doc by doc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.functions.positional import (
    od_count_py,
    uw_count_py,
)
from sequential_query_expansion_spark.index.positions import (
    build_positional_postings,
    phrase_counts,
)

DOCS = [
    (0, "a b c a b".split()),
    (1, "a c c c b".split()),
    (2, "b a".split()),
    (3, "x a y b z c".split()),
    (4, "a a a".split()),
    (5, "c b a c b a".split()),
]


@pytest.fixture(scope="module")
def positional(spark):
    dt = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    return build_positional_postings(dt).persist()


def test_positions_table_shape(positional):
    rows = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in positional.collect()
    }
    assert rows[("a", 0)] == [0, 3]
    assert rows[("b", 5)] == [1, 4]
    assert ("x", 3) in rows


@pytest.mark.parametrize("terms,n,ordered", [
    (["a", "b"], 1, True),
    (["a", "b"], 4, True),
    (["a", "b"], 4, False),
    (["a", "b", "c"], 3, True),
    (["a", "b", "c"], 6, False),
])
def test_phrase_counts_match_forward_scan(positional, terms, n, ordered):
    got = {
        r["doc_id"]: r["matches"]
        for r in phrase_counts(positional, terms, n, ordered=ordered).collect()
    }
    for doc_id, tokens in DOCS:
        want = (
            od_count_py(tokens, terms, n)
            if ordered
            else uw_count_py(tokens, terms, n)
        )
        assert got.get(doc_id, 0) == want, (doc_id, terms, n, ordered)


def test_contract_paths_agree(spark):
    from sequential_query_expansion_spark import driver_contract as dc

    sf = "/root/testdata/sf0.001"
    a = (
        dc.q_od_bigram_counts(spark, sf)
        .orderBy("a", "b")
        .collect()
    )
    b = (
        dc.q_od_bigram_postings(spark, sf)
        .orderBy("a", "b")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
