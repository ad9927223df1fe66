"""Serving-tier LocalSearcher: xxh64 parity, rank-identity, validation.

The searcher (scoring/local.py) must read the exact index Spark wrote
(bucket layout from index/checkpoint.py) and reproduce score_topk /
wand_topk rankings bit-for-bit — it shares their kernel, so any drift
here means the client-side bucket hash or the parquet read is wrong.
"""

import os

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.index.checkpoint import (
    build_index_checkpointed,
)
from sequential_query_expansion_spark.index.xxh64 import (
    spark_xxhash64,
    term_bucket,
)
from sequential_query_expansion_spark.scoring.bm25 import score_topk
from sequential_query_expansion_spark.scoring.local import LocalSearcher
from sequential_query_expansion_spark.webtext import load_documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# inputs chosen to cover every XXH64 tail path: empty, <4B, 4-7B, 8-31B,
# exactly 32B, >32B, multi-byte UTF-8
XXH_CASES = [
    "", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
    "x" * 31, "y" * 32, "z" * 33, "q" * 100,
    "straße", "étude", "日本語テスト", "mixed-ascii-日本語",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(c,) for c in XXH_CASES], "term string")
    rows = df.select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(64)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert spark_xxhash64(r["term"]) == r["h"], r["term"]
        assert term_bucket(r["term"], 64) == r["b"], r["term"]


@pytest.fixture(scope="module", params=["varint", "pfor"])
def disk_index(request, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"srvidx_{request.param}"))
    docs = load_documents(spark, SF_DIR).select("doc_id", "text")
    idx = build_index_checkpointed(
        spark, docs, out, codec=request.param
    )
    return out, idx


def test_local_topk_rank_identical_to_spark(spark, disk_index):
    out_dir, idx = disk_index
    searcher = LocalSearcher(out_dir)

    # multi-term weighted queries incl. absent terms and duplicates
    queries = {
        "q1": {"the": 1.0, "of": 0.5},
        "q2": [("climate", 1.0), ("climate", 1.0), ("energy", 2.0)],
        "q3": ["science", "nosuchterm_zzz"],
    }
    for qid, q in queries.items():
        if isinstance(q, dict):
            rows = [(qid, t, w) for t, w in q.items()]
        else:
            rows = [
                (qid, t, 1.0) if isinstance(t, str) else (qid, t[0], t[1])
                for t in q
            ]
        qt = spark.createDataFrame(rows, "qid string, term string, weight double")
        expect = [
            (r["doc_id"], round(r["score"], 9))
            for r in score_topk(idx, qt, k=10).orderBy("rank").collect()
        ]
        got = [(d, round(s, 9)) for d, s in searcher.topk(q, k=10)]
        assert got == expect, qid


def test_local_topk_all_absent_terms(disk_index):
    out_dir, _ = disk_index
    assert LocalSearcher(out_dir).topk(["nosuchterm_zzz"], k=5) == []


def test_batch_topk_matches_single(disk_index):
    out_dir, _ = disk_index
    s = LocalSearcher(out_dir)
    qs = {"a": ["the"], "b": {"science": 2.0, "the": 1.0}}
    batch = s.batch_topk(qs, k=7)
    for qid, q in qs.items():
        assert batch[qid] == s.topk(q, k=7)


def test_urls_for_roundtrip(spark, disk_index):
    out_dir, idx = disk_index
    s = LocalSearcher(out_dir)
    some = [r["doc_id"] for r in idx.docmap.limit(5).collect()]
    urls = s.urls_for(some)
    expect = {
        r["doc_id"]: r["url"]
        for r in idx.docmap.filter(F.col("doc_id").isin(some)).collect()
    }
    assert urls == expect


def test_searcher_refuses_torn_index(disk_index, tmp_path):
    """The serving tier must hit the same consistency gate as the Spark
    reader: a _COMPACTING sentinel means the index may be mid-rewrite."""
    out_dir, _ = disk_index
    sentinel = os.path.join(out_dir, "_COMPACTING")
    open(sentinel, "w").close()
    try:
        with pytest.raises(ValueError, match="unfinished compact"):
            LocalSearcher(out_dir)
    finally:
        os.remove(sentinel)


def test_term_cache_serves_second_read(disk_index):
    out_dir, _ = disk_index
    s = LocalSearcher(out_dir)
    first = s.topk(["the"], k=5)
    # poison the postings dir path: a cache hit must not re-read disk
    s._postings_dir = os.path.join(out_dir, "_does_not_exist")
    assert s.topk(["the"], k=5) == first
