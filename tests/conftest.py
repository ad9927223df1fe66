from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sequential_query_expansion_spark.corpus import make_corpus  # noqa: E402
from sequential_query_expansion_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sqe-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    return make_corpus(n_docs=300, n_queries=12, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus.pages).repartition(4).persist()


@pytest.fixture(scope="session")
def index_tables(pages_df):
    from sequential_query_expansion_spark.index.build import build_index

    return build_index(pages_df, build_blocked=True, salt_ranges=4)


@pytest.fixture(scope="session")
def oracle_index(tiny_corpus):
    from sequential_query_expansion_spark.oracle import build_index as oracle_build

    pages = tiny_corpus.pages.sort_values("url")  # engine ids = url sort order
    return oracle_build(pages.url.tolist(), pages.text.tolist())
