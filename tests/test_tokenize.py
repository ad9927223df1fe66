"""Tokenizer contract: the three implementations (python / Spark / DuckDB)
must agree byte-for-byte, and extract_text(html) == text per row."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.functions.text import (
    TOKENIZE_SQL_DUCKDB,
    extract_text_py,
    stem_py,
    tokenize_col,
    tokenize_py,
)

CASES = [
    "The quick-brown FOX jumps/over_the \"lazy\" dog's back (twice).",
    "  leading and   trailing   ",
    "",
    "ALL-CAPS_AND_123 numbers42mixed",
    "unicode élève straße",
    "a,b;c.d!e?f:g",
]


def test_python_tokenizer_golden():
    assert tokenize_py(CASES[0]) == [
        "the", "quick", "brown", "fox", "jumps", "over", "the",
        "lazy", "dog", "s", "back", "twice",
    ]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []


@pytest.mark.parametrize("text", CASES)
def test_spark_matches_python(spark, text):
    row = spark.createDataFrame([(text,)], "text string").select(
        tokenize_col(F.col("text")).alias("toks")
    ).collect()[0]
    assert row["toks"] == tokenize_py(text)


@pytest.mark.parametrize("text", CASES)
def test_duckdb_matches_python(text):
    sql = "select " + TOKENIZE_SQL_DUCKDB.format(col="?::varchar") + " as toks"
    got = duckdb.sql(sql.replace("?::varchar", f"'{text}'")).fetchone()[0] \
        if "'" not in text else duckdb.execute(
            "select " + TOKENIZE_SQL_DUCKDB.format(col="$1") + " as toks", [text]
        ).fetchone()[0]
    assert list(got) == tokenize_py(text)


def test_extract_text_invariant(tiny_corpus):
    for _, row in tiny_corpus.pages.iterrows():
        assert extract_text_py(row["html"]) == row["text"]


def test_extract_text_strips_script():
    html = b"<html><script>bad()</script><style>p{}</style><p>keep me</p></html>"
    assert extract_text_py(html) == "keep me"


def test_stemmer_goldens():
    assert stem_py("running") == "run"
    assert stem_py("makes") == "make"
    assert stem_py("cities") == "city"
    assert stem_py("dropped") == "drop"
    assert stem_py("glass") == "glass"
    assert stem_py("is") == "is"
    assert stem_py("basis") == "basis"
