"""Streaming ingestion: watermarked URL dedup, quality gates, and the
applyInPandasWithState per-host stats operator (state must survive
across micro-batches)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.streaming import pipeline as pl

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _page(url, text, ts=TS):
    return (url, ts, text.encode(), text, "en")


def _write(spark, rows, path):
    spark.createDataFrame(rows, pl.PAGE_SCHEMA).coalesce(1).write.parquet(path)


GOOD = "the data of and to " + " ".join(f"w{i}" for i in range(20))
SHORT = "tiny doc"                       # fails min_tokens
SPAMMY = " ".join(["the"] * 40)          # fails stopword ratio


def test_quality_ingest_dedup_and_gates(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    _write(spark, [
        _page("https://a.example/1", GOOD),
        _page("https://a.example/2", SHORT),
        _page("https://b.example/1", SPAMMY),
        _page("https://a.example/1", GOOD, TS + dt.timedelta(minutes=1)),  # dup url
    ], os.path.join(in_dir, "drop1"))

    q = pl.start_quality_ingest(spark, in_dir + "/*", out_dir)
    q.awaitTermination(120)

    acc = spark.read.parquet(os.path.join(out_dir, "accepted"))
    urls = sorted(r["url"] for r in acc.select("url").collect())
    # dup collapsed to one row; short + spammy rejected
    assert urls == ["https://a.example/1"]

    # second drop: new url accepted, state-checkpointed stream resumes
    _write(spark, [
        _page("https://c.example/9", GOOD, TS + dt.timedelta(hours=3)),
    ], os.path.join(in_dir, "drop2"))
    q = pl.start_quality_ingest(spark, in_dir + "/*", out_dir)
    q.awaitTermination(120)
    acc = spark.read.parquet(os.path.join(out_dir, "accepted"))
    assert acc.count() == 2


def test_host_stats_state_survives_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    _write(spark, [
        _page("https://a.example/1", GOOD),
        _page("https://a.example/2", SHORT),
        _page("https://b.example/1", GOOD),
    ], os.path.join(in_dir, "drop1"))
    q = pl.start_host_stats(spark, in_dir + "/*", out_dir)
    q.awaitTermination(120)

    _write(spark, [
        _page("https://a.example/3", GOOD),
    ], os.path.join(in_dir, "drop2"))
    q = pl.start_host_stats(spark, in_dir + "/*", out_dir)
    q.awaitTermination(120)

    stats = spark.read.parquet(os.path.join(out_dir, "host_stats"))
    # latest row per host = running totals ACROSS batches
    latest = (
        stats.groupBy("host").agg(
            F.max("n_pages").alias("n_pages"), F.max("n_kept").alias("n_kept")
        )
        .toPandas().set_index("host")
    )
    assert latest.loc["a.example", "n_pages"] == 3     # 2 + 1 across batches
    assert latest.loc["a.example", "n_kept"] == 2      # SHORT rejected
    assert latest.loc["b.example", "n_pages"] == 1
