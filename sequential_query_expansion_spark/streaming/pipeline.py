"""Streaming ingestion pipeline: watermarked dedup + quality gates +
custom stateful per-host statistics.

The reference ingests corpora as batch files; a 10^12-doc crawl arrives
continuously. This module is the Structured-Streaming front of the
engine, upstream of the incremental segment build
(``streaming/incremental.py``):

  readStream(pages) → withWatermark(warc_ts)
    → dropDuplicatesWithinWatermark(url)     # re-crawled URLs collapse
    → quality gates (built-in column algebra, same exprs as
      operators/text_analysis.quality_score)
    → sink: accepted pages parquet (feeds the segment build)

plus ``start_host_stats`` — a CUSTOM STATEFUL operator via
applyInPandasWithState: running per-host page count / accept count /
mean doc length, maintained across micro-batches with GroupState. The
state payload is a few numbers per host — the canonical bounded-state
shape (host cardinality ≪ page cardinality).

Scale notes: dropDuplicatesWithinWatermark keys state by url within the
watermark window only (bounded); the quality gates are stateless
whole-stage-codegen; per-host state shuffles one row per (batch, host).
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import tokenize_col
from ..operators.text_analysis import QUALITY_STOPWORDS

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def quality_gate_cols(df: DataFrame, min_tokens: int = 10,
                      max_stopword_ratio: float = 0.5) -> DataFrame:
    """Append (n_tokens, stopword_ratio, keep) — stateless, streamable."""
    toks = tokenize_col(F.col("text"))
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(QUALITY_STOPWORDS)))
    ratio = F.when(n > 0, sw.cast("double") / n).otherwise(0.0)
    return (
        df.withColumn("n_tokens", n)
        .withColumn("stopword_ratio", ratio)
        .withColumn(
            "keep",
            (F.col("n_tokens") >= min_tokens)
            & (F.col("stopword_ratio") <= max_stopword_ratio),
        )
    )


def start_quality_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    watermark: str = "1 hour",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.5,
    available_now: bool = True,
):
    """Stream page files → watermarked URL dedup → quality gates →
    ``out_dir``/accepted (kept pages) with per-batch exactly-once via
    the checkpointLocation. Returns the streaming query."""
    ckpt = os.path.join(out_dir, "_ingest_checkpoint")
    accepted = os.path.join(out_dir, "accepted")

    stream = (
        spark.readStream.schema(PAGE_SCHEMA).parquet(input_dir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    gated = quality_gate_cols(stream, min_tokens, max_stopword_ratio)
    kept = gated.filter(F.col("keep")).drop("keep")

    writer = (
        kept.writeStream.format("parquet")
        .option("path", accepted)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_HOST_STATE_SCHEMA = "n_pages long, n_kept long, sum_tokens double"
_HOST_OUT_SCHEMA = (
    "host string, n_pages long, n_kept long, mean_tokens double"
)


def _host_stats_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-host counters — the applyInPandasWithState kernel.
    State = (n_pages, n_kept, sum_tokens); emits the updated totals once
    per micro-batch."""
    if state.exists:
        n_pages, n_kept, sum_tokens = state.get
    else:
        n_pages, n_kept, sum_tokens = 0, 0, 0.0
    for pdf in pdfs:
        n_pages += len(pdf)
        n_kept += int(pdf["keep"].sum())
        sum_tokens += float(pdf["n_tokens"].sum())
    state.update((n_pages, n_kept, sum_tokens))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_pages": [n_pages],
            "n_kept": [n_kept],
            "mean_tokens": [sum_tokens / n_pages if n_pages else 0.0],
        }
    )


def start_host_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Custom stateful streaming operator: watermarked URL dedup, then
    per-host running ingest statistics via applyInPandasWithState
    (GroupState survives across micro-batches; output sink keeps the
    latest row per host per batch). Two chained stateful operators —
    dedup state keyed by url, counter state keyed by host."""
    # v2: the dedup stage changed the stateful-operator graph, which a
    # v1 checkpoint cannot resume (Spark refuses state-graph changes) —
    # a fresh checkpoint path makes the upgrade an explicit re-bootstrap
    # instead of a StreamingQueryException on restart
    ckpt = os.path.join(out_dir, "_hoststats_checkpoint_v2")
    sink = os.path.join(out_dir, "host_stats")

    stream = (
        spark.readStream.schema(PAGE_SCHEMA).parquet(input_dir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    gated = quality_gate_cols(stream).withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    )
    stats = gated.select("host", "n_tokens", "keep").groupBy("host").applyInPandasWithState(
        _host_stats_fn,
        outputStructType=_HOST_OUT_SCHEMA,
        stateStructType=_HOST_STATE_SCHEMA,
        # "append" operator mode: each batch appends one running-total row
        # per touched host (a parquet sink cannot consume update mode);
        # readers take the max per host for current totals
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        stats.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
