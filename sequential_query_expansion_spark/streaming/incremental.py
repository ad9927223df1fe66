"""Incremental index build via Structured Streaming.

The reference is batch-only; its incremental story is the repository
merge CLI (`dumpindex m out in1 in2 ...`, occuranceCount.cpp:700-708)
run by hand. Here the same segment→merge design runs continuously:

  readStream(new page files) → foreachBatch:
      tokenize + in-row tf → per-batch posting SEGMENT
      append segment parquet keyed by batch_id   (exactly-once via the
      streaming checkpointLocation — a batch replay overwrites its own
      segment directory, never duplicates)
  compact_segments(): union all segments → the standard salted
      repartition-by-term merge → blocked global index (identical result
      to a from-scratch batch build over the same docs).

At cluster scale the segment store is an Iceberg table and compaction is
an Iceberg rewrite; the parquet layout here mirrors that 1:1. Docs must
arrive with globally-unique doc_id (the warc_ts/url contract of
BASELINE.json gives a natural key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import explode_term_frequencies, tokenize_col
from ..index.build import IndexTables, build_blocked_postings


def _segment_transform(batch: DataFrame) -> DataFrame:
    """docs(doc_id, text) -> (term, doc_id, tf, dl) for one micro-batch —
    the same single-exchange shape as the batch build."""
    toks = batch.select("doc_id", tokenize_col(F.col("text")).alias("tokens"))
    return explode_term_frequencies(toks)


def start_segment_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str,
    transform,
    available_now: bool = True,
    partition_by: tuple = (),
):
    """The ONE copy of the segment-stream scaffolding the text index and
    the ANN index share: readStream(new parquet files) → foreachBatch →
    ``transform(batch_df)`` written (mode=overwrite) to
    ``out_dir``/segments/segment=<batch_id> — a batch replay after
    failure overwrites its own segment dir, never duplicates — with the
    exactly-once bookkeeping in ``out_dir``/_stream_checkpoint. Keeping
    the replay-idempotence plumbing in one place means a checkpoint or
    trigger fix cannot be applied to one family and missed in the
    other. Returns the streaming query."""
    seg_root = os.path.join(out_dir, "segments")
    ckpt = os.path.join(out_dir, "_stream_checkpoint")

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(seg_root, f"segment={batch_id}"))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_build(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = "doc_id long, text string",
    available_now: bool = True,
):
    """Stream new parquet files from ``input_dir`` into posting segments
    under ``out_dir``/segments/segment=<batch_id>. Returns the query."""
    return start_segment_stream(
        spark, input_dir, out_dir, schema, _segment_transform,
        available_now,
    )


def compact_segments(
    spark: SparkSession, out_dir: str, salt_ranges: int = 8,
    build_blocked: bool = True,
) -> IndexTables:
    """Merge all segments into a queryable index (the `dumpindex m`
    analogue): one union + the usual salted term-major merge."""
    seg_root = os.path.join(out_dir, "segments")
    flat = spark.read.option("basePath", seg_root).parquet(
        os.path.join(seg_root, "segment=*")
    ).drop("segment")

    doc_len = flat.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    vocab = flat.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    g = doc_len.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).head()
    n_docs, avgdl = int(g["n"]), float(g["a"] or 0.0)

    blocked = None
    if build_blocked:
        blocked = build_blocked_postings(
            flat, n_docs, avgdl, salt_ranges=salt_ranges
        )
    return IndexTables(
        docmap=doc_len.select(
            "doc_id", F.col("doc_id").cast("string").alias("url")
        ),
        doc_terms=None,
        doc_len=doc_len,
        vocab=vocab,
        postings_flat=flat,
        postings=blocked,
        n_docs=n_docs,
        avgdl=avgdl,
    )
