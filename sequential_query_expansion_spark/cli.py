"""Index-access CLI — the `occuranceCount`/`dumpindex` analogue.

The reference's entry point 3 (occuranceCount.cpp:756-865 `main`)
dispatches single-letter commands over a read-only repository. Same
surface here over a checkpointed index directory (index/checkpoint.py
layout), as DataFrame one-liners:

  t  <term>        term stats: df, cf                 (cpp :471-507)
  e  <term...>     expression count over docs (AND)   (cpp :29-47)
  dcf <doc_id>     document length                    (cpp :125-150)
  dn <doc_id>      doc id -> external name            (cpp :525-536)
  di <url>         external name -> doc id            (cpp :538-549)
  dv <doc_id>      document vector (term sequence absent — stems only
                   via postings)                      (cpp :631-663)
  il [term]        inverted list dump                 (cpp :317-351)
  v                vocabulary dump                    (cpp :357-378)
  s                repository stats                   (cpp :678-698)
  vtl              validate: Σtf per doc == dl; Σdf == distinct pairs
                                                      (cpp :276-308)
  q  <text>        BM25 top-10 for an ad-hoc query
  del <id...>      tombstone documents (S14 delete; cpp :710-723)
  compact [codec]  apply tombstones + rewrite (S14 compact); codec =
                   pfor (default, serving-optimized) or varint

Usage: python -m sequential_query_expansion_spark.cli <index_dir> <cmd> [args]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from .index.checkpoint import load_index
from .scoring.bm25 import query_term_table, score_topk
from .session import get_spark


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 2
    index_dir, cmd, *args = argv
    spark = get_spark("sqe-cli")

    if cmd == "del":
        from .index.maintenance import delete_docs

        delete_docs(spark, index_dir, [int(a) for a in args])
        print(f"tombstoned {len(args)} docs (run `compact` to apply)")
        return 0
    if cmd == "compact":
        from .index.maintenance import compact_index

        codec = args[0] if args else "pfor"
        idx = compact_index(spark, index_dir, codec=codec)
        print(f"compacted ({codec}); {idx.n_docs} docs remain")
        return 0

    idx = load_index(spark, index_dir)

    if cmd == "t":
        idx.vocab.filter(F.col("term") == args[0]).show()
    elif cmd == "e":
        hits = idx.postings_flat.filter(F.col("term").isin(args)).groupBy(
            "doc_id"
        ).agg(F.count("*").alias("n")).filter(F.col("n") == len(set(args)))
        print(f"{' '.join(args)}:{hits.count()}")
    elif cmd == "dcf":
        idx.doc_len.filter(F.col("doc_id") == int(args[0])).show()
    elif cmd == "dn":
        idx.docmap.filter(F.col("doc_id") == int(args[0])).show(truncate=False)
    elif cmd == "di":
        idx.docmap.filter(F.col("url") == args[0]).show(truncate=False)
    elif cmd == "dv":
        (
            idx.postings_flat.filter(F.col("doc_id") == int(args[0]))
            .orderBy("term")
            .show(100, truncate=False)
        )
    elif cmd == "il":
        df = idx.postings_flat
        if args:
            df = df.filter(F.col("term") == args[0])
        df.orderBy("term", "doc_id").show(50)
    elif cmd == "v":
        idx.vocab.orderBy("term").show(100)
        tot = idx.vocab.agg(F.sum("cf"), F.count("*")).head()
        print(f"TOTAL:{tot[0]}:{tot[1]}")
    elif cmd == "s":
        print(
            f"documents:\t{idx.n_docs}\n"
            f"unique terms:\t{idx.vocab.count()}\n"
            f"total terms:\t{idx.vocab.agg(F.sum('cf')).head()[0]}\n"
            f"avgdl:\t{idx.avgdl:.4f}"
        )
    elif cmd == "vtl":
        bad_dl = (
            idx.postings_flat.groupBy("doc_id")
            .agg(F.sum("tf").alias("tf_sum"))
            .join(idx.doc_len, "doc_id")
            .filter(F.col("tf_sum") != F.col("dl"))
            .count()
        )
        pairs = idx.postings_flat.select("term", "doc_id").distinct().count()
        df_sum = idx.vocab.agg(F.sum("df")).head()[0]
        ok = bad_dl == 0 and pairs == df_sum
        print(f"doc-length mismatches: {bad_dl}")
        print(f"sum(df)={df_sum} distinct(term,doc)={pairs}")
        print("VALID" if ok else "INVALID")
        return 0 if ok else 1
    elif cmd == "q":
        queries = spark.createDataFrame(
            [("cli", " ".join(args))], "qid string, text string"
        )
        score_topk(idx, query_term_table(queries), k=10).orderBy("rank").show(
            truncate=False
        )
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
