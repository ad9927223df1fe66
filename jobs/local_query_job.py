#!/usr/bin/env python
"""No-Spark query runner: the direct IndriRunQuery analogue.

The reference answers a topics file with one long-lived native process
over a memory-mapped index (configs/*/indriRunQuery.cfg; executed at
umls/umlsSeqPubMed.ipynb:31348) — no cluster involvement per query. This
job is that surface for the Spark-built index: plain `python` (NO
spark-submit, no JVM), reads the checkpointed index directory through
``scoring.local.LocalSearcher`` (client-side xxh64 bucket pruning +
term-filtered parquet reads) and writes the same 6-column TREC run file
``jobs/query_job.py`` produces, rank-identically (shared kernels,
shared tokenizer contract).

    python jobs/local_query_job.py --index <index dir> \
        --topics <qid:text file> --output <run file> \
        [--k 1000] [--method bm25|dir|two] [--mu 1600] [--lam 0.4] \
        [--rm3] [--fb-docs 10] [--fb-terms 20] [--orig-weight 0.7] \
        [--indri] [--tag sqe-local] [--names url|doc_id]

``--rm3`` (same flags as jobs/query_job.py) runs the full PRF loop
in-process off the stored forward index (``with_doc_vectors`` stage);
rankings match the Spark job's ``--rm3`` output. ``--indri`` treats
topic text as Indri query-language strings (#weight/#combine/#odN/#uwN)
served through the phrase-clause scorer, matching the Spark job's
``--indri`` output; window operators need the positional stage.
``--indri --rm3`` together run the reference's full configuration —
RM3 PRF over the structured query (fbDocs/fbTerms alongside the
rendered #weight in one cfg) — needing both optional stages.

Spark remains the system of record (build/merge/compact/delete); any
number of these stateless searchers mount the published index read-only.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sequential_query_expansion_spark.functions.text import (  # noqa: E402
    tokenize_py,
)
from sequential_query_expansion_spark.scoring.local import (  # noqa: E402
    LocalSearcher,
)


def read_topics(path: str, sep: str = ":") -> dict[str, str]:
    """`qid:text` lines -> {qid: text} (same contract as
    sources/trec.read_topics_lines)."""
    topics: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if sep not in line:
                continue
            qid, text = line.split(sep, 1)
            if qid:
                topics[qid] = text.strip()
    return topics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--topics", required=True)
    ap.add_argument("--output", required=True,
                    help="run FILE path (written atomically via .tmp)")
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--method", default="bm25",
                    choices=["bm25", "dir", "two"])
    ap.add_argument("--mu", type=float, default=1600.0)
    ap.add_argument("--lam", type=float, default=0.4)
    ap.add_argument("--indri", action="store_true",
                    help="topic text is Indri query language "
                         "(#weight/#combine/#odN/#uwN)")
    ap.add_argument("--rm3", action="store_true")
    ap.add_argument("--fb-docs", type=int, default=10)
    ap.add_argument("--fb-terms", type=int, default=20)
    ap.add_argument("--orig-weight", type=float, default=0.7)
    ap.add_argument("--tag", default="sqe-local")
    ap.add_argument("--names", default="url", choices=["url", "doc_id"],
                    help="document name column for the run file")
    args = ap.parse_args()

    searcher = LocalSearcher(args.index)
    topics = read_topics(args.topics)

    t0 = time.perf_counter()
    if args.indri:
        if args.method != "bm25":
            raise SystemExit("--indri runs the phrase-clause BM25 scorer "
                             "(no --method combination)")
        if args.rm3:
            results = {
                qid: searcher.indri_rm3_topk(
                    text, k=args.k, fb_docs=args.fb_docs,
                    fb_terms=args.fb_terms, orig_weight=args.orig_weight,
                )
                for qid, text in topics.items()
            }
        else:
            results = {
                qid: searcher.indri_topk(text, k=args.k)
                for qid, text in topics.items()
            }
    else:
        queries = {qid: tokenize_py(text) for qid, text in topics.items()}
        if args.rm3:
            if args.method not in ("bm25", "dir"):
                raise SystemExit("--rm3 supports --method bm25 or dir")
            results = {
                qid: searcher.rm3_topk(
                    q, k=args.k, fb_docs=args.fb_docs,
                    fb_terms=args.fb_terms, orig_weight=args.orig_weight,
                    method=args.method, mu=args.mu,
                )
                for qid, q in queries.items()
            }
        elif args.method == "bm25":
            results = searcher.batch_topk(queries, k=args.k)
        else:
            results = searcher.batch_topk(
                queries, k=args.k, method=args.method, mu=args.mu,
                lam=args.lam,
            )
    wall = time.perf_counter() - t0

    names: dict[int, str] = {}
    if args.names == "url":
        all_ids = sorted({d for res in results.values() for d, _ in res})
        names = searcher.urls_for(all_ids)

    tmp = args.output + ".tmp"
    n_rows = 0
    with open(tmp, "w") as f:
        for qid in sorted(results):
            for rank, (doc_id, score) in enumerate(results[qid], 1):
                name = names.get(doc_id, str(doc_id))
                f.write(f"{qid} Q0 {name} {rank} {score:.6f} {args.tag}\n")
                n_rows += 1
    os.replace(tmp, args.output)
    print(
        f"wrote run ({n_rows} rows, {len(results)} queries, "
        f"{wall * 1000:.1f} ms scoring) -> {args.output}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
