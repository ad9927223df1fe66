"""Block-max WAND top-k over the compressed blocked postings.

Reproduces Indri's ranked `#combine` retrieval (the reference executes it
inside IndriRunQuery, umls/umlsSeqPubMed.ipynb:31348; the working-set /
early-termination analogues are occuranceCount.cpp:73-87 and the top-10
probe configs) as the north_star's "BM25 top-k using block-max WAND
posting-list intersection".

Physical shape (what survives 10^12 docs):
- the tiny query-term table is BROADCAST into the blocked postings scan
  (partition pruning on term bucket applies when `postings` is stored
  bucketed by term hash);
- blocks are then re-grouped by (qid, doc-range). Ranges coincide with
  the build's salt ranges, so NO block ever straddles a range boundary —
  each (qid, range) task owns complete postings for its doc span and can
  compute EXACT final scores locally;
- inside a task the kernel works at BLOCK granularity, never per
  posting: doc space is cut at block boundaries; each interval's score
  upper bound is the sum of overlapping blocks' (weight × block-max)
  bounds, computed with one difference-array cumsum. Intervals are
  visited bound-descending; an interval is decoded (varint+delta, numpy)
  only while its bound beats the current top-k floor θ — blocks in
  skipped intervals are never decompressed;
- per-range exact top-k then one global window per qid.

Exactness argument: interval boundaries are block endpoints, so the
interval containing doc d is a sub-span of every block that contains d;
decoding all blocks overlapping the interval yields d's complete score.
A skipped interval has bound < θ ≤ k-th true score, so none of its docs
can enter the top-k. Ties break (score desc, doc_id asc), the same total
order as scoring-join + oracle (SURVEY §7 hard part iii).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import IndexTables, K1, B
from ..index.codec import decode_block


def _wand_kernel(pdf: pd.DataFrame, k: int, n_docs: int, avgdl: float,
                 k1: float, b: float) -> pd.DataFrame:
    """One (qid, range) group: rows (term, weight, df, blocks)."""
    qid = pdf["qid"].iloc[0]

    firsts, lasts, ubs, metas = [], [], [], []
    for row in pdf.itertuples(index=False):
        w = float(row.weight)
        df_g = float(row.df)
        idf = math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
        for blk in row.blocks:
            firsts.append(blk["first_doc"])
            lasts.append(blk["max_doc"])
            ubs.append(w * blk["max_score"])
            metas.append((w, idf, blk))
    if not firsts:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})

    firsts = np.asarray(firsts, dtype=np.int64)
    lasts = np.asarray(lasts, dtype=np.int64)
    ubs = np.asarray(ubs, dtype=np.float64)

    # interval decomposition at block boundaries + difference-array bounds
    bounds_pts = np.unique(np.concatenate([firsts, lasts + 1]))
    n_iv = len(bounds_pts) - 1
    start_iv = np.searchsorted(bounds_pts, firsts)
    end_iv = np.searchsorted(bounds_pts, lasts + 1)          # exclusive
    diff = np.zeros(n_iv + 1, dtype=np.float64)
    np.add.at(diff, start_iv, ubs)
    np.add.at(diff, end_iv, -ubs)
    iv_bound = np.cumsum(diff[:-1])

    # blocks overlapping each interval, via sorted events (vectorized setup,
    # per-interval python only at block granularity). Equal-bound intervals
    # are visited in ascending doc order so the scan is deterministic; the
    # prune below must NOT fire on bound == theta (a tied doc with a smaller
    # doc_id in a later equal-bound interval would beat the current k-th).
    order = np.lexsort((bounds_pts[:-1], -iv_bound))

    heap: list = []          # (score, -doc_id) min-heap of current top-k
    theta = -np.inf
    decoded: dict = {}       # block idx -> (doc_ids, contribs)

    # precompute per-interval overlapping block lists lazily
    iv_blocks: list = [None] * n_iv

    def blocks_for(iv: int):
        if iv_blocks[iv] is None:
            lo, hi = bounds_pts[iv], bounds_pts[iv + 1] - 1
            sel = np.flatnonzero((firsts <= hi) & (lasts >= lo))
            iv_blocks[iv] = sel
        return iv_blocks[iv]

    def decode(bi: int):
        got = decoded.get(bi)
        if got is None:
            w, idf, blk = metas[bi]
            doc_ids, tfs, dls = decode_block(
                blk["docs"], blk["tfs"], blk["dls"], blk["n"]
            )
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            contrib = (
                w * idf * tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
            )
            got = (doc_ids, contrib)
            decoded[bi] = got
        return got

    for iv in order:
        bound = iv_bound[iv]
        # strict <: an interval whose bound EQUALS theta can still hold a doc
        # scoring exactly theta with a smaller doc_id, which wins the
        # (score desc, doc_id asc) tie-break and must be scanned
        if len(heap) >= k and bound < theta:
            break            # bound-descending order → all remaining pruned
        lo, hi = bounds_pts[iv], bounds_pts[iv + 1] - 1
        parts_d, parts_c = [], []
        for bi in blocks_for(iv):
            doc_ids, contrib = decode(bi)
            s = np.searchsorted(doc_ids, lo, side="left")
            e = np.searchsorted(doc_ids, hi, side="right")
            if e > s:
                parts_d.append(doc_ids[s:e])
                parts_c.append(contrib[s:e])
        if not parts_d:
            continue
        alld = np.concatenate(parts_d)
        allc = np.concatenate(parts_c)
        uniq, inv = np.unique(alld, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, allc)
        for d, s in zip(uniq.tolist(), sums.tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    theta = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                theta = heap[0][0]

    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return pd.DataFrame(
        {
            "qid": [qid] * len(out),
            "doc_id": [-d for _, d in out],
            "score": [s for s, _ in out],
        }
    )


def wand_topk(
    index: IndexTables,
    query_terms: DataFrame,
    k: int = 10,
    salt_ranges: int = 8,
    k1: float = K1,
    b: float = B,
    rank_round: int | None = None,
) -> DataFrame:
    """query_terms(qid, term, weight) -> (qid, doc_id, rank, score) via
    block-max WAND over ``index.postings`` (the blocked table).

    ``salt_ranges`` must equal the value used at build time (blocks never
    straddle those ranges). Result is rank-identical to ``score_topk``.
    """
    from pyspark.sql import Window

    if index.postings is None:
        raise ValueError("index has no blocked postings (build_blocked=True)")
    n_docs, avgdl = index.n_docs, float(index.avgdl)
    range_size = max(1, (n_docs + salt_ranges - 1) // salt_ranges)

    qp = index.postings.join(
        F.broadcast(query_terms.select("qid", "term", "weight")), "term"
    )
    # split each term row into its per-range block sublists (ranges are
    # contiguous doc spans; membership decided by block first_doc)
    per_range = qp.select(
        "qid",
        "term",
        "weight",
        "df",
        F.explode(
            F.transform(
                F.array_distinct(
                    F.transform(
                        "blocks",
                        lambda blk: (blk["first_doc"] / F.lit(range_size)).cast("int"),
                    )
                ),
                lambda r: F.struct(
                    r.alias("range"),
                    F.filter(
                        "blocks",
                        lambda blk: (blk["first_doc"] / F.lit(range_size)).cast("int")
                        == r,
                    ).alias("blocks"),
                ),
            )
        ).alias("rb"),
    ).select("qid", "term", "weight", "df", F.col("rb.range").alias("rng"),
             F.col("rb.blocks").alias("blocks"))

    out_schema = "qid string, doc_id long, score double"
    local = per_range.groupBy("qid", "rng").applyInPandas(
        lambda pdf: _wand_kernel(pdf, k, n_docs, avgdl, k1, b),
        schema=out_schema,
    )

    sort_score = (
        F.round("score", rank_round) if rank_round is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "rank", "score")
    )
