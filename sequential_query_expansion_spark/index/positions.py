"""Positional postings: (term, doc_id, positions) — Indri's inverted
file stores per-(term, doc) position lists (occuranceCount.cpp:317-351
prints `(document, num_positions, pos...)`; the format comment is at
:310-315). This table is the query-time backing for `#odN` / `#uwN`
clauses, replacing a full forward-index scan with a postings
intersection:

    phrase candidates = docs containing ALL clause terms
                        (inner joins on doc_id = semi-join pushdown;
                         only matching docs' position arrays move)
    match counting    = od/uw kernels over the joined position arrays,
                        one Arrow batch per partition (mapInPandas)

At 10^12 docs this is the same broadcast-query-side / big-postings-side
shape as the BM25 scoring join; position arrays ride along only for the
(tiny) intersected doc set.
"""

from __future__ import annotations

from functools import reduce
from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.positional import od_count_positions


def build_positional_postings(doc_terms: DataFrame) -> DataFrame:
    """(doc_id, tokens) -> (term, doc_id, positions array<int>), positions
    ascending. One posexplode + groupBy (map-side partial collect)."""
    e = doc_terms.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    return e.groupBy("term", "doc_id").agg(
        F.array_sort(F.collect_list("pos")).alias("positions")
    )


def _uw_from_positions(pos: List[np.ndarray], n: int) -> int:
    """Unordered-window count from per-term sorted position arrays.

    Sparse: merges the position lists into one (position, term_idx) event
    stream and slides the left-minimal-window kernel over it directly —
    O(total occurrences) time and memory, never a dense array of length
    max(position) (long web documents make that dense rebuild O(doc_len)
    per candidate doc). Agrees with ``uw_count_py`` on real token streams
    (distinct terms cannot share a position there).
    """
    k = len(pos)
    if k == 0 or any(len(p) == 0 for p in pos):
        return 0
    events = sorted((int(p), i) for i, arr in enumerate(pos) for p in arr)
    cnt = [0] * k
    have = 0
    res = 0
    left = 0
    for rp, rt in events:
        cnt[rt] += 1
        if cnt[rt] == 1:
            have += 1
        while have == k:
            lp, lt = events[left]
            if cnt[lt] > 1:
                cnt[lt] -= 1
                left += 1
                continue
            if rp - lp + 1 <= n:
                res += 1
            cnt[lt] -= 1
            have -= 1
            left += 1
    return res


def phrase_counts(
    positional: DataFrame,
    terms: List[str],
    n: int,
    ordered: bool = True,
) -> DataFrame:
    """-> (doc_id, matches) for docs with ≥1 `#odN`/`#uwN` match.

    Candidate docs come from the inner joins (posting intersection);
    counting runs batch-wise in one mapInPandas pass.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if not ordered:
        # #uwN semantics collapse duplicate query terms to their unique
        # set (uw_count_py does the same); joining the same term's
        # positions twice would double-count events in the window kernel.
        terms = list(dict.fromkeys(terms))
    parts = [
        positional.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        for i, t in enumerate(terms)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)

    k = len(terms)

    def count_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = []
            for row in pdf.itertuples(index=False):
                pos = [
                    np.asarray(getattr(row, f"p{i}"), dtype=np.int64)
                    for i in range(k)
                ]
                if ordered:
                    counts.append(od_count_positions(pos, n))
                else:
                    counts.append(_uw_from_positions(pos, n))
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "matches": counts}
            )
            yield out[out.matches > 0]

    return joined.mapInPandas(count_fn, schema="doc_id long, matches int")
