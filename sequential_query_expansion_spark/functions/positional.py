"""Positional (proximity) window operators — Indri `#odN` / `#uwN`.

The reference's structured queries wrap concept names in
`#weight(0.8 #combine(name) 0.1 #combine(#od4 bigrams) 0.1 #uw17(name))`
(umls/umlsSeqPubMed.ipynb:586-593; probe patterns occuranceCount/
statement.txt_e:1 and statement.txt_ef:1-5; evaluated through Indri's
extent iterators, visible via occuranceCount.cpp:245-269).

Semantics implemented here:
  od(terms, N)  — ordered window: an occurrence chain p0 < p1 < ... with
                  every adjacent gap ≤ N (Indri: #odN). Count = number of
                  greedy chains anchored at successive occurrences of
                  terms[0].
  uw(terms, N)  — unordered window: all terms inside a span of ≤ N
                  token positions (Indri: #uwN). Count = number of
                  left-minimal covering windows (extents) of width ≤ N,
                  matching Indri's extent-iterator counting.

Two implementations that agree exactly:
  - pure-Python (`od_count_py` / `uw_count_py`) — oracle + tests
  - Arrow-batched pandas UDFs over token arrays — the engine path; the
    bigram ordered case additionally has a pure column-function variant
    (`bigram_od_count_col`, whole-stage codegen, no Python at all).

These run at BUILD/probe time over `doc_terms` (the forward index); at
query time a `#odN` clause becomes: semi-join docs on all terms (cheap,
posting intersection) THEN the positional check on the survivors only.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _positions(tokens: Sequence[str], term: str) -> np.ndarray:
    return np.asarray(
        [i for i, t in enumerate(tokens) if t == term], dtype=np.int64
    )


def od_count_positions(pos: List[np.ndarray], n: int) -> int:
    """Ordered-window match count from per-term sorted position arrays
    (greedy chaining) — the positional-postings query kernel."""
    if any(len(p) == 0 for p in pos):
        return 0
    count = 0
    for p0 in pos[0]:
        cur = p0
        ok = True
        for p in pos[1:]:
            j = np.searchsorted(p, cur + 1)
            if j >= len(p) or p[j] - cur > n:
                ok = False
                break
            cur = int(p[j])
        if ok:
            count += 1
    return count


def od_count_py(tokens: Sequence[str], terms: Sequence[str], n: int) -> int:
    """Ordered-window match count over a token sequence."""
    return od_count_positions([_positions(tokens, t) for t in terms], n)


def uw_count_py(tokens: Sequence[str], terms: Sequence[str], n: int) -> int:
    """Unordered-window match count: left-minimal covering windows of
    width (inclusive token span) ≤ n. Duplicate query terms collapse to
    their unique set."""
    terms_set = set(terms)
    events = [(i, t) for i, t in enumerate(tokens) if t in terms_set]
    cnt: dict = {}
    have = 0
    res = 0
    left = 0
    for rp, rt in events:
        cnt[rt] = cnt.get(rt, 0) + 1
        if cnt[rt] == 1:
            have += 1
        while have == len(terms_set):
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


def od_count_udf(terms: List[str], n: int):
    """pandas UDF factory: tokens array column -> ordered-window count."""
    terms = list(terms)

    @F.pandas_udf(T.IntegerType())
    def _udf(tok: pd.Series) -> pd.Series:
        return tok.map(
            lambda ts: od_count_py(ts, terms, n) if ts is not None else 0
        )

    return _udf


def uw_count_udf(terms: List[str], n: int):
    terms = list(terms)

    @F.pandas_udf(T.IntegerType())
    def _udf(tok: pd.Series) -> pd.Series:
        return tok.map(
            lambda ts: uw_count_py(ts, terms, n) if ts is not None else 0
        )

    return _udf


def bigram_od_count_col(tokens: Column, a: str, b: str, n: int) -> Column:
    """#odN(a b) for the bigram case with built-ins only: count positions
    of `a` followed by a `b` within n. Matches od_count_py exactly.

    Whole-stage codegen path for the reference's dominant use (#od4 over
    concept-name bigrams, umls :586-589).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - 1, F.lit(0)))
    pos_a = F.filter(idx, lambda i: F.element_at(tokens, i + 1) == a)
    pos_b = F.filter(idx, lambda i: F.element_at(tokens, i + 1) == b)
    return F.when(
        (F.size(pos_a) > 0) & (F.size(pos_b) > 0),
        F.size(
            F.filter(
                pos_a,
                lambda pa: F.exists(
                    pos_b,
                    lambda pb: (pb > pa) & ((pb - pa) <= F.lit(n)),
                ),
            )
        ),
    ).otherwise(F.lit(0))
