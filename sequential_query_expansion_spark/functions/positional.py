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

from collections import deque
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


def od_match_extents(pos: List[np.ndarray], n: int) -> np.ndarray:
    """(begin, end) extent of every greedy `#odN` chain — the SAME chains
    ``od_count_positions`` counts (len(result) == its count). Indri's
    extent iterators expose these spans (occuranceCount.cpp:245-269
    prints `document weight begin end` per match); the nested-window
    evaluator consumes them as child events."""
    if any(len(p) == 0 for p in pos):
        return np.empty((0, 2), dtype=np.int64)
    out = []
    for p0 in pos[0]:
        cur = int(p0)
        ok = True
        for p in pos[1:]:
            j = int(np.searchsorted(p, cur + 1))
            if j >= len(p) or p[j] - cur > n:
                ok = False
                break
            cur = int(p[j])
        if ok:
            out.append((int(p0), cur))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    return np.asarray(out, dtype=np.int64)


def uw_match_extents(ext: List[np.ndarray], n: int | None) -> np.ndarray:
    """(begin, end) span of every left-minimal `#uw` window that
    ``uw_count_extents`` counts (len(result) == its count): begin = the
    window's leftmost event begin, end = its max event end. Same kernel;
    the counting variant below just takes the length."""
    k = len(ext)
    if k == 0 or any(len(e) == 0 for e in ext):
        return np.empty((0, 2), dtype=np.int64)
    events = sorted(
        (int(b), int(e), i) for i, arr in enumerate(ext) for b, e in arr
    )
    cnt = [0] * k
    have = 0
    out = []
    left = 0
    # monotonic deque of event indices with decreasing end — the window
    # max(end) in O(1) per step instead of rescanning events[left:ri+1]
    # (docs where common terms occur thousands of times made that
    # rescan O(E^2) inside the mapInPandas hot loop)
    maxq: deque = deque()
    for ri, (_, re_, rt) in enumerate(events):
        while maxq and events[maxq[-1]][1] <= re_:
            maxq.pop()
        maxq.append(ri)
        cnt[rt] += 1
        if cnt[rt] == 1:
            have += 1
        while have == k:
            lb, _, lt = events[left]
            if cnt[lt] > 1:
                cnt[lt] -= 1
                if maxq[0] == left:
                    maxq.popleft()
                left += 1
                continue
            if n is None or events[maxq[0]][1] - lb + 1 <= n:
                out.append((lb, int(events[maxq[0]][1])))
            cnt[lt] -= 1
            have -= 1
            if maxq[0] == left:
                maxq.popleft()
            left += 1
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    return np.asarray(out, dtype=np.int64)


def uw_count_extents(ext: List[np.ndarray], n: int | None) -> int:
    """Unordered window over child EXTENTS — `#uw( #4(a b) c ... )`.

    Each child contributes (begin, end) extents; a match is a
    left-minimal set of events (sorted by begin) holding >=1 extent of
    every child whose covering span ``max(end) - min(begin) + 1 <= n``
    (``n=None`` = unlimited, Indri's bare `#uw`). With single-position
    extents this reduces EXACTLY to ``uw_count_py``'s kernel (ends ==
    begins, so the span check is rp - lp + 1)."""
    return int(len(uw_match_extents(ext, n)))


def expression_count_py(tokens: Sequence[str], tree) -> int:
    """Pure-Python oracle for count-expression trees (indriql.
    parse_count_expression shapes): total match count over ONE token
    sequence. Tests pin the distributed evaluator
    (index.positions.expression_matches) against this."""
    kind = tree[0]
    if kind == "term":
        return int(len(_positions(tokens, tree[1])))
    if kind == "od":
        return od_count_py(tokens, tree[2], tree[1])
    if kind == "uw":
        _, n, children = tree
        exts = [expression_extents_py(tokens, c) for c in children]
        return uw_count_extents(exts, n)
    raise ValueError(f"unknown count-expression node {kind!r}")


def expression_extents_py(tokens: Sequence[str], tree) -> np.ndarray:
    """Extents of a term / #odN child node over one token sequence."""
    kind = tree[0]
    if kind == "term":
        p = _positions(tokens, tree[1])
        return np.stack([p, p], axis=1) if len(p) else np.empty((0, 2), np.int64)
    if kind == "od":
        return od_match_extents(
            [_positions(tokens, t) for t in tree[2]], tree[1]
        )
    raise ValueError(f"#uw child must be a term or #odN group, got {kind!r}")


def expression_all_extents_py(tokens: Sequence[str], tree) -> np.ndarray:
    """Pure-Python oracle: (begin, end) extents of ANY count-expression
    tree over one token sequence — terms give point extents, #odN the
    greedy-chain spans, #uw the left-minimal covering windows. Row
    count always equals ``expression_count_py``."""
    kind = tree[0]
    if kind in ("term", "od"):
        return expression_extents_py(tokens, tree)
    if kind == "uw":
        _, n, children = tree
        exts = [expression_extents_py(tokens, c) for c in children]
        return uw_match_extents(exts, n)
    raise ValueError(f"unknown count-expression node {kind!r}")


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
