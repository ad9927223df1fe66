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

from ..functions.positional import (
    od_count_positions,
    od_match_extents,
    uw_count_extents,
    uw_match_extents,
)


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


# ---------------------------------------------------------------------------
# Count-expression evaluation (dumpindex x/dx/e/ef — extent algebra)
# ---------------------------------------------------------------------------

def _child_extents(positional: DataFrame, child, tag: str) -> DataFrame:
    """One #uw child -> (doc_id, {tag}_b array<long>, {tag}_e array<long>):
    the child's match extents per doc. term -> point extents; #odN group
    -> greedy-chain extents (od_match_extents), docs with 0 matches drop
    (inner-join semantics: every child must match)."""
    if child[0] == "term":
        return positional.filter(F.col("term") == child[1]).select(
            "doc_id",
            F.col("positions").cast("array<long>").alias(f"{tag}_b"),
            F.col("positions").cast("array<long>").alias(f"{tag}_e"),
        )
    _, n, terms = child
    parts = [
        positional.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"q{i}")
        )
        for i, t in enumerate(terms)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    k = len(terms)

    def ext_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_b, out_e = [], [], []
            for row in pdf.itertuples(index=False):
                pos = [
                    np.asarray(getattr(row, f"q{i}"), dtype=np.int64)
                    for i in range(k)
                ]
                ext = od_match_extents(pos, n)
                if len(ext):
                    out_doc.append(row.doc_id)
                    out_b.append(ext[:, 0].tolist())
                    out_e.append(ext[:, 1].tolist())
            yield pd.DataFrame(
                {"doc_id": out_doc, f"{tag}_b": out_b, f"{tag}_e": out_e}
            )

    return joined.mapInPandas(
        ext_fn,
        schema=f"doc_id long, {tag}_b array<long>, {tag}_e array<long>",
    )


def expression_matches(positional: DataFrame, tree) -> DataFrame:
    """Count-expression tree (indriql.parse_count_expression) ->
    (doc_id, matches int), matches >= 1 — the backing for `dumpindex`'s
    x/dx/e/ef/efb/fx commands (occuranceCount.cpp:29-47, :94-130,
    :191-210, :245-269).

    Same scale shape as phrase_counts: candidate docs come from posting
    intersections (inner equi-joins on doc_id), kernels run over Arrow
    batches of the survivors only — position arrays never shuffle for
    docs missing any child.
    """
    kind = tree[0]
    if kind == "term":
        return positional.filter(F.col("term") == tree[1]).select(
            "doc_id", F.size("positions").cast("int").alias("matches")
        )
    if kind == "od":
        return phrase_counts(positional, tree[2], tree[1], ordered=True)
    if kind != "uw":
        raise ValueError(f"unknown count-expression node {kind!r}")
    _, n, children = tree
    if all(c[0] == "term" for c in children):
        # flat #uw — reuse the positional uw kernel (n=None -> unlimited)
        width = n if n is not None else (1 << 30)
        return phrase_counts(
            positional, [c[1] for c in children], width, ordered=False
        )
    parts = [
        _child_extents(positional, c, f"c{i}") for i, c in enumerate(children)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    k = len(children)

    def uw_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_m = [], []
            for row in pdf.itertuples(index=False):
                ext = []
                for i in range(k):
                    b = np.asarray(getattr(row, f"c{i}_b"), dtype=np.int64)
                    e = np.asarray(getattr(row, f"c{i}_e"), dtype=np.int64)
                    ext.append(np.stack([b, e], axis=1))
                m = uw_count_extents(ext, n)
                if m > 0:
                    out_doc.append(row.doc_id)
                    out_m.append(m)
            yield pd.DataFrame({"doc_id": out_doc, "matches": out_m})

    return joined.mapInPandas(uw_fn, schema="doc_id long, matches int")


def expression_extents(positional: DataFrame, tree) -> DataFrame:
    """Count-expression tree -> one row PER MATCH EXTENT
    (doc_id, begin, end), Indri's `env.expressionList` shape — the
    `dumpindex e/ef/efb` commands print per-extent results
    (occuranceCount.cpp:245-269, :49-130). ``end`` is the inclusive
    position of the extent's last token. Row counts always equal
    ``expression_matches``'s per-doc `matches` sums (same kernels,
    extent-emitting variants).

    Same scale shape as expression_matches: candidates from posting
    intersections, extent kernels over Arrow batches of survivors."""
    kind = tree[0]
    if kind == "term":
        return positional.filter(F.col("term") == tree[1]).select(
            "doc_id", F.explode("positions").alias("pos")
        ).select(
            "doc_id",
            F.col("pos").cast("long").alias("begin"),
            F.col("pos").cast("long").alias("end"),
        )
    if kind == "od":
        ce = _child_extents(positional, tree, "c0")
        return ce.select(
            "doc_id", F.explode(F.arrays_zip("c0_b", "c0_e")).alias("x")
        ).select(
            "doc_id",
            F.col("x.c0_b").alias("begin"),
            F.col("x.c0_e").alias("end"),
        )
    if kind != "uw":
        raise ValueError(f"unknown count-expression node {kind!r}")
    _, n, children = tree
    parts = [
        _child_extents(positional, c, f"c{i}") for i, c in enumerate(children)
    ]
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    k = len(children)

    def uwx_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_b, out_e = [], [], []
            for row in pdf.itertuples(index=False):
                ext = []
                for i in range(k):
                    b = np.asarray(getattr(row, f"c{i}_b"), dtype=np.int64)
                    e = np.asarray(getattr(row, f"c{i}_e"), dtype=np.int64)
                    ext.append(np.stack([b, e], axis=1))
                w = uw_match_extents(ext, n)
                for bb, ee in w:
                    out_doc.append(row.doc_id)
                    out_b.append(int(bb))
                    out_e.append(int(ee))
            yield pd.DataFrame(
                {"doc_id": out_doc, "begin": out_b, "end": out_e}
            )

    return joined.mapInPandas(
        uwx_fn, schema="doc_id long, begin long, end long"
    )


def expression_matches_batch(positional: DataFrame, trees) -> DataFrame:
    """[(expr_id, tree)] -> (expr_id, doc_id, matches) as ONE unioned
    plan, so an N-expression statement file (`dumpindex fx/ef/efb`,
    occuranceCount.cpp:191-210 batches all lines into one pass) costs
    ONE Spark action instead of a job per line. Each subplan still
    prunes the positional scan to its own terms."""
    outs = [
        expression_matches(positional, t).select(
            F.lit(int(i)).alias("expr_id"), "doc_id", "matches"
        )
        for i, t in trees
    ]
    return reduce(lambda a, b: a.unionByName(b), outs)
