"""Pure-Python reference engine (the correctness oracle).

A ~200-line dict-based inverted index with exact BM25, RM1/RM3 expansion,
and TREC metrics. The Spark engine must be rank-identical to this on the
synthetic corpus (tolerance 1e-9, tie-break (score desc, doc_id asc)) —
this mirrors the reference's golden-eval methodology (its checked-in
evals/ files) with an executable oracle instead of frozen files.

Semantics being reproduced (reference citations):
- collection stats cf/df      — occuranceCount.cpp:29-47 (expressionCount /
                                documentExpressionCount), :678-698 (stats)
- doc length                  — occuranceCount.cpp:125-150 (dcf)
- top-k ranked retrieval      — Indri #combine + <count>k (configs/*)
  ...rescored with BM25 per BASELINE.json north_rule.
- RM3 PRF                     — Indri fbDocs/fbTerms (umls/umlsSeqPubMed
                                .ipynb:602-603), rebuilt as RM1/RM3.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence, Tuple

from .functions.text import stem_py, tokenize_py

# BM25 parameters (table-driven; Robertson k1/b defaults).
K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    """Lucene-style non-negative BM25 idf."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term(tf: int, dl: int, avgdl: float, n_docs: int, df: int,
              k1: float = K1, b: float = B) -> float:
    return idf(n_docs, df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class OracleIndex:
    postings: Dict[str, Dict[int, int]]   # term -> {doc_id: tf}
    doc_len: Dict[int, int]
    n_docs: int
    avgdl: float
    docmap: Dict[int, str]                # doc_id -> url

    @property
    def vocab(self) -> Dict[str, Tuple[int, int]]:
        """term -> (df, cf)"""
        return {
            t: (len(d), sum(d.values())) for t, d in self.postings.items()
        }


def build_index(urls: Sequence[str], texts: Sequence[str], stem: bool = False) -> OracleIndex:
    """doc_ids are assigned 0..n-1 in input order (the Spark build matches
    this by sorting urls within deterministic partitions; tests feed both
    engines the same ordering)."""
    postings: Dict[str, Dict[int, int]] = defaultdict(dict)
    doc_len: Dict[int, int] = {}
    docmap: Dict[int, str] = {}
    for doc_id, (url, text) in enumerate(zip(urls, texts)):
        toks = tokenize_py(text)
        if stem:
            toks = [stem_py(t) for t in toks]
        doc_len[doc_id] = len(toks)
        docmap[doc_id] = url
        for term, tf in Counter(toks).items():
            postings[term][doc_id] = tf
    n = len(doc_len)
    avgdl = (sum(doc_len.values()) / n) if n else 0.0
    return OracleIndex(dict(postings), doc_len, n, avgdl, docmap)


def bm25_topk(
    index: OracleIndex,
    query_terms: Iterable[str],
    k: int = 10,
    weights: Dict[str, float] | None = None,
    k1: float = K1,
    b: float = B,
) -> List[Tuple[int, float]]:
    """Exact BM25 top-k; OR semantics over query terms; duplicate query
    terms accumulate (weight 1 each) exactly like the Spark scoring join.
    Total order: (score desc, doc_id asc)."""
    scores: Dict[int, float] = defaultdict(float)
    for term in query_terms:
        plist = index.postings.get(term)
        if not plist:
            continue
        w = 1.0 if weights is None else weights.get(term, 1.0)
        df = len(plist)
        for doc_id, tf in plist.items():
            scores[doc_id] += w * bm25_term(
                tf, index.doc_len[doc_id], index.avgdl, index.n_docs, df, k1, b
            )
        # OOV terms contribute nothing (idf of df=0 never reached)
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def dirichlet_topk(
    index: OracleIndex,
    query_terms: Iterable[str],
    k: int = 10,
    mu: float = 1600.0,
    weights: Dict[str, float] | None = None,
) -> List[Tuple[int, float]]:
    """Exact Dirichlet query-likelihood top-k (Indri method:dir), same
    decomposition as scoring/lm.py: matched sum + W_q doc-length prior;
    only docs matching >= 1 in-vocabulary query term are scored."""
    vocab = index.vocab
    c_total = float(sum(cf for _, cf in vocab.values()))
    terms = list(query_terms)
    in_vocab = [t for t in terms if t in index.postings]
    w_q = sum(
        (1.0 if weights is None else weights.get(t, 1.0)) for t in terms
    )
    matched: Dict[int, float] = defaultdict(float)
    for term in in_vocab:
        w = 1.0 if weights is None else weights.get(term, 1.0)
        cf = vocab[term][1]
        for doc_id, tf in index.postings[term].items():
            matched[doc_id] += w * math.log(1.0 + tf * c_total / (mu * cf))
    scores = {
        d: m + w_q * math.log(mu / (index.doc_len[d] + mu))
        for d, m in matched.items()
    }
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def two_stage_topk(
    index: OracleIndex,
    query_terms: Iterable[str],
    k: int = 10,
    mu: float = 1600.0,
    lam: float = 0.4,
    weights: Dict[str, float] | None = None,
) -> List[Tuple[int, float]]:
    """Exact two-stage smoothing top-k (Indri method:two), mirroring
    scoring/lm.py::two_stage_topk: candidates are docs matching >= 1
    in-vocabulary query term; every in-vocabulary term contributes
    (tf = 0 when absent); OOV terms are dropped like Indri does."""
    vocab = index.vocab
    c_total = float(sum(cf for _, cf in vocab.values()))
    in_vocab = [t for t in query_terms if t in index.postings]
    cands: set = set()
    for t in in_vocab:
        cands.update(index.postings[t].keys())
    scores: Dict[int, float] = {}
    for d in cands:
        dl = index.doc_len[d]
        s = 0.0
        for t in in_vocab:
            w = 1.0 if weights is None else weights.get(t, 1.0)
            p_t = vocab[t][1] / c_total
            tf = index.postings[t].get(d, 0)
            s += w * math.log(
                (1.0 - lam) * (tf + mu * p_t) / (dl + mu) + lam * p_t
            )
        scores[d] = s
    ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def phrase_weighted_topk(
    index: OracleIndex,
    doc_tokens: Dict[int, List[str]],
    term_clauses: Sequence[Tuple[str, str, float]],
    phrase_clauses: Sequence[Tuple[str, str, List[str], int, bool, float]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> Dict[str, List[Tuple[int, float]]]:
    """Oracle for the reference's structured concept scoring
    `#weight(0.8 #combine(name) 0.1 #combine(#odN ..) 0.1 #uwN(name))`
    (umls/umlsSeqPubMed.ipynb:555-633): phrase clauses are pseudo-terms
    with tf = window match count, df = docs with ≥1 match.

    term_clauses: (qid, term, weight); phrase_clauses:
    (qid, clause_id, terms, n, ordered, weight). Returns
    {qid: [(doc_id, score)] top-k, (score desc, doc_id asc)}."""
    from .functions.positional import od_count_py, uw_count_py

    scores: Dict[Tuple[str, int], float] = defaultdict(float)
    for qid, term, w in term_clauses:
        plist = index.postings.get(term)
        if not plist:
            continue
        df = len(plist)
        for doc_id, tf in plist.items():
            scores[(qid, doc_id)] += w * bm25_term(
                tf, index.doc_len[doc_id], index.avgdl, index.n_docs, df, k1, b
            )
    for qid, _cid, terms, n, ordered, w in phrase_clauses:
        counts: Dict[int, int] = {}
        for doc_id, toks in doc_tokens.items():
            c = (od_count_py if ordered else uw_count_py)(toks, terms, n)
            if c > 0:
                counts[doc_id] = c
        df = len(counts)
        for doc_id, tf in counts.items():
            scores[(qid, doc_id)] += w * bm25_term(
                tf, index.doc_len[doc_id], index.avgdl, index.n_docs, df, k1, b
            )
    by_qid: Dict[str, List[Tuple[int, float]]] = defaultdict(list)
    for (qid, doc_id), s in scores.items():
        by_qid[qid].append((doc_id, s))
    return {
        qid: sorted(docs, key=lambda x: (-x[1], x[0]))[:k]
        for qid, docs in by_qid.items()
    }


# ---------------------------------------------------------------------------
# RM1 / RM3 pseudo-relevance feedback
# ---------------------------------------------------------------------------

def rm3_expand(
    index: OracleIndex,
    query_terms: Sequence[str],
    fb_docs: int = 10,
    fb_terms: int = 20,
    orig_weight: float = 0.5,
    k1: float = K1,
    b: float = B,
    method: str = "bm25",
    mu: float = 1600.0,
) -> Dict[str, float]:
    """RM3: estimate P(t|R) from the top-R feedback docs of the unexpanded
    run (doc weight = normalized BM25 score, or a softmax over Dirichlet
    LOG-QL scores when method="dir"; term weight within doc = tf/dl),
    keep top fb_terms, interpolate with the original query's uniform ML
    estimate. Deterministic tie-breaks: (-weight, term).
    """
    if method == "dir":
        w = {t: float(c) for t, c in Counter(query_terms).items()}
        top = dirichlet_topk(
            index, sorted(w), k=fb_docs, mu=mu, weights=w
        )
        if not top:
            return {t: 1.0 / len(query_terms) for t in query_terms}
        mx = max(s for _, s in top)
        exps = [(d, math.exp(s - mx)) for d, s in top]
        z = sum(e for _, e in exps)
        fb = {d: e / z for d, e in exps}
    else:
        top = bm25_topk(index, query_terms, k=fb_docs, k1=k1, b=b)
        if not top:
            return {t: 1.0 / len(query_terms) for t in query_terms}
        total_score = sum(s for _, s in top)
        if total_score <= 0:
            return {t: 1.0 / len(query_terms) for t in query_terms}
        fb = {doc_id: score / total_score for doc_id, score in top}

    rm1: Dict[str, float] = defaultdict(float)
    # invert: iterate term->postings once, probe feedback docs (matches the
    # Spark semi-join of doc_terms against the feedback doc set)
    for term, plist in index.postings.items():
        for doc_id, w_doc in fb.items():
            tf = plist.get(doc_id)
            if tf:
                rm1[term] += w_doc * tf / index.doc_len[doc_id]

    top_terms = sorted(rm1.items(), key=lambda x: (-x[1], x[0]))[:fb_terms]
    z = sum(w for _, w in top_terms)
    rm1_n = {t: w / z for t, w in top_terms}

    orig = Counter(query_terms)
    n_q = sum(orig.values())
    out: Dict[str, float] = defaultdict(float)
    for t, c in orig.items():
        out[t] += orig_weight * c / n_q
    for t, w in rm1_n.items():
        out[t] += (1.0 - orig_weight) * w
    return dict(out)


# ---------------------------------------------------------------------------
# TREC metrics (trec_eval semantics for map / P@k / ndcg / recip_rank)
# ---------------------------------------------------------------------------

def average_precision(ranked_docs: Sequence[int], rel: set) -> float:
    if not rel:
        return 0.0
    hits = 0
    s = 0.0
    for i, d in enumerate(ranked_docs, start=1):
        if d in rel:
            hits += 1
            s += hits / i
    return s / len(rel)


def precision_at(ranked_docs: Sequence[int], rel: set, k: int) -> float:
    return sum(1 for d in ranked_docs[:k] if d in rel) / k


def ndcg_at(ranked_docs: Sequence[int], rel_grades: Dict[int, int], k: int) -> float:
    dcg = 0.0
    for i, d in enumerate(ranked_docs[:k], start=1):
        g = rel_grades.get(d, 0)
        if g > 0:
            dcg += (2 ** g - 1) / math.log2(i + 1)
    ideal = sorted(rel_grades.values(), reverse=True)[:k]
    idcg = sum((2 ** g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, start=1))
    return dcg / idcg if idcg > 0 else 0.0


def reciprocal_rank(ranked_docs: Sequence[int], rel: set) -> float:
    for i, d in enumerate(ranked_docs, start=1):
        if d in rel:
            return 1.0 / i
    return 0.0


def r_precision(ranked_docs: Sequence[int], rel: set) -> float:
    if not rel:
        return 0.0
    r = len(rel)
    return sum(1 for d in ranked_docs[:r] if d in rel) / r


def bpref(ranked_docs: Sequence[int], rel: set, nonrel: set) -> float:
    """trec_eval bpref: judged-nonrelevant docs ranked above each
    retrieved relevant doc penalize it; contribution 1 when there are no
    judged nonrelevant."""
    if not rel:
        return 0.0
    r, n = len(rel), len(nonrel)
    s = 0.0
    nonrel_above = 0
    for d in ranked_docs:
        if d in nonrel:
            nonrel_above += 1
        elif d in rel:
            if n > 0:
                s += 1.0 - min(nonrel_above, r) / min(r, n)
            else:
                s += 1.0
    return s / r
