"""Deterministic synthetic corpus per FIXTURES.md.

Generates the ``pages`` table in exactly the shape of BASELINE.json's
input_hint — (url string, warc_ts timestamp, html binary, text string,
lang string) — plus ``queries``, ``qrels`` and ``graph_edges``, with a
Zipfian vocabulary so stopword skew (the salted-merge path) is exercised.

All randomness flows from one numpy Generator seeded explicitly; the same
(seed, n_docs) always produces byte-identical tables. The per-row invariant
text == extract_text(html) is guaranteed by construction (the html wraps
the text) and re-checked in tests via functions.text.extract_text_py.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
N_STOPWORDS = 30
ZIPF_S = 1.07

_EPOCH = _dt.datetime(2024, 1, 1)


def vocabulary(size: int = VOCAB_SIZE) -> List[str]:
    """term00000..term09999; rank == frequency rank (Zipf)."""
    return [f"term{i:05d}" for i in range(size)]


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


@dataclass
class SyntheticCorpus:
    pages: pd.DataFrame
    queries: pd.DataFrame
    qrels: pd.DataFrame
    graph_edges: pd.DataFrame
    relevant_terms: Dict[str, List[str]] = field(default_factory=dict)


def _seed_hash(i: int) -> str:
    return hashlib.sha1(f"page-{i}".encode()).hexdigest()[:10]


NAV_TOKENS = ["home", "about", "contact", "privacy", "terms", "copyright"]


def make_corpus(
    n_docs: int = 1000,
    n_queries: int = 20,
    seed: int = 42,
    vocab_size: int = VOCAB_SIZE,
    hard_fraction: float = 0.0,
    cc_realism: float = 0.0,
) -> SyntheticCorpus:
    """``hard_fraction`` > 0 marks that fraction of queries "hard" (the
    reference's premise): half of a hard query's relevant docs contain
    the query terms + related concepts, the other half ONLY the related
    concepts — unexpanded BM25 cannot reach them; graph/PRF expansion
    can. Default 0.0 keeps the original (rank-identity-test) corpus
    byte-identical.

    ``cc_realism`` > 0 makes that fraction of pages Common-Crawl-shaped:
    language-profile stopwords injected so the labeled ``lang`` is
    recoverable from content (langid becomes non-trivial), nav/footer
    boilerplate present in BOTH html and extracted text (as real
    extraction leaves it), and script/style/comment junk present ONLY in
    the html (extract_text must strip it). The per-row north_rule
    invariant text == extract_text(html) holds by construction in both
    modes. Default 0.0 keeps every byte identical to the original
    generator."""
    rng = np.random.default_rng(seed)
    vocab = np.asarray(vocabulary(vocab_size), dtype=object)
    probs = _zipf_probs(vocab_size)

    # ---- queries: 1-5 mid-frequency terms (ranks 100-3000) --------------
    qids = [f"q{351 + i}" for i in range(n_queries)]
    query_terms: Dict[str, List[str]] = {}
    for qid in qids:
        k = int(rng.integers(1, 6))
        idx = rng.choice(np.arange(100, min(3000, vocab_size)), size=k, replace=False)
        query_terms[qid] = [str(vocab[j]) for j in idx]
    # a couple of stopword-bearing and OOV-bearing queries
    if n_queries >= 3:
        query_terms[qids[0]].append(str(vocab[0]))          # stopword
        query_terms[qids[1]].append("zzzunseen")            # OOV

    n_hard = int(n_queries * hard_fraction)
    hard_qids = set(qids[2: 2 + n_hard])  # skip the stopword/OOV queries
    related_terms: Dict[str, List[str]] = {}
    for qid in qids:
        if qid in hard_qids:
            ridx = rng.choice(
                np.arange(3000, min(6000, vocab_size)), size=3, replace=False
            )
            related_terms[qid] = [str(vocab[j]) for j in ridx]

    # ---- per-query relevant docs: over-sample query terms ---------------
    rel_docs: Dict[str, List[int]] = {}
    taken = set()
    for qid in qids:
        n_rel = int(rng.integers(5, min(51, max(6, n_docs // 10))))
        docs = rng.choice(n_docs, size=n_rel, replace=False)
        rel_docs[qid] = [int(d) for d in docs]
        taken.update(rel_docs[qid])

    # doc -> extra terms to inject (query terms of the queries it's relevant
    # to; for hard queries, half the relevant docs carry only the RELATED
    # concepts, reachable exclusively through expansion)
    inject: Dict[int, List[str]] = {}
    for qid, docs in rel_docs.items():
        for j, d in enumerate(docs):
            if qid in hard_qids:
                if j % 2 == 0:
                    inject.setdefault(d, []).extend(
                        query_terms[qid] + related_terms[qid]
                    )
                else:
                    inject.setdefault(d, []).extend(related_terms[qid])
            else:
                inject.setdefault(d, []).extend(query_terms[qid])

    # ---- pages -----------------------------------------------------------
    lengths = np.maximum(
        5, rng.lognormal(mean=5.0, sigma=0.6, size=n_docs).astype(int)
    )
    punct_cycle = [",", ".", ";", "-", "/", '"', "'", "(", ")", "_"]
    rows = []
    for i in range(n_docs):
        toks = list(rng.choice(vocab, size=lengths[i], p=probs))
        extra = inject.get(i)
        if extra:
            # repeat injected terms so BM25 actually ranks these docs up
            reps = [t for t in extra for _ in range(int(rng.integers(2, 5)))]
            pos = rng.integers(0, len(toks) + 1, size=len(reps))
            for p, t in zip(sorted(pos, reverse=True), reps):
                toks.insert(int(p), t)
        # punctuation / case noise to exercise the tokenizer contract
        noisy = []
        for j, t in enumerate(toks):
            w = t
            r = (i * 7919 + j * 104729) % 100
            if r < 5:
                w = w.upper()
            elif r < 10:
                w = w.capitalize()
            if r % 17 == 0:
                w = w + punct_cycle[(i + j) % len(punct_cycle)]
            noisy.append(w)
        lang = "en" if (i % 20) != 0 else ("de" if (i % 40) == 0 else "fr")
        realistic = cc_realism > 0 and (i % 100) < int(cc_realism * 100)
        if realistic:
            # language-profile stopwords → langid can recover `lang`
            from .operators.text_analysis import LANG_STOPWORDS

            sw = LANG_STOPWORDS[lang]
            sw_reps = [sw[(i + j) % len(sw)] for j in range(max(3, len(toks) // 8))]
            pos = rng.integers(0, len(noisy) + 1, size=len(sw_reps))
            for p, t in zip(sorted(pos, reverse=True), sw_reps):
                noisy.insert(int(p), t)
            nav = " ".join(NAV_TOKENS[(i % 3):(i % 3) + 3])
            body_text = nav + " " + " ".join(noisy) + " " + NAV_TOKENS[i % 6]
        else:
            body_text = " ".join(noisy)
        text = body_text
        if realistic:
            # junk that extract_text must STRIP (head/script/style/comments)
            html = (
                f"<html><head><title>t{i}</title>"
                f'<meta name="generator" content="cms-{i % 7}"/>'
                f"<style>.x{i % 5}{{color:#000}}</style>"
                f"<script>var x={i};trk('{_seed_hash(i)}');</script></head>"
                f'<body><nav class="m">{nav}</nav>'
                f"<!-- cached {i} --><p>{' '.join(noisy)}</p>"
                f"<footer>{NAV_TOKENS[i % 6]}</footer></body></html>"
            ).encode()
        else:
            html = (
                f"<html><head><title>t{i}</title>"
                f"<script>var x={i};</script></head>"
                f"<body><p>{text}</p></body></html>"
            ).encode()
        rows.append(
            {
                "url": f"https://example.org/{_seed_hash(i)}/page-{i}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=int(i) * 137),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )
    pages = pd.DataFrame(rows)
    # invariant by construction: extract_text(html) == collapse_ws(text)
    # (text has single spaces already, so equality is exact)

    queries = pd.DataFrame(
        {"qid": qids, "text": [" ".join(query_terms[q]) for q in qids]}
    )
    qrels = pd.DataFrame(
        [
            {
                "qid": qid,
                "url": pages.url.iloc[d],
                "rel": int(1 + (d % 2)),
            }
            for qid, docs in rel_docs.items()
            for d in docs
        ]
    )

    # ---- concept graph: bias edges toward co-injected terms -------------
    rels = ["RelatedTo", "IsA", "PartOf", "Synonym"]
    edges = []
    for qid in qids:
        terms = query_terms[qid]
        for t in terms:
            # connect each query term to terms co-injected with it (helpful)
            for t2 in terms:
                if t2 != t:
                    edges.append((rels[len(edges) % 4], t, t2, 3))
            # hard queries: edges from every query term to the related
            # concepts (what the expansion is supposed to discover)
            for t2 in related_terms.get(qid, []):
                edges.append((rels[len(edges) % 4], t, t2, 3))
            # plus a few random neighbors (noise)
            for j in rng.integers(0, vocab_size, size=3):
                edges.append((rels[len(edges) % 4], t, str(vocab[int(j)]), 1))
    graph_edges = pd.DataFrame(
        edges, columns=["rel", "src", "dst", "weight"]
    ).drop_duplicates(["src", "dst"]).reset_index(drop=True)

    corpus = SyntheticCorpus(pages, queries, qrels, graph_edges, query_terms)
    corpus.related_terms = related_terms
    corpus.hard_qids = hard_qids
    return corpus
