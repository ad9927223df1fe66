"""Indri structured-query-language parser.

The reference executes its retrieval through IndriRunQuery over RENDERED
query strings — `#weight(0.8 #combine(name) 0.1 #combine(#od4 bigrams)
0.1 #uw17(name))` (umls/umlsSeqPubMed.ipynb:586-593); every
configs/*/indriRunQuery.cfg carries such strings verbatim in its
`<query><text>` blocks. A user switching from the reference holds those
strings, not pre-split clause tables, so this module parses the operator
subset the reference emits into the engine's clause form:

    parse_indri_query(text) -> (term_clauses, phrase_clauses)
        term_clauses   [(term, weight)]
        phrase_clauses [(terms, n, ordered, weight)]

which feeds ``scoring.phrase.phrase_weighted_topk`` (Spark batch) and
``LocalSearcher.phrase_topk`` (serving tier) directly.

Supported grammar (the operators appearing in the reference's configs
and notebook renderings):

    expr        := term | op
    op          := '#' NAME[N] '(' body ')'
    #combine(e1 … em)        each child at weight w/m
    #weight(w1 e1 … wm em)   child i at w·wi / Σwj (Indri normalizes)
    #odN(t1 … tm)            ordered window, width N   (#od ≡ #od1)
    #N(t1 … tm)              ordered window, width N (Indri shorthand;
                             #1(..) is the exact-phrase form)
    #uwN(t1 … tm)            unordered window, width N (#uw defaults to
                             the reference's 4m+1 rule, scoring.phrase.
                             default_uw_n)

#weight/#combine nest arbitrarily; window clauses take BARE TERMS only
(the subset the reference emits — a nested op inside a window raises).
Terms are normalized through the engine's tokenizer
(functions.text.tokenize_py), so "Hodgkin's" splits/folds exactly as the
index build did. A surface word that normalizes to several index tokens
is spliced into a window clause in order; outside windows each resulting
token carries the word's full weight (the word occupied one query slot,
and its index-side split should not halve its influence). A word that
normalizes to nothing is dropped.

Weight semantics match ``scoring.phrase``: #combine distributes w/m over
its children (the arithmetic-mean analogue of Indri's log-space average
— see scoring/phrase.py module docstring), #weight normalizes by the sum
of the given weights. Duplicate flattened terms merge by summing weight;
window clauses stay distinct.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .functions.text import tokenize_py
from .scoring.phrase import default_uw_n

_TOKEN_RE = re.compile(r"#[A-Za-z]*\d*|\(|\)|[^\s()]+")
_OP_RE = re.compile(r"#([A-Za-z]*)(\d*)$")

TermClause = Tuple[str, float]
PhraseClause = Tuple[List[str], int, bool, float]


def _lex(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


class _Parser:
    def __init__(self, toks: List[str], text: str):
        self.toks = toks
        self.i = 0
        self.text = text

    def _fail(self, msg: str):
        raise ValueError(f"indriql: {msg} in query {self.text!r}")

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            self._fail("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    # expr := term | '#'op '(' ... ')'
    def parse_expr(self):
        t = self.next()
        if t.startswith("#"):
            return self.parse_op(t)
        if t in ("(", ")"):
            self._fail(f"unexpected {t!r}")
        return ("term", t)

    def parse_op(self, tok: str):
        m = _OP_RE.match(tok)
        if not m:
            self._fail(f"bad operator token {tok!r}")
        name, num = m.group(1).lower(), m.group(2)
        if self.next() != "(":
            self._fail(f"expected '(' after {tok}")
        if name in ("od", "uw", ""):
            terms: List[str] = []
            while (t := self.next()) != ")":
                if t.startswith("#") or t == "(":
                    self._fail(
                        f"window operator {tok} takes bare terms only, "
                        f"got {t!r}"
                    )
                terms.append(t)
            if name == "uw":
                n = int(num) if num else None  # resolved after tokenize
                return ("uw", n, terms)
            # #odN, or bare #N (Indri's ordered shorthand; #od ≡ #od1)
            return ("od", int(num) if num else 1, terms)
        if name == "combine":
            children = []
            while self.peek() != ")":
                children.append(self.parse_expr())
            self.next()
            if not children:
                self._fail(f"empty {tok}()")
            return ("combine", children)
        if name == "weight":
            pairs = []
            while self.peek() != ")":
                w_tok = self.next()
                try:
                    w = float(w_tok)
                except ValueError:
                    self._fail(
                        f"#weight expects 'w expr' pairs, got weight "
                        f"{w_tok!r}"
                    )
                pairs.append((w, self.parse_expr()))
            self.next()
            if not pairs:
                self._fail("empty #weight()")
            return ("weight", pairs)
        self._fail(f"unsupported operator #{name}")


def _norm_window_terms(raw: List[str], where: str, text: str) -> List[str]:
    out: List[str] = []
    for t in raw:
        out.extend(tokenize_py(t))
    if not out:
        raise ValueError(
            f"indriql: window clause {where} normalized to no terms in "
            f"query {text!r}"
        )
    return out


def _flatten(node, w: float, terms: dict, phrases: list, text: str) -> None:
    kind = node[0]
    if kind == "term":
        for t in tokenize_py(node[1]):
            terms[t] = terms.get(t, 0.0) + w
    elif kind == "combine":
        children = node[1]
        for c in children:
            _flatten(c, w / len(children), terms, phrases, text)
    elif kind == "weight":
        pairs = node[1]
        if any(wi < 0 for wi, _ in pairs):
            raise ValueError(
                f"indriql: negative #weight weight in query {text!r} "
                "(Indri rejects these; a stray '-' would silently "
                "demote matching docs)"
            )
        tot = sum(wi for wi, _ in pairs)
        if tot <= 0:
            raise ValueError(
                f"indriql: #weight weights sum to {tot} in query {text!r}"
            )
        for wi, c in pairs:
            _flatten(c, w * wi / tot, terms, phrases, text)
    elif kind == "od":
        toks = _norm_window_terms(node[2], "#od", text)
        if len(toks) == 1:  # degenerate window = plain term
            terms[toks[0]] = terms.get(toks[0], 0.0) + w
        else:
            phrases.append((toks, node[1], True, w))
    elif kind == "uw":
        # #uwN semantics collapse duplicate terms to their unique set —
        # same policy as index.positions.phrase_counts and the concept
        # renderer (joining a term's positions twice double-counts)
        raw = _norm_window_terms(node[2], "#uw", text)
        toks = list(dict.fromkeys(raw))
        if len(toks) == 1:
            terms[toks[0]] = terms.get(toks[0], 0.0) + w
        else:
            # default width from the SURFACE length (render_concept_
            # clauses' 4m+1 uses the phrase length pre-dedup too)
            n = node[1] if node[1] is not None else default_uw_n(len(raw))
            phrases.append((toks, n, False, w))
    else:  # pragma: no cover
        raise AssertionError(kind)


def parse_indri_query(
    text: str, weight: float = 1.0
) -> Tuple[List[TermClause], List[PhraseClause]]:
    """One Indri query string -> (term_clauses, phrase_clauses) in
    ``scoring.phrase`` form. Bare multi-term text (no operator) is
    Indri's implicit #combine."""
    toks = _lex(text)
    if not toks:
        return [], []
    p = _Parser(toks, text)
    children = []
    while p.peek() is not None:
        children.append(p.parse_expr())
    # a single expression stands alone; several form Indri's implicit
    # #combine
    tree = children[0] if len(children) == 1 else ("combine", children)
    terms: dict = {}
    phrases: list = []
    _flatten(tree, weight, terms, phrases, text)
    return sorted(terms.items()), phrases


def parse_indri_topics(
    topics: dict,
) -> Tuple[List[tuple], List[tuple]]:
    """{qid: indri query text} -> (term_rows, phrase_rows) for
    ``scoring.phrase.phrase_weighted_topk``:
        term_rows   (qid, term, weight)
        phrase_rows (qid, clause_id, terms, n, ordered, weight)
    """
    term_rows: List[tuple] = []
    phrase_rows: List[tuple] = []
    for qid in sorted(topics):
        tc, pcs = parse_indri_query(topics[qid])
        term_rows.extend((qid, t, w) for t, w in tc)
        for j, (terms, n, ordered, w) in enumerate(pcs):
            kind = "od" if ordered else "uw"
            phrase_rows.append(
                (qid, f"{qid}:{kind}{j}", terms, n, ordered, w)
            )
    return term_rows, phrase_rows
