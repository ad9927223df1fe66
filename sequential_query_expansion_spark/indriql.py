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
            children: List = []
            nested = False
            while (t := self.next()) != ")":
                if t == "(":
                    self._fail(f"unexpected '(' inside {tok}")
                if t.startswith("#"):
                    # Indri's nested extent form — `#uw(#4(a b) c)`, the
                    # shape the reference's probe expressions use
                    # (occuranceCount/statement.txt_e:2-5). Only #uw
                    # accepts it, and only #odN/#N groups inside.
                    if name != "uw":
                        self._fail(
                            f"window operator {tok} takes bare terms "
                            f"only, got {t!r}"
                        )
                    child = self.parse_op(t)
                    if child[0] != "od":
                        self._fail(
                            f"#uw children must be terms or #odN groups, "
                            f"got #{child[0]}"
                        )
                    children.append(child)
                    nested = True
                else:
                    children.append(("term", t))
            terms = [c[1] for c in children if c[0] == "term"]
            if name == "uw":
                n = int(num) if num else None  # resolved after tokenize
                if nested:
                    return ("uwx", n, children)
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
    elif kind == "uwx":
        # nested `#uw(#4(a) #4(b) c)`: when every #odN child normalizes
        # to a single token (the only nested shape the reference's
        # retrieval-side renderings produce), the window degenerates to a
        # plain #uw over those tokens. Multi-term extents inside #uw are
        # count-expression-only (parse_count_expression / `dumpindex x`).
        raw: List[str] = []
        for c in node[2]:
            ctoks = tokenize_py(c[1]) if c[0] == "term" else _norm_window_terms(
                c[2], "#od", text
            )
            if c[0] == "od" and len(ctoks) > 1:
                raise ValueError(
                    f"indriql: multi-term #od group inside #uw is "
                    f"supported for counting only (query {text!r})"
                )
            raw.extend(ctoks)
        _flatten(("uw", node[1], raw), w, terms, phrases, text)
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


def parse_count_expression(text: str):
    """One Indri COUNT expression (`dumpindex x/dx/e/ef` argument —
    occuranceCount.cpp:38-47 expressionCount, :29-36
    documentExpressionCount; probe shapes statement.txt_e:1-5) ->

        ("term", token)
      | ("od", n, [tokens])                       # #odN / #N / quoted text
      | ("uw", n_or_None, [child...])             # children: term|od

    n=None means Indri's unlimited bare `#uw`. Terms are normalized
    through the engine tokenizer; an #od group that normalizes to one
    token degenerates to a term child; duplicate #uw term children
    collapse (same policy as uw_count_py). Retrieval operators
    (#combine/#weight) are not count expressions and raise."""
    toks = _lex(text)
    if not toks:
        raise ValueError("empty count expression")
    p = _Parser(toks, text)
    nodes = []
    while p.peek() is not None:
        nodes.append(p.parse_expr())
    if len(nodes) == 1:
        node = nodes[0]
    else:
        # bare multi-word text: Indri's quoted-phrase counting form is
        # exact adjacency (#1)
        if any(nd[0] != "term" for nd in nodes):
            raise ValueError(
                f"count expression must be a single term/window, got "
                f"{text!r}"
            )
        node = ("od", 1, [nd[1] for nd in nodes])

    def norm_od(n, raw):
        ts = _norm_window_terms(raw, "#od", text)
        return ("term", ts[0]) if len(ts) == 1 else ("od", n, ts)

    kind = node[0]
    if kind == "term":
        ts = tokenize_py(node[1])
        if not ts:
            raise ValueError(f"expression {text!r} normalized to nothing")
        return ("term", ts[0]) if len(ts) == 1 else ("od", 1, ts)
    if kind == "od":
        return norm_od(node[1], node[2])
    if kind in ("uw", "uwx"):
        raw_children = (
            [("term", t) for t in node[2]] if kind == "uw" else node[2]
        )
        children, seen = [], set()
        for c in raw_children:
            if c[0] == "term":
                norms = [("term", t) for t in tokenize_py(c[1])]
            else:
                norms = [norm_od(c[1], c[2])]
            for cn in norms:
                key = cn if cn[0] == "term" else ("od", cn[1], tuple(cn[2]))
                if key not in seen:
                    seen.add(key)
                    children.append(cn)
        if not children:
            raise ValueError(f"expression {text!r} normalized to nothing")
        if len(children) == 1:
            return children[0]
        return ("uw", node[1], children)
    raise ValueError(
        f"#{kind} is a retrieval operator, not a count expression "
        f"({text!r})"
    )


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
