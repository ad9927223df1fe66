"""Indri query-language parser (indriql.py): grammar, weight
distribution, tokenizer normalization, and equivalence with the
reference's concept rendering (scoring.phrase.render_concept_clauses).
Pure-Python — no Spark session needed; the end-to-end scoring identity
is pinned in test_local_search.py / the driver contract."""

import math

import pytest

from sequential_query_expansion_spark.indriql import (
    parse_indri_query,
    parse_indri_topics,
)
from sequential_query_expansion_spark.scoring.phrase import (
    render_concept_clauses,
)


def _close(a, b):
    assert math.isclose(a, b, rel_tol=1e-12), (a, b)


def test_single_term():
    tc, pc = parse_indri_query("Spark")
    assert tc == [("spark", 1.0)] and pc == []


def test_implicit_combine_bare_text():
    tc, pc = parse_indri_query("hash JOIN merge")
    assert pc == []
    assert [t for t, _ in tc] == ["hash", "join", "merge"]
    for _, w in tc:
        _close(w, 1.0 / 3)


def test_weight_normalizes():
    tc, _ = parse_indri_query("#weight(3 a 1 b)")
    d = dict(tc)
    _close(d["a"], 0.75)
    _close(d["b"], 0.25)


def test_nested_weight_combine():
    tc, pc = parse_indri_query(
        "#weight(0.6 #combine(a b) 0.4 #weight(1 c 3 d))"
    )
    d = dict(tc)
    _close(d["a"], 0.3)
    _close(d["b"], 0.3)
    _close(d["c"], 0.1)
    _close(d["d"], 0.3)
    assert pc == []


def test_od_and_shorthand():
    _, pc = parse_indri_query("#od4(a b)")
    assert pc == [(["a", "b"], 4, True, 1.0)]
    # Indri's #N(...) shorthand is an ordered window of width N
    _, pc1 = parse_indri_query("#1(new york)")
    assert pc1 == [(["new", "york"], 1, True, 1.0)]
    # bare #od defaults to #od1 (exact phrase)
    _, pcd = parse_indri_query("#od(a b)")
    assert pcd[0][1] == 1


def test_uw_width_default_is_reference_rule():
    _, pc = parse_indri_query("#uw(a b c)")
    assert pc == [(["a", "b", "c"], 13, False, 1.0)]  # 4m+1
    _, pc17 = parse_indri_query("#uw17(a b c d)")
    assert pc17[0][1] == 17


def test_window_terms_normalized_through_engine_tokenizer():
    # hyphenation splices into adjacent window slots; case folds
    _, pc = parse_indri_query("#od4(State-of-the-art Design)")
    assert pc == [(["state", "of", "the", "art", "design"], 4, True, 1.0)]
    # a surface word that normalizes to several index tokens keeps the
    # word's weight on EACH token (documented in indriql.py)
    tc, _ = parse_indri_query("#combine(Hodgkin's lymphoma)")
    d = dict(tc)
    _close(d["hodgkin"], 0.5)
    _close(d["s"], 0.5)
    _close(d["lymphoma"], 0.5)


def test_uw_duplicate_terms_collapse_to_unique_set():
    """#uwN semantics collapse duplicates (same policy as
    index.positions.phrase_counts and render_concept_clauses); the
    default width still follows the SURFACE phrase length."""
    _, pc = parse_indri_query("#uw13(new york new)")
    assert pc == [(["new", "york"], 13, False, 1.0)]
    _, pcd = parse_indri_query("#uw(new york new)")
    assert pcd == [(["new", "york"], 13, False, 1.0)]  # 4·3+1
    # duplicates collapsing to ONE term degenerate to a plain term
    tc, pc1 = parse_indri_query("#uw4(spark spark)")
    assert pc1 == [] and tc == [("spark", 1.0)]
    # ordered windows keep duplicates: the od kernel chains strictly
    # ascending positions, so #od1(a a) correctly needs two occurrences
    _, pco = parse_indri_query("#od1(new york new)")
    assert pco == [(["new", "york", "new"], 1, True, 1.0)]


def test_single_term_window_degenerates_to_term():
    tc, pc = parse_indri_query("#od4(spark)")
    assert pc == [] and tc == [("spark", 1.0)]


def test_duplicate_terms_merge():
    tc, _ = parse_indri_query("#combine(a a b)")
    d = dict(tc)
    _close(d["a"], 2.0 / 3)
    _close(d["b"], 1.0 / 3)


def test_reference_rendering_equals_render_concept_clauses():
    """The parsed form of the rendered string the reference emits must
    equal render_concept_clauses' direct output for a 2-term concept."""
    phrase = "hash join"
    text = (
        "#weight(0.8 #combine(hash join) "
        "0.1 #od4(hash join) 0.1 #uw9(hash join))"
    )
    term_rows, phrase_rows = render_concept_clauses([("q", phrase)])
    want_terms = sorted((t, w) for _, t, w in term_rows)
    want_phrases = [
        (terms, n, o, w) for _, _, terms, n, o, w in phrase_rows
    ]
    got_terms, got_phrases = parse_indri_query(text)
    assert [t for t, _ in got_terms] == [t for t, _ in want_terms]
    for (_, gw), (_, ww) in zip(got_terms, want_terms):
        _close(gw, ww)
    assert len(got_phrases) == len(want_phrases)
    for (gt, gn, go, gw), (wt, wn, wo, ww) in zip(
        sorted(got_phrases, key=lambda p: (p[2], p[0])),
        sorted(want_phrases, key=lambda p: (p[2], p[0])),
    ):
        assert (gt, gn, go) == (wt, wn, wo)
        _close(gw, ww)


def test_parse_topics_rows():
    term_rows, phrase_rows = parse_indri_topics(
        {"q2": "#od2(a b)", "q1": "plain text"}
    )
    assert [r[0] for r in term_rows] == ["q1", "q1"]
    assert phrase_rows == [("q2", "q2:od0", ["a", "b"], 2, True, 1.0)]


def test_empty_query():
    assert parse_indri_query("") == ([], [])
    assert parse_indri_query("  .,!  ") == ([], [])


@pytest.mark.parametrize(
    "bad",
    [
        "#weight(a b)",              # missing weight number
        "#od4(a #combine(b c))",     # op nested in a window
        "#synonym(a b)",             # unsupported operator
        "#combine(a",                # unbalanced paren
        "#combine()",                # empty group
        "#weight(0 a 0 b)",          # zero weight mass
        "#weight(-1 a 3 b)",         # negative weight (Indri rejects)
        "#uw4(.,)",                  # window normalizes to nothing
    ],
)
def test_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_indri_query(bad)
