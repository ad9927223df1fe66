"""Dedup scale-hardening regressions: mass exact duplicates must not
trigger quadratic candidate expansion, and the vectorized SimHash kernel
must match a per-row reference."""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pytest

from sequential_query_expansion_spark.operators import dedup


@pytest.fixture(scope="module")
def mass_dup_docs(spark):
    """5 000 byte-identical docs + 3 distinct near-dup families."""
    text = " ".join(f"tok{i % 37}" for i in range(120))
    # change only the last token: 8 of 113 shingles differ → J ≈ 0.87
    near_a = text.rsplit(" ", 1)[0] + " tokX"
    other = " ".join(f"zzz{i}" for i in range(120))
    rows = [(i, text) for i in range(5000)]
    rows += [(6000, near_a), (6001, other)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def test_mass_exact_dups_no_quadratic_blowup(mass_dup_docs):
    """5k identical docs: collapse-first keeps the LSH candidate set
    representative-sized — the old groupBy+collect path built a single
    5000-member bucket row per band and exploded ~12.5M pairs in one
    task."""
    t0 = time.perf_counter()
    out = dedup.minhash_lsh_dedup(mass_dup_docs, threshold=0.8).toPandas()
    wall = time.perf_counter() - t0
    # pairs are BETWEEN representatives: the 5k clones collapse to doc 0,
    # which near-dups with 6000; no member×member expansion
    assert len(out) <= 2
    assert (0, 6000) in {tuple(r) for r in out[["doc_a", "doc_b"]].values}
    assert wall < 120, f"mass-dup dedup took {wall:.0f}s — quadratic path?"


def test_exact_groups_carry_the_members(mass_dup_docs):
    groups = dedup.exact_dedup(mass_dup_docs).toPandas()
    big = groups[groups.n_docs == 5000]
    assert len(big) == 1
    assert big.iloc[0]["keep_doc"] == 0


def test_lsh_candidates_selfjoin_equivalent(spark):
    """The self-join candidate generator must find the same near-dup
    candidate pairs as brute-force high-signature-agreement."""
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, base),
        (1, base.replace("w39", "w39x")),       # near-dup of 0
        (2, " ".join(f"u{i}" for i in range(40))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs)
    cands = {
        tuple(r) for r in
        dedup.lsh_candidates(sigs).toPandas()[["doc_a", "doc_b"]].values
    }
    assert (0, 1) in cands
    assert (0, 2) not in cands and (1, 2) not in cands


def test_max_bucket_cap_drops_oversized(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs)
    capped = dedup.lsh_candidates(sigs, max_bucket=5).count()
    assert capped == 0          # every bucket holds all 30 identical sigs


def _simhash_ref(toks) -> int:
    """Per-row reference implementation (the pre-vectorization kernel,
    with the md5 term hash)."""
    if not toks:
        return 0
    votes = [0] * 64
    counts: dict = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    for t, tf in counts.items():
        h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        for i in range(64):
            votes[i] += tf * (1 if (h >> i) & 1 else -1)
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_simhash_vectorized_matches_reference(spark, tiny_corpus):
    from sequential_query_expansion_spark.functions.text import tokenize_py

    pages = tiny_corpus.pages.sort_values("url").head(50)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pages.text.tolist())],
        "doc_id long, text string",
    )
    got = (
        dedup.simhash(docs).toPandas().sort_values("doc_id")["simhash"].tolist()
    )
    want = [_simhash_ref(tokenize_py(t)) for t in pages.text.tolist()]
    assert got == want


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing property: two docs sharing a substring of ≥ w+k-1
    tokens must share ≥ 1 fingerprint; disjoint docs share none."""
    k, w = 5, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))   # exactly w+k-1
    rows = [
        (0, "aa bb cc dd ee " + shared + " ff gg hh ii jj"),
        (1, "k0 k1 k2 k3 k4 k5 " + shared),
        (2, " ".join(f"z{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.winnow_fingerprints(docs, k=k, w=w)
    cands = dedup.winnow_candidates(fps).toPandas()
    pairs = {tuple(r) for r in cands[["doc_a", "doc_b"]].values}
    assert (0, 1) in pairs
    assert not {(0, 2), (1, 2)} & pairs


def test_simhash_pairs_exact_at_radius_6(spark, tiny_corpus):
    """Regression for the pigeonhole hole: with 4 pieces, pairs at
    hamming 4-6 can disagree on every piece and were silently dropped;
    auto-chunking must make max_hamming=6 EXACT vs brute force."""
    from sequential_query_expansion_spark.functions.text import tokenize_py

    pages = tiny_corpus.pages.sort_values("url").head(60)
    texts = pages.text.tolist()
    # seed near-identical variants to force small nonzero hamming pairs
    texts += [texts[0] + " extraword", texts[0] + " extraword otherword"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (int(a), int(b), int(h))
        for a, b, h in dedup.simhash_pairs(docs, max_hamming=6)
        .toPandas()[["doc_a", "doc_b", "hamming"]].values
    }
    fps = [_simhash_ref(tokenize_py(t)) for t in texts]
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
            if h <= 6:
                want.add((i, j, h))
    assert got == want and len(want) > 0


def test_minhash_rep_semantics_with_exact_dups(spark):
    """Regression for the collapse_exact/oracle contract: with exact
    duplicates present, minhash_lsh_dedup reports near-dup pairs between
    exact-dup REPRESENTATIVES, equal to ngram_jaccard_pairs restricted
    to representatives (and NOT the all-docs pair set)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (0, base),                       # rep of the exact group
        (1, base),                       # exact dup of 0
        (2, base),                       # exact dup of 0
        (3, base + " near extra tail"),  # near-dup of the group
        (4, "completely different words only here nothing shared at "
            "all zero overlap with any other document in this corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = (
        dedup.minhash_lsh_dedup(docs, threshold=0.5)
        .orderBy("doc_a", "doc_b").collect()
    )
    reps = docs.filter("doc_id in (0, 3, 4)")
    want = (
        dedup.ngram_jaccard_pairs(reps, threshold=0.5)
        .orderBy("doc_a", "doc_b").collect()
    )
    assert [(r.doc_a, r.doc_b) for r in got] == \
        [(r.doc_a, r.doc_b) for r in want] == [(0, 3)]
    for g, w in zip(got, want):
        assert abs(g.jaccard - w.jaccard) < 1e-9

    # collapse_exact=False restores the documented all-docs equivalence
    got_all = (
        dedup.minhash_lsh_dedup(docs, threshold=0.5, collapse_exact=False)
        .orderBy("doc_a", "doc_b").collect()
    )
    want_all = (
        dedup.ngram_jaccard_pairs(docs, threshold=0.5)
        .orderBy("doc_a", "doc_b").collect()
    )
    assert [(r.doc_a, r.doc_b) for r in got_all] == \
        [(r.doc_a, r.doc_b) for r in want_all]
    assert {(0, 1), (0, 2), (1, 2), (0, 3)} <= \
        {(r.doc_a, r.doc_b) for r in got_all}


def test_duplicate_components_chain_and_survivors(spark):
    """Min-label propagation must collapse transitive dup CHAINS (a-b,
    b-c with no a-c pair) into one component, leave singletons alone,
    and survivors = min id per component + all unpaired docs."""
    from sequential_query_expansion_spark.operators.dedup import (
        dedup_survivors,
        duplicate_components,
    )

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "doc_a long, doc_b long",
    )
    comps = {
        r.doc_id: r.component
        for r in duplicate_components(pairs).collect()
    }
    assert comps == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
        "doc_id long",
    )
    kept = sorted(
        r.doc_id for r in dedup_survivors(docs, pairs).collect()
    )
    assert kept == [1, 10, 20, 99]


def test_duplicate_components_long_path_converges(spark):
    """A 40-node path is the worst diameter case for label propagation;
    the loop must still converge (within max_iters) to one component."""
    from sequential_query_expansion_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    out = duplicate_components(pairs).collect()
    assert len(out) == 41
    assert {r.component for r in out} == {0}


def test_duplicate_components_nonconvergence_raises(spark):
    """Exhausting max_iters before convergence must raise, not silently
    return split components (which would leak dups through
    dedup_survivors)."""
    import pytest as _pytest

    from sequential_query_expansion_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_components(pairs, max_iters=3)
