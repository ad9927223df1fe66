"""CLI parity with the reference's `dumpindex`/`occuranceCount` dispatch
(occuranceCount.cpp:755-860): every command smoke-tested over a real
checkpointed index, and the count-expression commands (x/dx/e/fx/ef/efb)
value-checked against the pure-Python extent oracle
(functions.positional.expression_count_py) doc by doc.
"""

from __future__ import annotations

import numpy as np
import pytest

from sequential_query_expansion_spark import cli
from sequential_query_expansion_spark.functions.positional import (
    expression_count_py,
    od_match_extents,
    uw_count_extents,
    uw_count_py,
)
from sequential_query_expansion_spark.functions.text import tokenize_py
from sequential_query_expansion_spark.index.checkpoint import (
    build_index_checkpointed,
)
from sequential_query_expansion_spark.indriql import parse_count_expression

DOCS = [
    (0, "the poach of wildlife poach illegally done poach illegally"),
    (1, "big data scan here big data scan"),
    (2, "wildlife preserve poach patrol illegally crossing"),
    (3, "spark hash join and merge join plans"),
    (4, "totally unrelated words about nothing in particular"),
]

EXPRS = [
    "poach",
    "#od4(poach illegally)",
    "#od1(big data)",
    "#uw6(wildlife illegally)",
    "#uw(#4( poach ) #4( illegally ))",
    "#uw(#4(big data) #4(scan))",
    "#uw(#4( wildlife ) #4( poach ) #4( illegally ))",
]


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index_checkpointed(
        spark, docs, out, salt_ranges=2, num_buckets=4,
        with_positions=True, with_doc_vectors=True, with_docs=True,
    )
    return out


def _run(capsys, idx_dir, *args) -> str:
    rc = cli.main([idx_dir, *args])
    assert rc == 0
    return capsys.readouterr().out


def _oracle_counts(expr: str):
    tree = parse_count_expression(expr)
    per_doc = {}
    for doc_id, text in DOCS:
        c = expression_count_py(tokenize_py(text), tree)
        if c > 0:
            per_doc[doc_id] = c
    return per_doc


@pytest.mark.parametrize("expr", EXPRS)
def test_x_matches_extent_oracle(capsys, idx_dir, expr):
    out = _run(capsys, idx_dir, "x", expr)
    got = int(out.strip().rsplit(":", 1)[1])
    assert got == sum(_oracle_counts(expr).values())


@pytest.mark.parametrize("expr", EXPRS)
def test_dx_matches_extent_oracle(capsys, idx_dir, expr):
    out = _run(capsys, idx_dir, "dx", expr)
    got = int(out.strip().rsplit(":", 1)[1])
    assert got == len(_oracle_counts(expr))


def test_fx_and_ef_and_efb(capsys, idx_dir, tmp_path):
    f = tmp_path / "exprs.txt"
    f.write_text("\n".join(EXPRS[:4]) + "\n" + EXPRS[0] + "\n")  # dup line
    out = _run(capsys, idx_dir, "fx", str(f))
    lines = [ln for ln in out.splitlines() if ":" in ln]
    assert len(lines) == 4  # dup dropped, like the cpp's std::set guard
    for ln, expr in zip(lines, EXPRS[:4]):
        assert int(ln.rsplit(":", 1)[1]) == sum(_oracle_counts(expr).values())

    out = _run(capsys, idx_dir, "ef", str(f))
    for ln, expr in zip(out.splitlines(), EXPRS[:4]):
        names = [u for u in ln.split(":", 1)[1].split(",") if u]
        # one name PER EXTENT: doc repeated `matches` times (ADVICE r3
        # parity fix — env.expressionList yields one result per extent)
        want = sorted(
            d for d, c in _oracle_counts(expr).items() for _ in range(c)
        )
        assert sorted(int(u) for u in names) == want

    fb = tmp_path / "brief.txt"
    fb.write_text(f"{EXPRS[1]}:0,4\n")      # doc 0 matches, doc 4 doesn't
    out = _run(capsys, idx_dir, "efb", str(fb))
    body = out.strip()
    counts = _oracle_counts(EXPRS[1])
    # leading count = TOTAL extent count; matching given-list names
    # repeat once per extent
    assert body.startswith(f"{EXPRS[1]}:{sum(counts.values())},")
    assert body.split(":", 1)[1].split(",:")[0].split(",")[1:] == (
        ["0"] * counts[0]
    )
    assert body.endswith(":0,4")


def test_tp_prints_positions(capsys, idx_dir):
    out = _run(capsys, idx_dir, "tp", "poach")
    lines = out.splitlines()
    # header: term stem cf total
    head = lines[0].split()
    assert head[0] == head[1] == "poach"
    assert int(head[2]) == 4  # 3 in doc 0 + 1 in doc 2
    doc0 = next(ln for ln in lines[1:] if ln.startswith("0 "))
    parts = doc0.split()
    n_pos, dl = int(parts[1]), int(parts[2])
    toks0 = tokenize_py(DOCS[0][1])
    assert n_pos == toks0.count("poach") and dl == len(toks0)
    assert [int(p) for p in parts[3:]] == [
        i for i, t in enumerate(toks0) if t == "poach"
    ]


def test_doc_commands(capsys, idx_dir):
    assert _run(capsys, idx_dir, "dt", "1").strip() == DOCS[1][1]
    dd = _run(capsys, idx_dir, "dd", "2")
    assert "--- Metadata ---" in dd and DOCS[2][1] in dd
    assert "0 wildlife" in dd  # token positions section
    dm = _run(capsys, idx_dir, "dm")
    assert len(dm.strip().splitlines()) == len(DOCS)
    csv = _run(capsys, idx_dir, "dcsv").strip().splitlines()
    assert len(csv) == len(DOCS)
    name, _, toks = csv[3].partition(",")
    assert toks.split() == tokenize_py(DOCS[3][1])


def test_e_header_and_rows(capsys, idx_dir):
    out = _run(capsys, idx_dir, "e", "#od4(poach illegally)")
    head = out.splitlines()[0].split()
    total_terms = sum(len(tokenize_py(t)) for _, t in DOCS)
    assert int(head[-2]) == total_terms and int(head[-1]) == len(DOCS)


@pytest.mark.parametrize("expr", EXPRS)
def test_e_per_extent_rows_match_oracle(capsys, idx_dir, expr):
    """`e` prints one `doc weight begin end` line per match EXTENT
    (ADVICE r3 parity fix), agreeing with the pure-Python extent
    oracle on every expression shape."""
    from sequential_query_expansion_spark.functions.positional import (
        expression_all_extents_py,
    )

    tree = parse_count_expression(expr)
    want = []
    for doc_id, text in DOCS:
        for b, e in expression_all_extents_py(tokenize_py(text), tree):
            want.append((doc_id, 1, int(b), int(e)))
    out = _run(capsys, idx_dir, "e", expr)
    got = [
        tuple(int(x) for x in ln.split("\t"))
        for ln in out.splitlines()[1:]
        if ln.strip()
    ]
    assert sorted(got) == sorted(want), expr
    # per-extent rows aggregate back to the per-doc match counts
    per_doc: dict = {}
    for d, _, _, _ in got:
        per_doc[d] = per_doc.get(d, 0) + 1
    assert per_doc == _oracle_counts(expr)


def test_merge_command(capsys, spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    a, b, out = str(root / "a"), str(root / "b"), str(root / "out")
    docs_a = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    docs_b = spark.createDataFrame(
        [(0, DOCS[3][1]), (1, DOCS[4][1])], "doc_id long, text string"
    )
    build_index_checkpointed(spark, docs_a, a, salt_ranges=2, num_buckets=4,
                             with_positions=True)
    build_index_checkpointed(spark, docs_b, b, salt_ranges=2, num_buckets=4,
                             with_positions=True)
    outtxt = _run(capsys, out, "m", a, b)
    assert "5 docs" in outtxt
    # merged index answers queries over BOTH inputs with renumbered ids
    s = _run(capsys, out, "s")
    assert "documents:\t5" in s
    q = _run(capsys, out, "q", "spark hash join")
    assert " 3 " in q or "|3 " in q.replace("| 3", "|3")  # doc 3+0 offset
    # positional stage merged too: expression counting still works
    x = _run(capsys, out, "x", "#od4(poach illegally)")
    assert int(x.strip().rsplit(":", 1)[1]) == sum(
        _oracle_counts("#od4(poach illegally)").values()
    )
    # vtl consistency gate over the merged repository
    rc = cli.main([out, "vtl"])
    assert rc == 0


def test_merge_after_compact_keeps_ids_distinct(spark, tmp_path_factory):
    """A compacted input has NON-contiguous doc ids (delete leaves
    holes), so offsetting the next input by n_docs would fuse two
    documents under one merged id — offsets must come from
    max(doc_id)+1."""
    from sequential_query_expansion_spark.index import maintenance as mt

    root = tmp_path_factory.mktemp("mergeholes")
    a, b, out = str(root / "a"), str(root / "b"), str(root / "out")
    docs_a = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs_b = spark.createDataFrame(
        [(0, "merged text unique marker alpha"),
         (1, "another merged marker beta")],
        "doc_id long, text string",
    )
    build_index_checkpointed(spark, docs_a, a, salt_ranges=2, num_buckets=4)
    mt.delete_docs(spark, a, [0])          # hole at id 0; max id stays 4
    mt.compact_index(spark, a)             # n_docs=4 but ids are 1..4
    build_index_checkpointed(spark, docs_b, b, salt_ranges=2, num_buckets=4)
    # deleting EVERY doc then compacting is refused up front (a
    # zero-survivor index has no readable stages)
    e = str(root / "e")
    docs_e = spark.createDataFrame([(0, "ghost doc")], "doc_id long, text string")
    build_index_checkpointed(spark, docs_e, e, salt_ranges=2, num_buckets=4)
    mt.delete_docs(spark, e, [0])
    with pytest.raises(ValueError, match="refusing to compact"):
        mt.compact_index(spark, e)
    mt.merge_indexes(spark, out, [a, b])
    docmap = spark.read.parquet(out + "/docmap")
    n = docmap.count()
    assert n == 6  # 4 survivors + 2 from B
    assert docmap.select("doc_id").distinct().count() == n
    doc_len = spark.read.parquet(out + "/doc_len")
    assert doc_len.select("doc_id").distinct().count() == doc_len.count()
    # B's docs remain individually addressable after the shift:
    # "alpha" occurs only in B's doc 0 -> merged id max_id(A)+1 = 5
    from sequential_query_expansion_spark.index.checkpoint import load_index
    from sequential_query_expansion_spark.scoring.bm25 import score_topk

    idx = load_index(spark, out)
    qt = spark.createDataFrame(
        [("qb", "alpha", 1.0)], "qid string, term string, weight double"
    )
    top = score_topk(idx, qt, k=1, with_url=False).collect()
    assert top and top[0]["doc_id"] == 5


def test_merge_refuses_tombstoned_input(spark, tmp_path_factory):
    from sequential_query_expansion_spark.index import maintenance as mt

    root = tmp_path_factory.mktemp("mergebad")
    a, out = str(root / "a"), str(root / "out")
    docs = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    build_index_checkpointed(spark, docs, a, salt_ranges=2, num_buckets=4)
    mt.delete_docs(spark, a, [0])
    with pytest.raises(ValueError, match="tombstones"):
        mt.merge_indexes(spark, out, [a])


def test_scnet_stems_phrase_fields(capsys, tmp_path):
    from sequential_query_expansion_spark.functions.text import stem_py

    f = tmp_path / "cnet.txt"
    f.write_text(
        "C001,related concepts here,wildlife poaching activities\n"
        "\n"  # blank lines skipped
        "C002,running dogs,jumped fences\n"
    )
    # sCnet needs neither the index nor Spark -> any index_dir string works
    rc = cli.main(["/nonexistent", "sCnet", str(f)])
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 2
    for ln, (key, p1, p2) in zip(
        lines,
        [
            ("C001", "related concepts here", "wildlife poaching activities"),
            ("C002", "running dogs", "jumped fences"),
        ],
    ):
        want = ",".join(
            [key]
            + [" ".join(stem_py(w) for w in p.split()) + " " for p in (p1, p2)]
        ) + ","
        assert ln == want
        assert ln.startswith(key + ",")


# --- kernel-level properties -------------------------------------------


def _uw_count_extents_brute(ext, n):
    """Independent oracle from the SPEC, not the kernel: a match is a
    doubly-minimal covering window over the (begin, end, child) event
    stream — events[l..r] holds >=1 extent of every child while neither
    events[l+1..r] nor events[l..r-1] does — whose covering span
    max(end) - begin[l] + 1 fits n. Brute-forces all (l, r) pairs."""
    k = len(ext)
    if k == 0 or any(len(a) == 0 for a in ext):
        return 0
    events = sorted(
        (int(b), int(e), i) for i, arr in enumerate(ext) for b, e in arr
    )

    def covered(l, r):
        return len({t for _, _, t in events[l:r + 1]}) == k

    res = 0
    for l in range(len(events)):
        for r in range(l, len(events)):
            if not covered(l, r):
                continue
            # minimal r for this l found; count iff also left-minimal
            if not (l + 1 <= r and covered(l + 1, r)):
                span_end = max(e for _, e, _ in events[l:r + 1])
                if n is None or span_end - events[l][0] + 1 <= n:
                    res += 1
            break
    return res


def test_uw_count_extents_vs_doubly_minimal_brute_force():
    rng = np.random.default_rng(13)
    for _ in range(300):
        k = int(rng.integers(2, 4))
        ext = []
        for _ in range(k):
            m = int(rng.integers(0, 6))
            if m == 0:
                ext.append(np.empty((0, 2), np.int64))
                continue
            bs = np.sort(rng.integers(0, 30, size=m))
            ls = rng.integers(0, 4, size=m)
            ext.append(np.stack([bs, bs + ls], axis=1).astype(np.int64))
        n = int(rng.integers(2, 15))
        assert uw_count_extents(ext, n) == _uw_count_extents_brute(ext, n)
        assert uw_count_extents(ext, None) == _uw_count_extents_brute(
            ext, None
        )


def test_uw_count_extents_reduces_to_point_kernel():
    rng = np.random.default_rng(7)
    vocab = list("abcde")
    for _ in range(200):
        toks = [vocab[i] for i in rng.integers(0, len(vocab), size=30)]
        terms = ["a", "b", "c"]
        n = int(rng.integers(2, 12))
        exts = []
        for t in terms:
            p = np.asarray([i for i, x in enumerate(toks) if x == t],
                           dtype=np.int64)
            exts.append(np.stack([p, p], axis=1) if len(p)
                        else np.empty((0, 2), np.int64))
        assert uw_count_extents(exts, n) == uw_count_py(toks, terms, n)


def test_od_match_extents_counts_agree():
    from sequential_query_expansion_spark.functions.positional import (
        od_count_positions,
    )

    rng = np.random.default_rng(11)
    for _ in range(200):
        pos = [
            np.unique(rng.integers(0, 40, size=rng.integers(0, 8)))
            .astype(np.int64)
            for _ in range(3)
        ]
        n = int(rng.integers(1, 6))
        ext = od_match_extents(pos, n)
        assert len(ext) == od_count_positions(pos, n)
        if len(ext):
            assert (ext[:, 1] >= ext[:, 0]).all()
