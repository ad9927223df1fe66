"""Sequential pseudo-relevance-feedback query expansion (RM1/RM3) as
DataFrame programs.

Re-creates the reference's PRF stage — Indri `<fbDocs>N</fbDocs>
<fbTerms>M</fbTerms>` relevance-model expansion written into every query
config (umls/umlsSeqPubMed.ipynb:602-603, configs/cds14/indriRunQuery.cfg
tail) and the `#weight(w orig (1-w) expansion)` interpolation
(configs/trec7n8/wsdmImpr/cnet/indriRunQuery.cfg:5-8) — as RM3 over BM25
feedback docs, per BASELINE.json north_star.

Semantics are EXACTLY ``oracle.rm3_expand`` (rank-identity tested):
  1. run the unexpanded BM25 top-``fb_docs``
  2. doc weight  w_d = score_d / Σ score        (per qid)
  3. RM1:  P(t|R) = Σ_d w_d · tf(t,d) / dl(d)
  4. keep top ``fb_terms`` by (weight desc, term asc), renormalize
  5. interpolate: w(t) = ow · count_q(t)/|q|  +  (1-ow) · rm1_n(t)

Physical shape at scale: step 1 is the broadcast scoring join; step 3
joins ``postings_flat`` against the tiny (qid × fb_docs) feedback set —
the FEEDBACK side is broadcast, so the postings table never shuffles.
Everything is built-in column algebra (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import IndexTables, K1, B
from ..scoring.bm25 import score_topk


def rm3_expand_df(
    index: IndexTables,
    query_terms: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 20,
    orig_weight: float = 0.5,
    k1: float = K1,
    b: float = B,
    rank_round: int | None = None,
    method: str = "bm25",
    mu: float = 1600.0,
) -> DataFrame:
    """query_terms(qid, term, weight) -> expanded (qid, term, weight).

    ``weight`` on input is the query-term multiplicity (what
    ``query_term_table`` emits); output weights are the interpolated RM3
    distribution. ``rank_round`` ranks feedback docs and fb_terms on
    rounded values (cross-engine float-jitter guard; see score_topk).

    ``method``: feedback run + doc-weighting model. "bm25" (default,
    north_rule-pinned): doc weight = score / Σ score. "dir" (the
    reference's actual Indri LM PRF): the feedback run is Dirichlet QL
    and its LOG scores become posteriors via a per-qid stable softmax —
    score-proportional weights would be meaningless (and sign-broken)
    for log probabilities.
    """
    if method not in ("bm25", "dir"):
        raise ValueError(
            f"unknown RM3 method {method!r}; choose 'bm25' or 'dir' "
            "(two-stage smoothing has no standard relevance-model "
            "posterior and is not supported for PRF)"
        )
    w_tot = Window.partitionBy("qid")
    if method == "dir":
        from ..scoring.lm import dirichlet_topk

        top = dirichlet_topk(
            index, query_terms, k=fb_docs, mu=mu, rank_round=rank_round
        ).select("qid", "doc_id", "score")
        e = F.exp(F.col("score") - F.max("score").over(w_tot))
        fb = top.withColumn("e", e).withColumn(
            "w_doc", F.col("e") / F.sum("e").over(w_tot)
        ).select("qid", "doc_id", "w_doc")
    else:
        top = score_topk(
            index, query_terms, k=fb_docs, k1=k1, b=b,
            rank_round=rank_round, with_url=False,
        ).select("qid", "doc_id", "score")
        fb = top.withColumn(
            "w_doc", F.col("score") / F.sum("score").over(w_tot)
        ).select("qid", "doc_id", "w_doc")

    # RM1: join term-major postings against the tiny feedback set.
    rm1 = (
        index.postings_flat.join(F.broadcast(fb), "doc_id")
        .groupBy("qid", "term")
        .agg(F.sum(F.col("w_doc") * F.col("tf") / F.col("dl")).alias("w"))
    )

    sort_w = F.round("w", rank_round + 3) if rank_round is not None else F.col("w")
    w_rank = Window.partitionBy("qid").orderBy(F.desc(sort_w), F.asc("term"))
    rm1_top = rm1.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") <= fb_terms
    )
    rm1_n = rm1_top.withColumn("w_n", F.col("w") / F.sum("w").over(w_tot)).select(
        "qid", "term", (F.lit(1.0 - orig_weight) * F.col("w_n")).alias("weight")
    )

    n_q = query_terms.groupBy("qid").agg(F.sum("weight").alias("n_q"))
    orig = query_terms.join(n_q, "qid").select(
        "qid", "term", (F.lit(orig_weight) * F.col("weight") / F.col("n_q")).alias("weight")
    )

    return (
        orig.unionByName(rm1_n)
        .groupBy("qid", "term")
        .agg(F.sum("weight").alias("weight"))
    )


def rm3_topk(
    index: IndexTables,
    query_terms: DataFrame,
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 20,
    orig_weight: float = 0.5,
    k1: float = K1,
    b: float = B,
    rank_round: int | None = None,
    method: str = "bm25",
    mu: float = 1600.0,
) -> DataFrame:
    """Full expanded run: expand, then re-score (the reference's final
    `#weight(0.7 orig 0.3 expansion)` retrieval pass). ``method`` picks
    the model for BOTH passes ("bm25" or "dir")."""
    expanded = rm3_expand_df(
        index, query_terms, fb_docs=fb_docs, fb_terms=fb_terms,
        orig_weight=orig_weight, k1=k1, b=b, rank_round=rank_round,
        method=method, mu=mu,
    )
    if method == "dir":
        from ..scoring.lm import dirichlet_topk

        return dirichlet_topk(index, expanded, k=k, mu=mu,
                              rank_round=rank_round)
    return score_topk(index, expanded, k=k, k1=k1, b=b, rank_round=rank_round)
