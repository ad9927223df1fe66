"""Feature-based sequential concept-graph query expansion.

Re-creates the reference's wsdm12 pipeline (optParams/wsdm12-improved-
NThrsh-coordAsc.ipynb) as DataFrame programs:

  probe pass A   — unexpanded top-T feedback docs + scores
                   (`getRelWords_train` :712-766 / runCommandsinHist_i)
  candidate gen  — 1-hop graph expansion of query terms (J1, lookup at
                   conceptNet adjacency cell 6 :277-295) with
                   edge-multiplicity / mutual-count filter (A1,
                   `Counter` at umls :153, countLim gate :477/:499),
                   printable filter (F3 :283/:1038) and original-term
                   exclusion (F5 :1039)
  features (A3)  — the 14-feature block of `weightRelConcept` :767-891:
                   expTDocScore, topTermFrac, numCanDocs, avgCDocScore,
                   maxCDocScore, conIdf (log(N/df), :815), avgColCor,
                   maxColCor, avgTopColCor, maxTopColCor, avgColPCor,
                   maxColPCor, avgTopColPCor, maxTopColPCor — computed
                   from feedback-doc stats, collection stats and
                   co-occurrence counts (the `fx`/`efb` probe batches of
                   occuranceCount.cpp:49-93/:191-208 become two joins)
  normalize (A4) — per-feature sum-normalization per query
                   (`normDictOfDicts` :903-958)
  combine (A5)   — weighted linear combination (`weightedCombineDicts`)
  select (T1)    — sort desc + greedy top-N (:1027-1043), NaN→0 and
                   abs like :891
  layers (R5)    — selected terms become the next layer's source
                   concepts (dist=2 re-run, cells 25-30); the loop stays
                   in the driver per SURVEY §7 hard part (iv).

Exact Indri-side count semantics are not reproducible without Indri; the
feature DEFINITIONS here are fixed, documented, and deterministic, which
is what the downstream contract (normalize→combine→select) needs.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import IndexTables
from ..scoring.bm25 import score_topk

FEATURES: List[str] = [
    "expTDocScore", "topTermFrac", "numCanDocs", "avgCDocScore",
    "maxCDocScore", "conIdf", "avgColCor", "maxColCor", "avgTopColCor",
    "maxTopColCor", "avgColPCor", "maxColPCor", "avgTopColPCor",
    "maxTopColPCor",
]

# uniform default weights (the reference trains these by coordinate
# ascent; see train.py for the ascent harness)
DEFAULT_WEIGHTS: Dict[str, float] = {f: 1.0 for f in FEATURES}

PRINTABLE_RE = "^[\\x20-\\x7e]+$"


def candidate_edges(
    query_terms: DataFrame,
    graph_edges: DataFrame,
    count_lim: int = 0,
) -> DataFrame:
    """(qid, src term) × graph -> (qid, orig, cand, n_links).

    n_links = number of distinct query terms linking to the candidate
    (the reference's mutual-count `l.count(x) > countLim`); candidates
    already present in the query are excluded (F5)."""
    qt = query_terms.select("qid", F.col("term").alias("orig")).distinct()
    edges = graph_edges.select(
        F.col("src").alias("orig"), F.col("dst").alias("cand")
    ).filter(F.col("cand").rlike(PRINTABLE_RE))
    cands = qt.join(F.broadcast(edges), "orig")
    cands = cands.join(
        qt.select("qid", F.col("orig").alias("cand")).distinct(),
        ["qid", "cand"],
        "left_anti",
    )
    # ONE aggregation instead of window+distinct: n_links counts edge
    # rows (multiplicity, the reference's l.count(x)); the exploded
    # orig-set reproduces the distinct (qid, orig, cand) rows
    return (
        cands.groupBy("qid", "cand")
        .agg(
            F.count("*").alias("n_links"),
            F.collect_set("orig").alias("origs"),
        )
        .filter(F.col("n_links") > count_lim)
        .select(
            "qid", F.explode("origs").alias("orig"), "cand", "n_links"
        )
    )


def _pair_cooccurrence(index: IndexTables, pairs: DataFrame) -> DataFrame:
    """(orig, cand, doc_id) for (orig, cand) term pairs: one row per doc
    containing both. ONE pass over the postings feeds both df_both
    (global co-occurrence) and df_both_top (feedback-doc co-occurrence)
    — at web scale the postings scans dominate, so the two downstream
    counts must share this join. pairs is tiny (queries × edges) →
    broadcast against the postings of the orig terms; only
    candidate-term postings shuffle."""
    p = pairs.select("orig", "cand").distinct()
    po = index.postings_flat.select(
        F.col("term").alias("orig"), "doc_id"
    ).join(F.broadcast(p.select("orig").distinct()), "orig")
    pc = index.postings_flat.select(
        F.col("term").alias("cand"), "doc_id"
    ).join(F.broadcast(p.select("cand").distinct()), "cand")
    return po.join(F.broadcast(p), "orig").join(pc, ["cand", "doc_id"])


def concept_features(
    index: IndexTables,
    query_terms: DataFrame,
    graph_edges: DataFrame,
    top_t: int = 10,
    count_lim: int = 0,
    rank_round: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """-> (qid, cand, <14 feature columns>) per weightRelConcept.

    ``rank_round`` selects the top-T feedback docs on round(score, d)
    (the cross-engine float policy) instead of the exact score.
    ``caches``: if given, the DataFrames this pass persists are appended
    so the caller can unpersist them once the output is materialized —
    the layered loop would otherwise accumulate per-layer cached
    partitions across iterations (executor memory at scale).
    """
    n_docs = float(index.n_docs)

    # persisted: the feedback-doc set feeds THREE consumers (candidate
    # postings intersection, top-doc length sum, orig-term intersection)
    # — without the persist each one re-runs the whole BM25 scoring join.
    # (Driver-literal materialization was tried and measured NOT faster:
    # the two extra blocking collect round-trips cost what the broadcast
    # subtree re-reads save, since both sides read the cache.)
    topdocs = score_topk(
        index, query_terms, k=top_t, rank_round=rank_round, with_url=False
    ).select("qid", "doc_id", "score").persist()

    cands = candidate_edges(query_terms, graph_edges, count_lim).persist()
    if caches is not None:
        caches += [topdocs, cands]

    vocab = index.vocab.select("term", "df")
    # one pass over vocab serves cand df, orig df AND conIdf (they were
    # three separate joins; each broadcast is a serial sub-job at test
    # scale and a vocab scan at web scale)
    cand_df = cands.select("cand").distinct().join(
        vocab.withColumnRenamed("term", "cand"), "cand"
    ).withColumn(
        "conIdf", F.log(F.lit(n_docs) / F.col("df"))
    ).persist()
    if caches is not None:
        caches.append(cand_df)
    orig_df = cands.select("orig").distinct().join(
        vocab.withColumnRenamed("term", "orig"), "orig"
    ).withColumnRenamed("df", "df_orig")

    # --- feedback-doc features: candidate postings ∩ topT docs (J4) ----
    # persisted: feeds BOTH the per-candidate aggregates and the
    # feedback-doc co-occurrence counts below; ≤ queries × topT × doclen
    # rows, so the cache is tiny while the postings scan it saves is not
    cand_in_top = (
        index.postings_flat.withColumnRenamed("term", "cand")
        .join(F.broadcast(cands.select("qid", "cand").distinct()), "cand")
        .join(F.broadcast(topdocs), ["qid", "doc_id"])
        .persist()
    )
    if caches is not None:
        caches.append(cand_in_top)
    top_dl = topdocs.join(index.doc_len, "doc_id").groupBy("qid").agg(
        F.sum("dl").alias("top_dl_sum")
    )
    fb_feats = (
        cand_in_top.groupBy("qid", "cand")
        .agg(
            F.sum("score").alias("expTDocScore"),
            F.sum("tf").alias("tf_top"),
            F.count("*").alias("numCanDocs"),
            F.avg("score").alias("avgCDocScore"),
            F.max("score").alias("maxCDocScore"),
        )
        .join(F.broadcast(top_dl), "qid")
        .withColumn("topTermFrac", F.col("tf_top") / F.col("top_dl_sum"))
        .drop("tf_top", "top_dl_sum")
    )

    # --- co-occurrence features over collection and top docs -----------
    # global counts: the postings pair-join has exactly ONE consumer now
    # (df_both), so it needs no persist
    df_both = _pair_cooccurrence(index, cands).groupBy("orig", "cand").agg(
        F.count("*").alias("df_both")
    )
    # feedback-doc counts: the top-doc set is <= queries × topT docs, so
    # df_both_top never needs the full pair-join — intersect the orig
    # terms' postings with the top docs (tiny) and join against
    # cand_in_top per (qid, doc). Same counts as filtering the pair-join
    # to top docs (both sides are one row per (term, doc)), one wide
    # postings consumption fewer per layer.
    orig_in_top = (
        index.postings_flat.withColumnRenamed("term", "orig")
        .join(F.broadcast(cands.select("qid", "orig").distinct()), "orig")
        .join(F.broadcast(topdocs.select("qid", "doc_id")), ["qid", "doc_id"])
        .select("qid", "orig", "doc_id")
    )
    both_top = (
        cand_in_top.select("qid", "cand", "doc_id")
        .join(F.broadcast(orig_in_top), ["qid", "doc_id"])
        .join(
            F.broadcast(cands.select("qid", "orig", "cand").distinct()),
            ["qid", "orig", "cand"],
            "left_semi",
        )
        .groupBy("qid", "orig", "cand")
        .agg(F.count("*").alias("df_both_top"))
    )

    pair = (
        cands.join(F.broadcast(cand_df.select("cand", "df")), "cand")
        .join(F.broadcast(orig_df), "orig")
        .join(df_both, ["orig", "cand"], "left")
        .join(both_top, ["qid", "orig", "cand"], "left")
        .fillna({"df_both": 0, "df_both_top": 0})
        .withColumn(
            "colCor",
            F.col("df_both") / F.sqrt(F.col("df_orig") * F.col("df")),
        )
        .withColumn("topColCor", F.col("df_both_top") / F.lit(float(top_t)))
        .withColumn(
            "colPCor",
            F.abs(
                F.log(
                    (F.lit(n_docs) * F.col("df_both") + 0.5)
                    / (F.col("df_orig") * F.col("df") + 0.5)
                )
            ),
        )
        .withColumn(
            "topColPCor",
            F.abs(
                F.log(
                    (F.lit(float(top_t)) * F.col("df_both_top") + 0.5)
                    / (F.col("df_both") + 0.5)
                )
            ),
        )
    )
    cooc = pair.groupBy("qid", "cand").agg(
        F.avg("colCor").alias("avgColCor"),
        F.max("colCor").alias("maxColCor"),
        F.avg("topColCor").alias("avgTopColCor"),
        F.max("topColCor").alias("maxTopColCor"),
        F.avg("colPCor").alias("avgColPCor"),
        F.max("colPCor").alias("maxColPCor"),
        F.avg("topColPCor").alias("avgTopColPCor"),
        F.max("topColPCor").alias("maxTopColPCor"),
    )

    con_idf = cand_df.select("cand", "conIdf")

    out = (
        cands.select("qid", "cand")
        .distinct()
        .join(fb_feats, ["qid", "cand"], "left")
        .join(cooc, ["qid", "cand"], "left")
        .join(F.broadcast(con_idf), "cand", "left")
    )
    # NaN→0 + abs, the reference's final cleanup (:891)
    for f in FEATURES:
        out = out.withColumn(
            f, F.abs(F.coalesce(F.nanvl(F.col(f), F.lit(0.0)), F.lit(0.0)))
        )
    return out


def normalize_and_combine(
    features: DataFrame, weights: Dict[str, float] | None = None
) -> DataFrame:
    """A4 sum-normalization per qid + A5 weighted combination ->
    (qid, cand, weight)."""
    weights = weights or DEFAULT_WEIGHTS
    w = Window.partitionBy("qid")
    score = F.lit(0.0)
    df = features
    for f in FEATURES:
        tot = F.sum(f).over(w)
        norm = F.when(tot > 0, F.col(f) / tot).otherwise(0.0)
        score = score + F.lit(float(weights.get(f, 0.0))) * norm
    return df.withColumn("weight", score).select("qid", "cand", "weight")


def select_expansion_terms(
    weighted: DataFrame, n_terms: int = 20, threshold: float | None = None,
    rank_round: int | None = None,
) -> DataFrame:
    """T1: rank desc (weight, cand asc tie-break) and keep top-N, or the
    probability-threshold variant (wsdm12-improved-probThrsh).
    ``rank_round`` ranks on round(weight, d) for cross-engine stability."""
    if threshold is not None:
        return weighted.filter(F.col("weight") >= threshold)
    key = (
        F.round("weight", rank_round) if rank_round is not None
        else F.col("weight")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(key), F.asc("cand"))
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_terms)
        .drop("rn")
    )


def sequential_expand(
    index: IndexTables,
    query_terms: DataFrame,
    graph_edges: DataFrame,
    layers: int = 2,
    per_layer_terms: tuple = (20, 2),
    layer_weights: tuple = (0.3, 0.05),
    top_t: int = 10,
    count_lim: int = 0,
    feature_weights: Dict[str, float] | None = None,
    rank_round: int | None = None,
) -> DataFrame:
    """R5 layered expansion: layer ℓ candidates come from layer ℓ-1's
    selected terms (dist grows per layer). Returns
    (qid, term, weight, layer) with layer 0 = original query terms
    (weight = multiplicity), layers ≥ 1 scaled by ``layer_weights``.
    ``rank_round`` makes every discrete selection (feedback docs,
    per-layer term pick) rank on rounded keys — the cross-engine policy.
    """
    out = query_terms.select(
        "qid", "term", F.col("weight").cast("double").alias("weight"),
        F.lit(0).alias("layer"),
    )
    sources = query_terms.select("qid", "term", "weight")
    for ell in range(1, layers + 1):
        layer_caches: list = []
        feats = concept_features(
            index, sources, graph_edges, top_t=top_t, count_lim=count_lim,
            rank_round=rank_round, caches=layer_caches,
        )
        weighted = normalize_and_combine(feats, feature_weights)
        sel = select_expansion_terms(
            weighted, n_terms=per_layer_terms[ell - 1], rank_round=rank_round
        )
        # exclude anything already selected in ANY earlier layer
        sel = sel.join(
            out.select("qid", F.col("term").alias("cand")), ["qid", "cand"],
            "left_anti",
        )
        # Materialize the layer's selection before it feeds BOTH the
        # next layer's sources and the final union: without this, layer
        # ℓ+1's (lazy) plan re-derives the whole layer-ℓ feature
        # pipeline once per reference — an iterative-lineage blowup that
        # turns 2 layers into an hours-long analysis/execution. The
        # selection is tiny (≤ queries × per_layer_terms rows), so a
        # driver-side rebuild is the cheapest hard lineage cut.
        sel = sel.sparkSession.createDataFrame(
            sel.select("qid", "cand", "weight").collect(),
            "qid string, cand string, weight double",
        )
        # the selection is materialized — release this layer's caches so
        # iterations don't accumulate persisted partitions
        for df in layer_caches:
            df.unpersist()
        lw = float(layer_weights[ell - 1])
        out = out.unionByName(
            sel.select(
                "qid",
                F.col("cand").alias("term"),
                (F.lit(lw) * F.col("weight")).alias("weight"),
                F.lit(ell).alias("layer"),
            )
        )
        sources = sel.select(
            "qid", F.col("cand").alias("term"), F.lit(1.0).alias("weight")
        )
    return out


def expanded_topk(
    index: IndexTables,
    query_terms: DataFrame,
    graph_edges: DataFrame,
    k: int = 1000,
    orig_weight: float = 0.7,
    rank_round: int | None = None,
    **kwargs,
) -> DataFrame:
    """R2 `#weight(w orig (1-w) expansion)` final run over the layered
    expansion (the reference's genQueries + precisionCompute stage)."""
    exp = sequential_expand(
        index, query_terms, graph_edges, rank_round=rank_round, **kwargs
    )
    # The expansion table is <= queries x (|q| + Σ per_layer_terms) rows
    # and its layers were already materialized driver-side by
    # sequential_expand's lineage cuts — normalize/interpolate in the
    # driver and feed ONE scoring join, instead of two window passes +
    # union + re-aggregation over a 100-row DataFrame (4 exchanges of
    # pure stage latency at any scale; the scoring join is unchanged).
    rows = exp.collect()
    orig_tot: dict = {}
    rest_tot: dict = {}
    for r in rows:
        if r["layer"] == 0:
            orig_tot[r["qid"]] = orig_tot.get(r["qid"], 0.0) + r["weight"]
        else:
            rest_tot[r["qid"]] = rest_tot.get(r["qid"], 0.0) + r["weight"]
    mixed: dict = {}
    for r in rows:
        if r["layer"] == 0:
            w = orig_weight * r["weight"] / orig_tot[r["qid"]]
        elif rest_tot.get(r["qid"], 0.0) > 0:
            w = (1.0 - orig_weight) * r["weight"] / rest_tot[r["qid"]]
        else:
            w = 0.0
        key = (r["qid"], r["term"])
        mixed[key] = mixed.get(key, 0.0) + w
    mixed_df = exp.sparkSession.createDataFrame(
        [(q, t, w) for (q, t), w in sorted(mixed.items())],
        "qid string, term string, weight double",
    )
    return score_topk(index, mixed_df, k=k, rank_round=rank_round)
