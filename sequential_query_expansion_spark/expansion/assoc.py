"""`assoc` expansion: candidates weighted by a static association score
instead of the 14-feature combine.

Reference: the ConceptNet association-score methods — `/assoc` REST
calls in optParams/wsdm12-improved-NThrsh-coordAsc.ipynb (cell 16, raw
~968-975) — with three golden eval families (evals/{assoc,assoc2,
assocRestful}/trec7n8/cnet, best TREC7&8 MAP 0.2042). In the reference
the assoc/assoc2 variants differ only in WHICH pre-dumped score table
they load (cell 1 resolves `graphs/<method-minus-digits>/.../graph.txt`,
i.e. assoc2 is the same algorithm over a different table build);
assocRestful queries the live endpoint. The ``assoc_table`` parameter
therefore covers all three variants by table swap. The network call is
a non-goal; here the scores come from a STATIC (src, dst, assoc) table. The engine also ships a corpus-derived builder whose score is the
doc-set Jaccard association — deterministic and SQL-recomputable, which
is what gives the contract entry a DuckDB value oracle.

Physical shape: the query-side src-term list is broadcast into the
postings scan twice (src postings, then co-occurring terms); only
matched postings shuffle, aggregated map-side — the same
broadcast-small / shuffle-matched-only shape as the scoring join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.build import IndexTables
from .concept_graph import PRINTABLE_RE


def assoc_table_from_index(
    index: IndexTables, src_terms: DataFrame, min_df_both: int = 2
) -> DataFrame:
    """src_terms(orig) -> (orig, cand, assoc) with
    assoc = |D(orig) ∩ D(cand)| / |D(orig) ∪ D(cand)|  (doc-set Jaccard).

    The static-table analogue of ConceptNet association scores, derived
    from the corpus itself."""
    srcs = src_terms.select(F.col("orig")).distinct()
    src_post = index.postings_flat.select(
        F.col("term").alias("orig"), "doc_id"
    ).join(F.broadcast(srcs), "orig")
    pair_df = (
        src_post.join(
            index.postings_flat.select(F.col("term").alias("cand"), "doc_id"),
            "doc_id",
        )
        .filter(F.col("cand") != F.col("orig"))
        .groupBy("orig", "cand")
        .agg(F.count("*").alias("df_both"))
        .filter(F.col("df_both") >= min_df_both)
    )
    dfs = index.vocab.select("term", "df")
    return (
        pair_df.join(
            F.broadcast(dfs.select(F.col("term").alias("orig"),
                                   F.col("df").alias("df_src"))),
            "orig",
        )
        .join(dfs.select(F.col("term").alias("cand"),
                         F.col("df").alias("df_cand")), "cand")
        .select(
            "orig",
            "cand",
            (
                F.col("df_both").cast("double")
                / (F.col("df_src") + F.col("df_cand") - F.col("df_both"))
            ).alias("assoc"),
        )
    )


def assoc_expand(
    index: IndexTables,
    query_terms: DataFrame,
    n_terms: int = 20,
    assoc_table: DataFrame | None = None,
    min_df_both: int = 2,
    rank_round: int | None = None,
) -> DataFrame:
    """query_terms(qid, term[, weight]) -> (qid, term, weight):
    candidates scored by the SUM of association scores over the query's
    terms (the multi-term analogue of the reference's query↔concept
    assoc score), top ``n_terms`` per qid (score desc, term asc),
    sum-normalized to a weight distribution.

    Pass ``assoc_table(orig, cand, assoc)`` to use published/static
    scores (the assoc/assoc2/assocRestful golden families); by default
    the corpus-derived Jaccard table stands in."""
    qt = query_terms.select("qid", F.col("term").alias("orig")).distinct()
    if assoc_table is None:
        assoc_table = assoc_table_from_index(
            index, qt.select("orig"), min_df_both
        )
    cands = (
        qt.join(assoc_table, "orig")
        .filter(F.col("cand").rlike(PRINTABLE_RE))
        # original-term exclusion (F5)
        .join(
            qt.select("qid", F.col("orig").alias("cand")).distinct(),
            ["qid", "cand"],
            "left_anti",
        )
        .groupBy("qid", "cand")
        .agg(F.sum("assoc").alias("score"))
    )
    sort_score = (
        F.round("score", rank_round) if rank_round is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("cand"))
    top = cands.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= n_terms
    )
    wsum = Window.partitionBy("qid")
    return top.select(
        "qid",
        F.col("cand").alias("term"),
        (F.col("score") / F.sum("score").over(wsum)).alias("weight"),
    )
