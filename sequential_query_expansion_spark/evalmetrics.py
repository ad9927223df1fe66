"""TREC-style IR evaluation as DataFrame aggregations.

Replaces the reference's trec_eval / sample_eval.pl subprocesses
(umls/umlsSeqPubMed.ipynb:31426-31441 run+parse; conceptNet/
conceptNetSeq.ipynb:37641-37700 infNDCG) with native window+groupBy
programs producing the same (metric, qid, value) long format, plus the
'all' cross-query mean rows trec_eval emits.

Inputs:
  results(qid, doc_id, rank, score)  — rank 1-based, dense per qid
  qrels(qid, doc_id, rel)            — graded relevance, rel > 0 == relevant
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evaluate(results: DataFrame, qrels: DataFrame, p_at: int = 10,
             ndcg_at: int = 10) -> DataFrame:
    """-> (metric string, qid string, value double), including 'all' rows.

    Metrics: map, P_{p_at}, ndcg_cut_{ndcg_at}, recip_rank, Rprec, bpref
    — the set the reference's eval files carry (map at ipynb:31480-31496,
    P_10 / infNDCG / Rprec / bpref rows in evals/dir/*/indriRunQuery.evals).

    ``qrels`` may contain judged-nonrelevant rows (rel = 0); they feed
    bpref. Unjudged retrieved docs count as nonrelevant for precision
    metrics and are ignored by bpref, exactly like trec_eval.
    """
    j = (
        results.join(
            qrels.select("qid", "doc_id", F.col("rel").alias("rel_raw")),
            ["qid", "doc_id"],
            "left",
        )
        .withColumn("judged", F.col("rel_raw").isNotNull())
        .withColumn("rel", F.coalesce(F.col("rel_raw"), F.lit(0)))
    )

    n_rel = qrels.filter(F.col("rel") > 0).groupBy("qid").agg(
        F.count("*").alias("n_rel")
    )
    n_nonrel = qrels.filter(F.col("rel") <= 0).groupBy("qid").agg(
        F.count("*").alias("n_nonrel")
    )

    w_rank = Window.partitionBy("qid").orderBy("rank")
    w_above = w_rank.rowsBetween(Window.unboundedPreceding, -1)

    per_hit = (
        j.withColumn(
            "hits", F.sum((F.col("rel") > 0).cast("int")).over(w_rank)
        )
        .withColumn(
            "prec_at_rank",
            F.when(F.col("rel") > 0, F.col("hits").cast("double") / F.col("rank")),
        )
        .withColumn(
            "nonrel_above",
            F.coalesce(
                F.sum(
                    (F.col("judged") & (F.col("rel") <= 0)).cast("int")
                ).over(w_above),
                F.lit(0),
            ),
        )
    )

    ap = (
        per_hit.groupBy("qid")
        .agg(
            F.sum("prec_at_rank").alias("sum_prec"),
            F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
            F.sum(
                ((F.col("rel") > 0) & (F.col("rank") <= p_at)).cast("int")
            ).alias("hits_at_p"),
            F.sum(
                F.when(
                    (F.col("rel") > 0) & (F.col("rank") <= ndcg_at),
                    (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                    / F.log2(F.col("rank") + 1.0),
                )
            ).alias("dcg"),
            F.collect_list(
                F.when(F.col("rel") > 0, F.struct("rank", "nonrel_above"))
            ).alias("rel_hits"),
        )
        .join(n_rel, "qid", "left")
        .join(n_nonrel, "qid", "left")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0)))
        .withColumn("n_nonrel", F.coalesce(F.col("n_nonrel"), F.lit(0)))
        # Rprec: hits within rank ≤ R, over R
        .withColumn(
            "rprec_hits",
            F.size(F.filter("rel_hits", lambda h: h["rank"] <= F.col("n_rel"))),
        )
        # bpref: Σ over retrieved relevant of
        #   1 - min(nonrel_above, R) / min(R, N), contribution 1 when N=0
        .withColumn(
            "bpref_sum",
            F.aggregate(
                "rel_hits",
                F.lit(0.0),
                lambda acc, h: acc
                + F.when(F.col("n_nonrel") > 0,
                         1.0
                         - F.least(h["nonrel_above"], F.col("n_rel")).cast("double")
                         / F.least(F.col("n_rel"), F.col("n_nonrel")))
                .otherwise(F.lit(1.0)),
            ),
        )
    )

    # ideal DCG from qrels grades (top ndcg_at grades per qid, descending)
    w_ideal = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= ndcg_at)
        .groupBy("qid")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )

    per_q = (
        ap.join(idcg, "qid", "left")
        .select(
            "qid",
            F.when(
                F.col("n_rel") > 0,
                F.coalesce(F.col("sum_prec"), F.lit(0.0)) / F.col("n_rel"),
            )
            .otherwise(0.0)
            .alias("map"),
            (F.col("hits_at_p").cast("double") / p_at).alias(f"P_{p_at}"),
            F.when(
                F.col("idcg") > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(0.0)
            .alias(f"ndcg_cut_{ndcg_at}"),
            F.when(F.col("first_rel").isNotNull(), 1.0 / F.col("first_rel"))
            .otherwise(0.0)
            .alias("recip_rank"),
            F.when(
                F.col("n_rel") > 0,
                F.col("rprec_hits").cast("double") / F.col("n_rel"),
            )
            .otherwise(0.0)
            .alias("Rprec"),
            F.when(
                F.col("n_rel") > 0, F.col("bpref_sum") / F.col("n_rel")
            )
            .otherwise(0.0)
            .alias("bpref"),
        )
    )

    metrics = ["map", f"P_{p_at}", f"ndcg_cut_{ndcg_at}", "recip_rank",
               "Rprec", "bpref"]
    long = per_q.selectExpr(
        "qid",
        "stack({n}, {args}) as (metric, value)".format(
            n=len(metrics),
            args=", ".join(f"'{m}', `{m}`" for m in metrics),
        ),
    ).select("metric", "qid", "value")

    overall = long.groupBy("metric").agg(F.avg("value").alias("value")).select(
        "metric", F.lit("all").alias("qid"), "value"
    )
    return long.unionByName(overall)
