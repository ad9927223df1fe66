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


def evaluate(results: DataFrame, qrels: DataFrame,
             p_at: int | list = 10,
             ndcg_at: int | list = 10) -> DataFrame:
    """-> (metric string, qid string, value double), including 'all' rows.

    Metrics: map, P_{k} for each cutoff in ``p_at``, ndcg_cut_{k} for
    each cutoff in ``ndcg_at`` (ints or lists — trec_eval's ladder is
    5,10,15,20,30,100,200,500,1000), recip_rank, Rprec, bpref, num_ret,
    num_rel, num_rel_ret, and the 11 interpolated-precision points
    iprec_at_recall_0.00..1.00 — the full row inventory of the
    reference's eval files (evals/dir/trec7n8/indriRunQuery.evals carries
    30 rows per block; map at ipynb:31480-31496). The 'all' row for the
    three count metrics is the SUM over queries (trec_eval semantics);
    every other 'all' row is the arithmetic mean.

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

    p_cuts = [p_at] if isinstance(p_at, int) else list(p_at)
    n_cuts = [ndcg_at] if isinstance(ndcg_at, int) else list(ndcg_at)

    ap = (
        per_hit.groupBy("qid")
        .agg(
            F.sum("prec_at_rank").alias("sum_prec"),
            F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
            *[
                F.sum(
                    ((F.col("rel") > 0) & (F.col("rank") <= p)).cast("int")
                ).alias(f"hits_at_{p}")
                for p in p_cuts
            ],
            *[
                F.sum(
                    F.when(
                        (F.col("rel") > 0) & (F.col("rank") <= n),
                        (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                        / F.log2(F.col("rank") + 1.0),
                    )
                ).alias(f"dcg_{n}")
                for n in n_cuts
            ],
            F.collect_list(
                F.when(
                    F.col("rel") > 0,
                    F.struct("rank", "nonrel_above", "hits"),
                )
            ).alias("rel_hits"),
            F.count("*").alias("num_ret"),
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

    # ideal DCG from qrels grades (top-k grades per qid, descending),
    # one column per requested cutoff
    w_ideal = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= max(n_cuts))
        .groupBy("qid")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("irank") <= n,
                        (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                        / F.log2(F.col("irank") + 1.0),
                    )
                ).alias(f"idcg_{n}")
                for n in n_cuts
            ]
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
            *[
                (F.col(f"hits_at_{p}").cast("double") / p).alias(f"P_{p}")
                for p in p_cuts
            ],
            *[
                F.when(
                    F.col(f"idcg_{n}") > 0,
                    F.coalesce(F.col(f"dcg_{n}"), F.lit(0.0))
                    / F.col(f"idcg_{n}"),
                )
                .otherwise(0.0)
                .alias(f"ndcg_cut_{n}")
                for n in n_cuts
            ],
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
            F.col("num_ret").cast("double").alias("num_ret"),
            F.col("n_rel").cast("double").alias("num_rel"),
            F.size("rel_hits").cast("double").alias("num_rel_ret"),
            # interpolated precision at the 11 standard recall points:
            # iprec(r) = max{ prec(k) : recall(k) ≥ r } — the max is
            # attained at a relevant-hit rank, so rel_hits suffices.
            # recall(k) ≥ j/10 ⇔ 10·hits ≥ j·R (integer arithmetic, so a
            # cross-engine oracle can't disagree at the boundary).
            *[
                F.coalesce(
                    F.array_max(
                        F.transform(
                            F.filter(
                                "rel_hits",
                                lambda h: (h["hits"] * 10)
                                >= F.lit(lvl) * F.col("n_rel"),
                            ),
                            lambda h: h["hits"].cast("double") / h["rank"],
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"iprec_at_recall_{lvl / 10:.2f}")
                for lvl in range(11)
            ],
        )
    )

    metrics = ["map", *[f"P_{p}" for p in p_cuts],
               *[f"ndcg_cut_{n}" for n in n_cuts], "recip_rank",
               "Rprec", "bpref", "num_ret", "num_rel", "num_rel_ret",
               *[f"iprec_at_recall_{lvl / 10:.2f}" for lvl in range(11)]]
    long = per_q.selectExpr(
        "qid",
        "stack({n}, {args}) as (metric, value)".format(
            n=len(metrics),
            args=", ".join(f"'{m}', `{m}`" for m in metrics),
        ),
    ).select("metric", "qid", "value")

    count_metrics = ["num_ret", "num_rel", "num_rel_ret"]
    overall = long.groupBy("metric").agg(
        F.when(
            F.col("metric").isin(count_metrics), F.sum("value")
        ).otherwise(F.avg("value")).alias("value")
    ).select("metric", F.lit("all").alias("qid"), "value")
    return long.unionByName(overall)


def evaluate_inferred(results: DataFrame, sampled_qrels: DataFrame) -> DataFrame:
    """infAP / infNDCG over SAMPLED judgments — the native analogue of
    the reference's sample_eval.pl runs (conceptNet/conceptNetSeq.ipynb:
    37614-37700; the CDS14 headline infNDCG 0.2889, README.md:28).

    ``sampled_qrels(qid, doc_id, rel, rate)``: each judged doc carries
    the sampling rate of its stratum (P[judged | in stratum]). Estimators
    are inverse-probability-weighted:

      R̂       = Σ_{judged rel} 1/rate
      infAP   = (1/R̂) Σ_{retrieved judged rel @ k} (1/rate)·p̂(k),
                p̂(k) = (1 + Σ_{judged rel above k} 1/rate′) / k
      infNDCG = DCĜ / IDCĜ,
                DCĜ  = Σ_{retrieved judged rel @ k} (2^rel−1)/log2(k+1)/rate
                IDCĜ = ideal DCG of the IPW-estimated per-grade counts
                       (rounded to integers, grades filled descending)

    With rate ≡ 1 both reduce EXACTLY to AP and full-depth NDCG
    (regression-tested); at rate < 1 they are unbiased up to the
    integer rounding of IDCĜ. Returns (metric, qid, value) + 'all' means.
    """
    j = results.join(
        sampled_qrels.select("qid", "doc_id", "rel", "rate"),
        ["qid", "doc_id"],
        "left",
    ).withColumn(
        "w_rel",
        F.when(F.col("rel") > 0, F.lit(1.0) / F.col("rate")).otherwise(0.0),
    )

    w_rank = Window.partitionBy("qid").orderBy("rank")
    w_above = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    per_hit = j.withColumn(
        "rel_above_hat", F.coalesce(F.sum("w_rel").over(w_above), F.lit(0.0))
    )

    r_hat = (
        sampled_qrels.filter(F.col("rel") > 0)
        .groupBy("qid")
        .agg(F.sum(F.lit(1.0) / F.col("rate")).alias("r_hat"))
    )

    per_q_sums = (
        per_hit.filter(F.col("rel") > 0)
        .groupBy("qid")
        .agg(
            F.sum(
                (F.lit(1.0) / F.col("rate"))
                * (1.0 + F.col("rel_above_hat"))
                / F.col("rank")
            ).alias("ap_sum"),
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + 1.0)
                / F.col("rate")
            ).alias("dcg_hat"),
        )
    )

    # IDCĜ: IPW-estimated count per grade, rounded, filled descending.
    grade_counts = (
        sampled_qrels.filter(F.col("rel") > 0)
        .groupBy("qid", "rel")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("rate"))).cast("long").alias("n_g"))
        .filter(F.col("n_g") > 0)
    )
    w_grade = Window.partitionBy("qid").orderBy(F.desc("rel"))
    idcg = (
        grade_counts.withColumn(
            "start",
            F.coalesce(
                F.sum("n_g").over(w_grade.rowsBetween(
                    Window.unboundedPreceding, -1
                )),
                F.lit(0),
            ),
        )
        .withColumn(
            "idcg_part",
            F.aggregate(
                F.sequence(F.col("start") + 1, F.col("start") + F.col("n_g")),
                F.lit(0.0),
                lambda acc, i: acc
                + (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(i.cast("double") + 1.0),
            ),
        )
        .groupBy("qid")
        .agg(F.sum("idcg_part").alias("idcg_hat"))
    )

    per_q = (
        results.select("qid").distinct()
        .join(per_q_sums, "qid", "left")
        .join(r_hat, "qid", "left")
        .join(idcg, "qid", "left")
        .select(
            "qid",
            F.when(
                F.col("r_hat") > 0,
                F.coalesce(F.col("ap_sum"), F.lit(0.0)) / F.col("r_hat"),
            ).otherwise(0.0).alias("infAP"),
            F.when(
                F.col("idcg_hat") > 0,
                F.coalesce(F.col("dcg_hat"), F.lit(0.0)) / F.col("idcg_hat"),
            ).otherwise(0.0).alias("infNDCG"),
        )
    )
    long = per_q.selectExpr(
        "qid", "stack(2, 'infAP', infAP, 'infNDCG', infNDCG) as (metric, value)"
    ).select("metric", "qid", "value")
    overall = long.groupBy("metric").agg(F.avg("value").alias("value")).select(
        "metric", F.lit("all").alias("qid"), "value"
    )
    return long.unionByName(overall)
