"""TREC-format sources and sinks.

Re-creates the reference's query/run/eval I/O surfaces:
  S3  topics parse   — SGML `<top><num><title>` and `qid:text` line
                       formats (analyseQueries, optParams/wsdm12-
                       improved-NThrsh-coordAsc.ipynb:394-432; web
                       topics configs/clueWeb09_English_1/web2009Topics)
  S11 run sink       — 6-column `qid Q0 docno rank score tag`
                       (`<trecFormat>true`, write at umls/
                       umlsSeqPubMed.ipynb:31369-31383)
  S12 eval parse     — trec_eval tab-separated (metric, qid|all, value)
                       (evals/dir/trec7n8/indriRunQuery.evals; parse at
                       umls :31480-31496)
  qrels reader       — standard `qid 0 docno rel` 4-column format.

Topic files are tiny (hundreds of rows) → parsed with spark.read.text +
regexp column functions so everything stays in the plan (no driver-side
parsing loop); runs/evals/qrels scale with the corpus → plain DataFrame
read/write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_trec_topics_sgml(spark: SparkSession, path: str) -> DataFrame:
    """SGML `<top>` blocks -> (qid, text). Title-only, like the
    reference's analyseQueries on topics.351-400."""
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )
    tagged = raw.select(
        "line_no",
        F.regexp_extract("value", r"<num>\s*Number:\s*(\d+)", 1).alias("num"),
        F.regexp_extract("value", r"<title>\s*(.*)", 1).alias("title"),
    )
    # forward-fill qid over title lines via last non-empty num
    w = F.expr(
        "last(CASE WHEN num <> '' THEN num END, true) OVER "
        "(ORDER BY line_no ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return (
        tagged.withColumn("qid", w)
        .filter((F.col("title") != "") & F.col("qid").isNotNull())
        .select("qid", F.trim("title").alias("text"))
    )


def read_topics_lines(spark: SparkSession, path: str, sep: str = ":") -> DataFrame:
    """`qid:text` one-per-line web-topic format -> (qid, text)."""
    raw = spark.read.text(path)
    return raw.select(
        F.split("value", sep).getItem(0).alias("qid"),
        F.trim(
            F.expr(f"substring(value, instr(value, '{sep}') + 1)")
        ).alias("text"),
    ).filter(F.col("qid") != "")


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """`qid 0 docno rel` -> (qid, docno, rel)."""
    return (
        spark.read.csv(path, sep=" ", schema="qid string, it string, docno string, rel int")
        .select("qid", "docno", "rel")
    )


def write_trec_run(results: DataFrame, path: str, tag: str = "sqe-spark") -> None:
    """results(qid, url|docno, rank, score) -> 6-col TREC run file."""
    name_col = "url" if "url" in results.columns else "docno"
    (
        results.select(
            F.concat_ws(
                " ",
                F.col("qid"),
                F.lit("Q0"),
                F.col(name_col),
                F.col("rank").cast("string"),
                # format_string, NOT format_number: format_number inserts
                # locale grouping separators ("1,234.567890") for scores
                # >= 1000, which trec_eval's atof truncates at the comma.
                F.format_string("%.6f", F.col("score")),
                F.lit(tag),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.csv(
            path, sep=" ",
            schema="qid string, q0 string, docno string, rank int, "
                   "score double, tag string",
        )
        .select("qid", "docno", "rank", "score")
    )


def write_indri_cfg(
    weighted_terms,
    path: str,
    count: int = 1000,
    rule: str = "method:dir,mu:1600",
    threads: int = 32,
    trec_format: bool = True,
) -> None:
    """S10 compat sink: serialize a weighted query batch as an Indri
    `<parameters>` XML file (the shape genQueries emits, umls/
    umlsSeqPubMed.ipynb:555-633 and optParams/...coordAsc.ipynb
    :1118-1213). Debug/interop surface only — the engine consumes the
    DataFrame directly. weighted_terms: (qid, term, weight)."""
    import html

    rows = (
        weighted_terms.orderBy("qid", "term")
        .select("qid", "term", "weight")
        .collect()
    )
    by_qid: dict = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append((r["term"], r["weight"]))
    parts = ["<parameters>"]
    for qid in sorted(by_qid):
        terms = " ".join(f"{w:.6f} {html.escape(t)}" for t, w in by_qid[qid])
        parts.append(
            "<query><number>{q}</number><text>#weight( {t} )</text></query>".format(
                q=html.escape(str(qid)), t=terms
            )
        )
    parts.append(f"<count>{count}</count>")
    parts.append(f"<rule>{html.escape(rule)}</rule>")
    parts.append(f"<threads>{threads}</threads>")
    if trec_format:
        parts.append("<trecFormat>true</trecFormat>")
    parts.append("</parameters>")
    with open(path, "w") as f:
        f.write("\n".join(parts) + "\n")


def read_trec_eval(spark: SparkSession, path: str) -> DataFrame:
    """trec_eval output (metric \t qid \t value) -> DataFrame; mirrors
    the reference's parse of `map` rows."""
    return spark.read.csv(
        path, sep="\t", schema="metric string, qid string, value string"
    ).select(
        F.trim("metric").alias("metric"),
        F.trim("qid").alias("qid"),
        F.col("value").cast("double").alias("value"),
    )
