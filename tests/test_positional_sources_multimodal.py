"""Positional window ops, TREC/graph sources, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequential_query_expansion_spark.functions import positional as pos
from sequential_query_expansion_spark.operators import multimodal as mm
from sequential_query_expansion_spark.sources import graph as gsrc
from sequential_query_expansion_spark.sources import trec


# ---------------------------------------------------------------- positional

CASES = [
    # (tokens, terms, n, od_expected, uw_expected)
    ("a b c a b", ["a", "b"], 1, 2, 0),
    ("a b c a b", ["a", "b"], 4, 2, 3),
    ("a c c c b", ["a", "b"], 2, 0, 0),
    ("a c c c b", ["a", "b"], 4, 1, 0),
    ("a c c c b", ["a", "b"], 5, 1, 1),
    ("b a", ["a", "b"], 4, 0, 1),
    ("a a a", ["a", "b"], 4, 0, 0),
    ("x a y b z c", ["a", "b", "c"], 2, 1, 0),
    ("x a y b z c", ["a", "b", "c"], 3, 1, 0),
    ("x a y b z c", ["a", "b", "c"], 5, 1, 1),
]


@pytest.mark.parametrize("text,terms,n,od_want,uw_want", CASES)
def test_window_counts_py(text, terms, n, od_want, uw_want):
    toks = text.split()
    assert pos.od_count_py(toks, terms, n) == od_want
    assert pos.uw_count_py(toks, terms, n) == uw_want


def test_window_udfs_and_col_agree(spark):
    rows = [(i, c[0].split()) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id int, tokens array<string>").persist()
    for i, (text, terms, n, od_want, uw_want) in enumerate(CASES):
        row = (
            df.filter(F.col("id") == i)
            .select(
                pos.od_count_udf(terms, n)("tokens").alias("od"),
                pos.uw_count_udf(terms, n)("tokens").alias("uw"),
            )
            .head()
        )
        assert row["od"] == od_want, (i, "od")
        assert row["uw"] == uw_want, (i, "uw")
        if len(terms) == 2:
            col = (
                df.filter(F.col("id") == i)
                .select(
                    pos.bigram_od_count_col(
                        F.col("tokens"), terms[0], terms[1], n
                    ).alias("c")
                )
                .head()["c"]
            )
            assert col == od_want, (i, "bigram col")


# ------------------------------------------------------------------ sources

def test_trec_topics_sgml_roundtrip(spark, tmp_path):
    p = tmp_path / "topics.sgml"
    p.write_text(
        "<top>\n<num> Number: 351\n<title> falkland petroleum exploration\n"
        "<desc> Description:\nignored\n</top>\n"
        "<top>\n<num> Number: 352\n<title> british chunnel impact\n</top>\n"
    )
    got = {
        r["qid"]: r["text"]
        for r in trec.read_trec_topics_sgml(spark, str(p)).collect()
    }
    assert got == {
        "351": "falkland petroleum exploration",
        "352": "british chunnel impact",
    }


def test_topics_lines_and_qrels(spark, tmp_path):
    t = tmp_path / "web"
    t.write_text("wt09-1:obama family tree\nwt09-2:france world cup 98\n")
    got = {r["qid"]: r["text"] for r in trec.read_topics_lines(spark, str(t)).collect()}
    assert got["wt09-1"] == "obama family tree"
    q = tmp_path / "qrels"
    q.write_text("351 0 FT911-1 1\n351 0 FT911-2 0\n352 0 FT911-3 2\n")
    qr = trec.read_qrels(spark, str(q)).collect()
    assert len(qr) == 3
    assert {r["rel"] for r in qr} == {0, 1, 2}


def test_trec_run_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("q1", "doc-a", 1, 3.5), ("q1", "doc-b", 2, 2.25)],
        "qid string, docno string, rank int, score double",
    )
    out = str(tmp_path / "run")
    trec.write_trec_run(df, out, tag="t")
    back = trec.read_trec_run(spark, out).orderBy("rank").collect()
    assert [r["docno"] for r in back] == ["doc-a", "doc-b"]
    assert back[0]["score"] == pytest.approx(3.5)


def test_conceptnet_csv_inverse(spark, tmp_path):
    p = tmp_path / "cn.csv"
    p.write_text("IsA,car,vehicle\nRelatedTo,car,road\n")
    e = gsrc.read_conceptnet_csv(spark, str(p)).collect()
    pairs = {(r["src"], r["dst"]) for r in e}
    assert ("car", "vehicle") in pairs and ("vehicle", "car") in pairs
    assert len(pairs) == 4


def test_rrf_scans(spark, tmp_path):
    mrconso = tmp_path / "MRCONSO.RRF"
    # 15+ pipe fields; keep row0 valid-ENG/P/PF/Y, row1 filtered out
    good = ["C001", "ENG", "P", "L1", "PF", "S1", "Y"] + [""] * 7 + ["Heart Attack (disorder)"]
    bad = ["C002", "FRE", "P", "L1", "PF", "S1", "Y"] + [""] * 7 + ["Crise"]
    mrconso.write_text("|".join(good) + "|\n" + "|".join(bad) + "|\n")
    got = gsrc.read_mrconso(spark, str(mrconso)).collect()
    assert len(got) == 1 and got[0]["name"] == "heart attack"

    mrrel = tmp_path / "MRREL.RRF"
    mrrel.write_text("C001|x|y|RO|C002|\nC001|x|y|RO|C002|\nC001|x|y|RB|C003|\n")
    rel = {
        (r["src"], r["dst"]): r["weight"]
        for r in gsrc.read_mrrel(spark, str(mrrel)).collect()
    }
    assert rel[("C001", "C002")] == 2 and rel[("C001", "C003")] == 1

    mrsty = tmp_path / "MRSTY.RRF"
    mrsty.write_text("C001|T047|\nC002|T121|\n")
    sty = gsrc.read_mrsty(spark, str(mrsty))
    edges = gsrc.read_mrrel(spark, str(mrrel))
    kept = gsrc.sty_whitelist_filter(edges, sty, ["T121"]).collect()
    assert {r["dst"] for r in kept} == {"C002"}


def test_indri_cfg_writer(spark, tmp_path):
    wt = spark.createDataFrame(
        [("q1", "heart", 0.7), ("q1", "attack", 0.3), ("q2", "flu", 1.0)],
        "qid string, term string, weight double",
    )
    p = tmp_path / "batch.cfg"
    trec.write_indri_cfg(wt, str(p), count=10, rule="method:dir,mu:1600")
    txt = p.read_text()
    assert txt.startswith("<parameters>") and txt.rstrip().endswith("</parameters>")
    assert "<number>q1</number>" in txt
    assert "#weight( 0.300000 attack 0.700000 heart )" in txt  # (qid, term) sort
    assert "<count>10</count>" in txt and "<trecFormat>true</trecFormat>" in txt


def test_table_io_parquet_fallback(spark, tmp_path):
    from sequential_query_expansion_spark.sources import tables

    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 0)], "id long, v string, bucket int"
    )
    path = str(tmp_path / "t")
    tables.write_table(df, path, partition_by=["bucket"])
    back = tables.read_table(spark, path)
    assert back.count() == 3
    assert {r["v"] for r in back.collect()} == {"a", "b", "c"}
    tables.write_table(df.limit(1), path, mode="append", partition_by=["bucket"])
    assert tables.read_table(spark, path).count() == 4
    assert not tables.iceberg_available(spark)  # no catalog in sandbox


def test_semantic_types_table(spark):
    df = gsrc.semantic_types_df(spark)
    rows = {r["tui"] for r in df.collect()}
    assert rows == set(gsrc.GOOD_TUIS) and len(rows) == 6


# --------------------------------------------------------------- multimodal

@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(20)],
        "doc_id long, text string",
    )
    return mm.synthesize_payload_table(docs).persist()


def test_image_features_shape_and_determinism(payloads):
    a = mm.image_features(payloads).orderBy("doc_id").collect()
    b = mm.image_features(payloads).orderBy("doc_id").collect()
    assert len(a) == 20
    assert all(len(r["feat"]) == mm.IMAGE_FEAT_DIM for r in a)
    assert [r["feat"] for r in a] == [r["feat"] for r in b]
    assert all(64 <= r["width"] <= 2048 for r in a)


def test_image_resize_schema(payloads):
    out = mm.image_resize(payloads, 32, 32).collect()
    assert all(r["thumb_w"] == 32 and isinstance(r["thumb"], (bytes, bytearray))
               for r in out)


def test_audio_and_video(payloads):
    au = mm.audio_features(payloads).collect()
    assert all(len(r["mfcc"]) == 13 and r["duration_s"] > 0 for r in au)
    vf = mm.video_frame_sample(payloads, every_s=0.5, max_frames=4)
    pdf = vf.toPandas()
    assert pdf.groupby("doc_id").frame_idx.max().max() <= 3
    assert (pdf.ts_s == pdf.frame_idx * 0.5).all()
    assert all(len(x) == 4 for x in pdf.frame_feat)


def test_strict_mode_raises(payloads):
    with pytest.raises(Exception):
        mm.image_features(payloads, strict=True).collect()
