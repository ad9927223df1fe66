"""Persisted IVF-PQ ANN index: bucket-partitioned codes on disk.

Layout under ``out_dir``::

    codes/bucket=<b>/*.parquet   — (vec_id, codes array<int>) per coarse list
    centroids.json               — coarse codebook, row-major
    codebooks.json               — PQ codebooks, (m, k, dsub) nested
    manifest.json                — dims + params + row count

The write is the at-scale shape the in-memory ``ivfpq_topk`` docstring
promises: encoding happens once, the codes land PARTITIONED BY BUCKET,
and a query's ``nprobe`` lists become parquet PARTITION PRUNING — the
scan literally never opens the other lists' files. Codes are m small
ints per vector, so the index is ~16-32× smaller than the vectors; the
optional refine stage reads original vectors from the SOURCE table for
the shortlist only.

Reference parity: the reference serves from a prebuilt on-disk Indri
index rather than recomputing per query (`configs/*/indriRunQuery.cfg`
<index> paths); this module is the same publish-once-query-many shape
for the embedding column.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim

_FMT_VERSION = 1


def write_ivfpq(
    embeddings: DataFrame,
    out_dir: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int | None = None,
) -> None:
    """Encode (one mapInPandas pass: coarse assignment + residual PQ
    codes) and publish bucket-partitioned. Matrices are written LAST so
    a crashed write is detectably incomplete (`load_ivfpq` refuses a
    dir without a manifest)."""
    centroids = np.asarray(centroids, dtype=np.float64)
    codebooks = np.asarray(codebooks, dtype=np.float64)
    from pyspark.sql import types as T

    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    schema = T.StructType(
        list(e.schema.fields)
        + [T.StructField("bucket", T.IntegerType()),
           T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )
    coded = e.mapInPandas(
        sim._ivfpq_encode_fn(centroids, codebooks, "vec", score_round),
        schema=schema,
    ).select("vec_id", "bucket", "codes")
    coded.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "codes")
    )
    for name, arr in (("centroids", centroids), ("codebooks", codebooks)):
        tmp = os.path.join(out_dir, f"{name}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(arr.tolist(), f)
        os.replace(tmp, os.path.join(out_dir, f"{name}.json"))
    man = {
        "format_version": _FMT_VERSION,
        "dim": int(centroids.shape[1]),
        "n_centroids": int(centroids.shape[0]),
        "m": int(codebooks.shape[0]),
        "k": int(codebooks.shape[1]),
        "score_round": score_round,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def load_ivfpq(out_dir: str):
    """(manifest, centroids, codebooks) — refuses an incomplete dir."""
    mpath = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{out_dir} is not a complete IVF-PQ index (no manifest.json)"
        )
    with open(mpath) as f:
        man = json.load(f)
    if man.get("format_version") != _FMT_VERSION:
        raise ValueError(
            f"unsupported ANN index format {man.get('format_version')}"
        )
    cents = np.array(
        json.load(open(os.path.join(out_dir, "centroids.json"))),
        dtype=np.float64,
    )
    cbs = np.array(
        json.load(open(os.path.join(out_dir, "codebooks.json"))),
        dtype=np.float64,
    )
    return man, cents, cbs


def query_ivfpq(
    spark: SparkSession,
    out_dir: str,
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    refine: int | None = None,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against the published codes. The bucket filter is a
    PartitionFilter on the parquet scan — only the probed lists' files
    are opened. ``refine`` re-ranks the shortlist with exact distances
    read from the SOURCE ``embeddings`` table (required iff refine)."""
    man, centroids, codebooks = load_ivfpq(out_dir)
    score_round = man["score_round"]
    probe_rows = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("p_vec")
    ).collect()  # probe side only — never the corpus
    lut_rows = []
    probed = set()
    for r in probe_rows:
        q = np.asarray(r["p_vec"], dtype=np.float64)
        d = ((q[None, :] - centroids) ** 2).sum(axis=1)
        if score_round is not None:
            d = np.round(d, score_round)
        order = np.lexsort((np.arange(len(centroids)), d))[:nprobe]
        for b in order:
            probed.add(int(b))
            lut = sim.pq_lut(q - centroids[b], codebooks, score_round)
            lut_rows.append(
                (r["probe_id"], int(b),
                 [[int(x) for x in row] for row in lut])
            )
    p = spark.createDataFrame(
        lut_rows, "probe_id long, bucket int, lut array<array<bigint>>"
    )
    coded = spark.read.parquet(os.path.join(out_dir, "codes")).filter(
        F.col("bucket").isin(sorted(probed))  # -> parquet partition pruning
    )
    scored = (
        coded.join(F.broadcast(p), "bucket")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn(
            "adist_u",
            F.aggregate(
                F.zip_with(
                    "codes", "lut", lambda c, row: F.element_at(row, c + 1)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.asc("adist_u"), F.asc("vec_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if refine is None:
        return ranked.filter(F.col("rank") <= k).select(
            "probe_id", "vec_id", "rank", "adist_u"
        )
    if embeddings is None:
        raise ValueError("refine requires the source embeddings table")
    short = ranked.filter(F.col("rank") <= refine * k).select(
        "probe_id", "vec_id"
    )
    pv = spark.createDataFrame(
        [(r["probe_id"], [float(x) for x in r["p_vec"]])
         for r in probe_rows],
        "probe_id long, p_vec array<double>",
    )
    exact = (
        short.join(
            embeddings.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
            ),
            "vec_id",
        )
        .join(F.broadcast(pv), "probe_id")
        .withColumn("d", sim._sqdist(F.col("vec"), F.col("p_vec")))
    )
    d = (
        F.round("d", score_round) if score_round is not None else F.col("d")
    )
    exact = exact.withColumn("adist_u", F.round(d * 1e6, 0).cast("long"))
    w2 = Window.partitionBy("probe_id").orderBy(
        F.asc("adist_u"), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "rank", "adist_u")
    )
