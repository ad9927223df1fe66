"""Low-latency query serving over a built index.

The reference serves queries through a long-lived IndriRunQuery process
(configs/*/indriRunQuery.cfg with <threads>30</threads>); the Spark
analogue is a long-lived session holding the cached postings. Measured
on local[32] at sf0.1, single-query latency is SCHEDULING-bound, not
compute-bound: the per-(qid,doc) aggregation exchange runs
`spark.sql.shuffle.partitions` tasks over a few thousand matched rows,
and 32 near-empty tasks cost ~2× the whole query (p50 0.85s → 0.49s at
4 partitions, same plan, same results).

``QueryService`` wraps an IndexTables with a serving-tuned partition
count: the same rank-identical `score_topk` / `rm3_topk` plans, with
the per-query exchanges sized for point queries instead of corpus-wide
analytics. On a real cluster this mirrors having a query-serving pool
with its own shuffle sizing — batch analytics keep the big setting; AQE
still coalesces either way. The conf flip is session-wide for the
duration of each call (documented; serve queries from one thread)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..index.build import IndexTables
from .bm25 import score_topk

SERVING_SHUFFLE_PARTITIONS = 4


class QueryService:
    def __init__(
        self,
        spark: SparkSession,
        index: IndexTables,
        shuffle_partitions: int = SERVING_SHUFFLE_PARTITIONS,
        warm: bool = True,
    ):
        self.spark = spark
        self.index = index
        self.shuffle_partitions = shuffle_partitions
        # materialize the cached tables once so first-query latency is
        # not a build
        index.postings_flat.count()
        index.vocab.count()
        if warm:
            # one throwaway query warms codegen + broadcast machinery
            qt = spark.createDataFrame(
                [("_warm", "___nosuchterm", 1.0)],
                "qid string, term string, weight double",
            )
            with self._serving_conf():
                score_topk(index, qt, k=1).count()

    @contextmanager
    def _serving_conf(self):
        key = "spark.sql.shuffle.partitions"
        old = self.spark.conf.get(key)
        self.spark.conf.set(key, str(self.shuffle_partitions))
        try:
            yield
        finally:
            self.spark.conf.set(key, old)

    def topk(self, query_terms: DataFrame, k: int = 10, **kw) -> DataFrame:
        """Same contract as score_topk — rank-identical results, serving
        partition count. Collect/convert INSIDE the call if latency
        matters (the conf is restored on exit)."""
        with self._serving_conf():
            out = score_topk(self.index, query_terms, k=k, **kw)
            # force execution under the serving conf; result is tiny
            out = out.cache()
            out.count()
            return out

    def rm3_topk(self, query_terms: DataFrame, k: int = 10, **kw) -> DataFrame:
        from ..expansion.rm3 import rm3_topk as _rm3

        with self._serving_conf():
            out = _rm3(self.index, query_terms, k=k, **kw).cache()
            out.count()
            return out

    def lm_topk(self, query_terms: DataFrame, k: int = 10,
                method: str = "dir", **kw) -> DataFrame:
        """Serve the reference's LM rules (scoring/lm.py): method 'dir'
        (Dirichlet) or 'two' (two-stage) with the same point-query
        exchange sizing as topk()."""
        from . import lm

        fn = {"dir": lm.dirichlet_topk, "two": lm.two_stage_topk}[method]
        with self._serving_conf():
            out = fn(self.index, query_terms, k=k, **kw)
            cached = out.cache()
            cached.count()
            # the result is materialized; release any per-query
            # intermediate caches the scorer registered (two-stage's
            # candidate table) so long-lived serving stays bounded
            for df in getattr(out, "_sqe_intermediates", []):
                df.unpersist()
            return cached
