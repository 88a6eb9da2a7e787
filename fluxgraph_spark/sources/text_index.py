"""Persisted BM25 inverted index with partition-pruned probes.

The text twin of ``ann_index.IvfIndex`` / ``bucketed.DedupIndex``: pay
the full postings shuffle ONCE at build time, then serve every query by
reading only the query terms' partitions.

Layout under ``index_dir``:

* ``postings/pbucket=B/`` — rows ``(term, doc_id, tf, dl, df)``
  partitioned by ``pbucket = pmod(stable_hash64(term), n_buckets)`` and
  sorted by ``term`` within files, so a probe prunes twice: directory
  pruning on ``pbucket IN (...)`` and parquet row-group pruning on
  ``term IN (...)`` (footer min/max over the sorted term column).
* ``meta.json`` — exact integer corpus stats ``(n_docs, sum_dl)`` and
  ``n_buckets``.

``df``/``dl`` are denormalized into the postings so a probe touches NO
other table: scan pruned partitions, join the broadcast query terms,
score, top-k.  The price is that the index is a SNAPSHOT — appending
documents would stale every existing posting's ``df`` (and the corpus
stats), so there is deliberately no ``append``; rebuild (or the delta
pattern of ``DeltaIvfIndex``, which would require df-at-probe-time
recombination) is the refresh path.

Scale sizing: at 10^9 documents the postings table is the corpus token
count (~10^12 rows); ``n_buckets`` should be O(10^4) so a bucket is a
few GB and a 5-term query reads ≤ 5 buckets.  Buckets are hash-balanced
across terms; a pathologically hot TERM (stopword df ~ n_docs) is a
data property — cap it at build time with ``max_df`` (stopword pruning,
the standard IR mitigation, which also shrinks the index by the Zipf
head).
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import retrieval
from ..functions.text import stable_hash64
from . import fsutil


class InvertedIndex:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        meta = json.loads(fsutil.read_text(spark, self.index_dir + "/meta.json"))
        self.n_docs = int(meta["n_docs"])
        self.sum_dl = int(meta["sum_dl"])
        self.n_buckets = int(meta["n_buckets"])

    @property
    def postings_dir(self) -> str:
        return self.index_dir + "/postings"

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        index_dir: str,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_df: Optional[int] = None,
    ) -> "InvertedIndex":
        """Tokenize ``docs`` and persist the bucketed postings.

        ``max_df``: drop terms appearing in more than this many
        documents (stopword pruning).  Corpus stats are computed over
        the FULL corpus regardless, so scores for surviving terms are
        identical to the unpruned index's.
        """
        spark = docs.sparkSession
        index_dir = index_dir.rstrip("/")
        post = retrieval.postings(docs, id_col, text_col)
        if max_df is not None:
            post = post.where(F.col("df") <= max_df)
        n_docs, sum_dl = retrieval.corpus_stats(docs, id_col, text_col)
        (
            post.withColumn(
                "pbucket", F.pmod(stable_hash64(F.col("term")), F.lit(n_buckets))
            )
            .repartition("pbucket")
            .sortWithinPartitions("pbucket", "term")
            .write.partitionBy("pbucket")
            .mode("overwrite")
            .parquet(index_dir + "/postings")
        )
        fsutil.write_text(
            spark,
            index_dir + "/meta.json",
            json.dumps(
                {"n_docs": n_docs, "sum_dl": sum_dl, "n_buckets": n_buckets}
            ),
        )
        return cls(spark, index_dir)

    def _probe_buckets(self, terms: DataFrame) -> list[int]:
        """Bucket ids for the query terms — bounded driver probe over
        the (tiny) distinct term set, computed with the SAME hash
        expression the build used."""
        rows = (
            terms.select(
                F.pmod(stable_hash64(F.col("term")), F.lit(self.n_buckets)).alias("b")
            )
            .distinct()
            .collect()
        )
        return sorted(int(r["b"]) for r in rows)

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        idf: str = "rational",
    ) -> DataFrame:
        """Top-``k`` docs per query — same contract and bit-identical
        scores as :func:`retrieval.bm25_topk` on the indexed corpus
        (same arithmetic over the same (tf, df, dl) integers)."""
        q = queries.select("query_id", "term").distinct()
        terms = q.select("term").distinct()
        buckets = self._probe_buckets(terms)
        term_list = [r["term"] for r in terms.collect()]
        post = (
            self.spark.read.parquet(self.postings_dir)
            .where(F.col("pbucket").isin(buckets))
            .where(F.col("term").isin(term_list))
        )
        scored = (
            post.join(F.broadcast(q), "term")
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum(
                    retrieval.bm25_term_score(
                        F.col("tf"),
                        F.col("df"),
                        F.col("dl"),
                        self.n_docs,
                        self.sum_dl,
                        k1,
                        b,
                        idf,
                    )
                ).alias("score_micro")
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("score_micro").desc(), F.col("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score_micro", "rank")
        )
