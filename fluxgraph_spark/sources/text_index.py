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

Directory names and merged corpus stats resolve through the index's
``_delta_manifest.json`` when one exists (written by
:class:`DeltaInvertedIndex`'s atomic maintenance — the same
``_ManifestedIndex`` plumbing the ANN delta indexes publish through;
imported from ``ann_index``, not duplicated).

``df``/``dl`` are denormalized into the postings so a probe touches NO
other table: scan pruned partitions, join the broadcast query terms,
score, top-k.  The price is that the snapshot index's stored ``df``
stales the moment documents are appended — which is why the plain
:class:`InvertedIndex` deliberately has no ``append``.  The streaming
refresh path is :class:`DeltaInvertedIndex`: batches land in a
replay-safe delta area WITHOUT a df column, and the probe recomputes
``df`` for the query terms from the matched postings themselves
(base ∪ delta) — exact, not approximated, because a term's matched
posting count IS its corpus document frequency.

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
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import retrieval
from ..functions.text import (
    TOKEN_RE,
    stable_hash64,
    stable_hash64_py,
    token_count,
)
from . import ann_index as _ai
from . import fsutil


def _rank_topk(
    post: DataFrame,
    q: DataFrame,
    n_docs: int,
    sum_dl: int,
    k: int,
    k1: float,
    b: float,
    idf: str,
) -> DataFrame:
    """Score ``post`` rows ``(term, doc_id, tf, dl, df)`` against the
    (tiny, broadcast) query-term table ``q`` and rank per query — the
    shared tail of every probe path (same arithmetic as
    :func:`retrieval.bm25_topk`, so results are bit-identical given the
    same posting integers and corpus stats)."""
    scored = (
        post.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                retrieval.bm25_term_score(
                    F.col("tf"), F.col("df"), F.col("dl"),
                    n_docs, sum_dl, k1, b, idf,
                )
            ).alias("score_micro")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micro", "rank")
    )


class InvertedIndex(_ai._ManifestedIndex):
    def __init__(self, spark: SparkSession, index_dir: str):
        super().__init__(spark, index_dir.rstrip("/"))
        meta = json.loads(fsutil.read_text(spark, self.index_dir + "/meta.json"))
        self._meta_n_docs = int(meta["n_docs"])
        self._meta_sum_dl = int(meta["sum_dl"])
        self.n_buckets = int(meta["n_buckets"])
        md = meta.get("max_df")
        self._meta_max_df = None if md is None else int(md)

    @property
    def postings_dir(self) -> str:
        return self._base_dir("postings", "postings")

    def _base_stats(self) -> tuple[int, int]:
        """(n_docs, sum_dl) of the CURRENT base generation — merged
        folds update them in the manifest (meta.json stays the seed
        build's record)."""
        b = (self._manifest() or {}).get("base") or {}
        return (
            int(b.get("n_docs", self._meta_n_docs)),
            int(b.get("sum_dl", self._meta_sum_dl)),
        )

    @property
    def n_docs(self) -> int:
        return self._base_stats()[0]

    @property
    def sum_dl(self) -> int:
        return self._base_stats()[1]

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
        # a fresh build owns the layout: default dir names apply again
        _ai._reset_index_manifest(spark, index_dir)
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
                {
                    "n_docs": n_docs,
                    "sum_dl": sum_dl,
                    "n_buckets": n_buckets,
                    "max_df": max_df,
                }
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

    def _buckets_of(self, term_list: list) -> list[int]:
        """Bucket ids for an already-collected term list — the same
        pmod(stable_hash64, n_buckets) the build used, replayed on the
        driver (stable_hash64_py is bit-identical to the column form),
        so a probe pays ONE term collect instead of a second Spark job
        per query."""
        return sorted(
            {
                stable_hash64_py(t) % self.n_buckets
                for t in term_list
                if t is not None
            }
        )

    def _pruned_postings(self, buckets: list[int], term_list: list[str]) -> DataFrame:
        return (
            self.spark.read.parquet(self.postings_dir)
            .where(F.col("pbucket").isin(buckets))
            .where(F.col("term").isin(term_list))
        )

    def _matched(self, buckets: list[int], term_list: list[str]) -> DataFrame:
        """Pruned postings rows ``(term, doc_id, tf, dl)`` for the query
        terms — the delta subclass widens this to base ∪ committed
        delta, so every probe path sees one consistent corpus."""
        return self._pruned_postings(buckets, term_list).select(
            "term", "doc_id", "tf", "dl"
        )

    def phrase_hits(
        self,
        docs: DataFrame,
        phrases: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Postings-pruned exact phrase matching — the scale path for a
        large phrase book where :func:`retrieval.phrase_hits`'s
        scan-every-phrase-against-every-doc shape gets expensive:

        1. PRUNE: candidates = docs whose postings contain ALL of a
           phrase's distinct terms (a doc containing the token SEQUENCE
           necessarily contains every term, so the AND-of-terms set is
           a superset of the true hits).  Reads only the phrase terms'
           ``pbucket`` partitions.
        2. VERIFY: the candidate docs' text re-runs the same literal
           instr/replace match as :func:`retrieval.phrase_hits`.

        The verify makes the decision IDENTICAL to the ad-hoc scan over
        the same corpus — one SQL oracle serves both.  ``docs`` must be
        the indexed corpus (it supplies the text the index does not
        store).  Raises on ``max_df``-pruned indexes: a phrase
        containing a pruned stopword would lose its postings evidence
        and candidacy would silently miss true hits."""
        if self._meta_max_df is not None:
            raise ValueError(
                "phrase_hits needs an index built without max_df — "
                f"this one pruned terms with df > {self._meta_max_df}, "
                "so AND-of-terms candidacy would miss phrases containing "
                "a pruned stopword; rebuild without max_df"
            )
        pt = phrases.select(
            "phrase_id",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.lower(F.col("phrase")), F.lit(TOKEN_RE), F.lit(0)
                    )
                )
            ).alias("term"),
        )
        n_terms = pt.groupBy("phrase_id").agg(F.count(F.lit(1)).alias("__n"))
        terms = pt.select("term").distinct()
        term_list = [r["term"] for r in terms.collect()]
        buckets = self._buckets_of(term_list)
        post = self._matched(buckets, term_list).select("term", "doc_id")
        cand = (
            post.join(F.broadcast(pt), "term")
            .groupBy("phrase_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("__m"))
            .join(F.broadcast(n_terms), "phrase_id")
            .where(F.col("__m") == F.col("__n"))
            .select("doc_id")
            .distinct()
        )
        cand_docs = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).join(cand, "doc_id")
        # completeness holds because candidacy is implied by containment:
        # any doc containing phrase P holds all of P's terms, so it is
        # in cand for P and therefore in cand_docs
        return retrieval.phrase_hits(cand_docs, phrases, "doc_id", "text")

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
        term_list = [r["term"] for r in terms.collect()]
        buckets = self._buckets_of(term_list)
        post = self._pruned_postings(buckets, term_list)
        n_docs, sum_dl = self._base_stats()
        return _rank_topk(post, q, n_docs, sum_dl, k, k1, b, idf)


class DeltaInvertedIndex(InvertedIndex):
    """:class:`InvertedIndex` plus a REPLAY-SAFE delta area for
    streaming document appends — the text-retrieval twin of
    :class:`~.ann_index.DeltaIvfIndex`'s base+delta layout:

    * ``postings/`` — the snapshot build (unchanged; manifest-resolved
      after folds).
    * ``delta_postings/batch_id=N/pbucket=B/`` — one subtree per
      streamed microbatch, rows ``(term, doc_id, tf, dl)`` with NO df
      column (any stored df would stale as the corpus grows), written
      with OVERWRITE of the batch's own subtree so an at-least-once
      foreachBatch replay rewrites instead of double-appending.
    * ``delta_stats/batch_id=N/`` — ONE row ``(n_docs, sum_dl)`` per
      batch, written AFTER the batch's postings: the stats row is the
      batch's COMMIT MARKER.  Probes and merges consider only batches
      with a stats row, so a crash mid-postings-write leaves the
      half-written batch invisible until the replay rewrites it —
      readers see exactly the committed batches (n_docs must count the
      batch's EMPTY documents too, so it cannot be derived from the
      postings rows themselves).

    Probes recompute ``df`` for the query terms from the matched
    base ∪ delta postings (a term's matched posting count IS its
    document frequency — exact, not an approximation) and use corpus
    stats = base stats + committed batch stats, so every probe is
    BIT-IDENTICAL to :func:`retrieval.bm25_topk` over the full
    base+streamed corpus — one SQL oracle serves both.

    Contract: ``doc_id`` values must be unique across the base build
    and all streamed batches (re-ingesting a document would double its
    postings; dedup upstream — the same contract as DeltaIvfIndex's
    vec_ids).  ``merge_delta`` folds committed batches into a new base
    generation through the atomic manifest publish."""

    def __init__(self, spark: SparkSession, index_dir: str) -> None:
        super().__init__(spark, index_dir)
        self.delta_dir = os.path.join(self.index_dir, "delta_postings")
        self.stats_dir = os.path.join(self.index_dir, "delta_stats")

    # -- ingest ---------------------------------------------------------

    def append_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Tokenize ``batch`` and land it under its own
        ``delta_postings/batch_id=<batch_id>`` subtree (overwrite —
        replaying the same batch id is idempotent), then commit it by
        overwriting the batch's ``delta_stats`` row.

        Rejected on a ``max_df``-pruned base: the base dropped its
        stopword postings but a batch would keep its own, so probes
        would score pruned terms from delta-only (wrong) df — the same
        completeness break phrase_hits guards against."""
        if self._meta_max_df is not None:
            raise ValueError(
                "append_batch needs a base built without max_df — this "
                f"one pruned terms with df > {self._meta_max_df}, so "
                "delta postings would disagree with the pruned base; "
                "rebuild without max_df"
            )
        bid = int(batch_id)
        tf = (
            retrieval.tokens(batch, id_col, text_col)
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dl = batch.select(
            F.col(id_col).alias("doc_id"),
            token_count(F.lower(F.col(text_col))).cast("long").alias("dl"),
        )
        (
            tf.join(dl, "doc_id")
            .select("term", "doc_id", "tf", "dl")
            .withColumn(
                "pbucket",
                F.pmod(stable_hash64(F.col("term")), F.lit(self.n_buckets)),
            )
            .repartition("pbucket")
            .sortWithinPartitions("pbucket", "term")
            .write.partitionBy("pbucket")
            .mode("overwrite")
            .parquet(os.path.join(self.delta_dir, f"batch_id={bid}"))
        )
        # commit marker LAST: stats count every doc (empty ones too)
        (
            batch.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(
                    F.sum(token_count(F.lower(F.col(text_col))).cast("long")),
                    F.lit(0),
                ).alias("sum_dl"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(self.stats_dir, f"batch_id={bid}"))
        )

    # -- read side ------------------------------------------------------

    def _committed(self) -> tuple[list[int], int, int]:
        """(committed unfolded batch ids, their n_docs sum, sum_dl sum)
        — a bounded driver probe over one tiny row per batch."""
        if not fsutil.has_subdirs(self.spark, self.stats_dir):
            return [], 0, 0
        st = self.spark.read.option("basePath", self.stats_dir).parquet(
            self.stats_dir
        )
        folded = {int(x) for x in self._folded()}
        rows = st.collect()
        ids, nd, sd = [], 0, 0
        for r in rows:
            b = int(r["batch_id"])
            if b in folded:
                continue
            ids.append(b)
            nd += int(r["n_docs"])
            sd += int(r["sum_dl"])
        return sorted(ids), nd, sd

    def _delta_postings(
        self, batch_ids: list[int], buckets=None, term_list=None
    ) -> Optional[DataFrame]:
        if not batch_ids or not fsutil.has_subdirs(self.spark, self.delta_dir):
            return None
        # a committed batch of only EMPTY documents has a stats row but
        # no pbucket subdirs (nothing to post) — keep only batch dirs
        # with data, or schema inference fails when all are empty
        present = [
            b
            for b in batch_ids
            if fsutil.has_subdirs(
                self.spark, os.path.join(self.delta_dir, f"batch_id={b}")
            )
        ]
        if not present:
            return None
        d = (
            self.spark.read.option("basePath", self.delta_dir)
            .parquet(self.delta_dir)
            .where(F.col("batch_id").isin(present))
        )
        if buckets is not None:
            d = d.where(F.col("pbucket").isin(buckets))
        if term_list is not None:
            d = d.where(F.col("term").isin(term_list))
        return d

    def _matched(
        self,
        buckets: list[int],
        term_list: list[str],
        batch_ids: Optional[list[int]] = None,
    ) -> DataFrame:
        """``batch_ids`` lets a caller that already probed the commit
        markers reuse them — one consistent snapshot per query instead
        of a second driver probe (and a racing sink committing between
        the two reads)."""
        base = super()._matched(buckets, term_list)
        if batch_ids is None:
            batch_ids = self._committed()[0]
        delta = self._delta_postings(batch_ids, buckets, term_list)
        if delta is None:
            return base
        return base.unionByName(delta.select("term", "doc_id", "tf", "dl"))

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        idf: str = "rational",
    ) -> DataFrame:
        """Bit-identical to :func:`retrieval.bm25_topk` over the
        base ∪ committed-delta corpus: both scans prune to the query
        terms' buckets, ``df`` is recomputed from the matched postings,
        and the corpus stats include every committed batch (one
        commit-marker probe per query — stats and postings come from
        the same committed snapshot)."""
        q = queries.select("query_id", "term").distinct()
        terms = q.select("term").distinct()
        term_list = [r["term"] for r in terms.collect()]
        buckets = self._buckets_of(term_list)
        batch_ids, d_docs, d_dl = self._committed()
        matched = self._matched(buckets, term_list, batch_ids=batch_ids)
        dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        post = matched.join(dfs, "term")
        n_docs, sum_dl = self._base_stats()
        return _rank_topk(
            post, q, n_docs + d_docs, sum_dl + d_dl, k, k1, b, idf
        )

    # -- maintenance ----------------------------------------------------

    def _sweep_folded(self) -> None:
        folded = self._folded()
        _ai._sweep_folded_subtrees(self.spark, self.delta_dir, folded)
        _ai._sweep_folded_subtrees(self.spark, self.stats_dir, folded)

    def merge_delta(self) -> None:
        """Fold the committed delta batches into a NEW base generation
        and publish ATOMICALLY — the same write-audit-publish commit the
        ANN delta indexes use (``_ManifestedIndex``):

        1. WRITE: stage base ∪ delta postings with ``df`` recomputed
           over the merged corpus under ``postings__m<v>``.
        2. AUDIT: staged row count must equal base + delta exactly.
        3. PUBLISH: one atomic manifest replace repoints readers at the
           new postings dir, records the merged ``(n_docs, sum_dl)``,
           and marks the folded batch ids excluded from delta reads.
        4. GC: drop the old base dir and the folded batch subtrees
           (postings AND stats).

        A crash before 3 leaves every reader on base+delta; after 3,
        on the folded base — exactly-once rows either way.  OFFLINE
        maintenance: stop the stream first (a batch committing between
        the probe and the publish would be marked folded without its
        rows).  Uncommitted (crashed, stats-less) batch subtrees are
        left for their replay."""
        batch_ids, d_docs, d_dl = self._committed()
        if not batch_ids:
            self._sweep_folded()
            return
        delta = self._delta_postings(batch_ids)
        m = self._manifest() or {"version": 0, "base": {}, "folded_batches": []}
        v = int(m["version"]) + 1
        old_postings = self.postings_dir
        base = self.spark.read.parquet(old_postings).select(
            "term", "doc_id", "tf", "dl", "pbucket"
        )
        n_base = base.count()
        n_delta = delta.count() if delta is not None else 0
        merged = base
        if delta is not None:
            merged = merged.unionByName(
                delta.select("term", "doc_id", "tf", "dl", "pbucket")
            )
        dfs = merged.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        new_name = f"postings__m{v}"
        staged = os.path.join(self.index_dir, new_name)
        fsutil.delete(self.spark, staged)  # crashed-attempt orphan
        (
            merged.join(dfs, "term")
            .select("term", "doc_id", "tf", "dl", "df", "pbucket")
            .repartition(F.col("pbucket"))
            .sortWithinPartitions("pbucket", "term")
            .write.partitionBy("pbucket")
            .mode("overwrite")
            .parquet(staged)
        )
        n_staged = self.spark.read.parquet(staged).count()
        if n_staged != n_base + n_delta:
            fsutil.delete(self.spark, staged)
            raise RuntimeError(
                f"merge audit failed for {self.index_dir}: staged "
                f"{n_staged} rows, expected {n_base} + {n_delta}"
            )
        base_n, base_dl = self._base_stats()
        self._publish(
            {
                "version": v,
                "base": {
                    **(m.get("base") or {}),
                    "postings": new_name,
                    "n_docs": base_n + d_docs,
                    "sum_dl": base_dl + d_dl,
                },
                "folded_batches": sorted(
                    set(int(x) for x in (m.get("folded_batches") or []))
                    | set(batch_ids)
                ),
            }
        )
        # post-publish GC: everything here is unreferenced by the new
        # manifest — a crash leaves only orphans for the next merge
        if old_postings != os.path.join(self.index_dir, new_name):
            fsutil.delete(self.spark, old_postings)
        self._sweep_folded()

    def maybe_merge(self, ratio: float = 0.25) -> bool:
        """Fold the committed delta IFF its document count exceeds
        ``ratio`` × the base generation's — the size-ratio
        auto-compaction trigger (VERDICT r6 item 9; the LSM/lakehouse
        OPTIMIZE policy: rewrite cost amortizes logarithmically, and
        probes stop paying an ever-growing union of batch subtrees).
        Document counts come from the commit-marker stats rows — one
        tiny row per batch, no postings scan.  Safe inside a
        foreachBatch sink (batches are serial; the offline caveat on
        :meth:`merge_delta` targets concurrent writers).  Returns
        whether a fold ran; probes are bit-identical either way."""
        if ratio <= 0:
            raise ValueError(f"ratio must be > 0, got {ratio}")
        _ids, d_docs, _dl = self._committed()
        if d_docs == 0 or d_docs <= ratio * self.n_docs:
            return False
        self.merge_delta()
        return True
