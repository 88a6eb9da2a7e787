"""BM25 retrieval vs a scalar reference, and the persisted inverted
index (build-once, partition-pruned probes, bit-identical scores).
"""

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.functions import retrieval
from fluxgraph_spark.sources.text_index import InvertedIndex

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lazy summer days and lazy summer nights"),
    (4, "a dog and a fox walk into a bar"),
    (5, "completely unrelated text about spark joins"),
    (6, "fox fox fox fox"),
]

QUERIES = [(1, "fox"), (1, "lazy"), (2, "spark"), (2, "joins"), (3, "the")]


def _ref_scores(docs, queries, k1=1.2, b=0.75, idf="rational"):
    """Scalar BM25 with the same micro-quantization."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    by_q = {}
    for qid, term in queries:
        by_q.setdefault(qid, set()).add(term)
    out = {}
    for qid, terms in by_q.items():
        for d, t in toks.items():
            total = 0
            matched = False
            for term in terms:
                tf = t.count(term)
                if tf == 0:
                    continue
                matched = True
                rat = ((n - df[term]) + 0.5) / (df[term] + 0.5)
                w = math.log1p(rat) if idf == "lucene" else rat
                num = tf * (k1 + 1.0)
                den = tf + k1 * ((1.0 - b) + b * (len(t) / avgdl))
                total += math.floor((w * num) / den * 1e6 + 0.5)
            if matched:
                out[(qid, d)] = total
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "term"])


def test_bm25_matches_scalar_reference(spark, docs_df, queries_df):
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_topk(docs_df, queries_df, k=10).collect()
    }
    assert got == _ref_scores(DOCS, QUERIES)


def test_bm25_lucene_idf_ranking(spark, docs_df, queries_df):
    """The ln-based default: scores within 1 micro of the scalar
    reference (libm may differ in the last ulp) and ranking identical."""
    ref = _ref_scores(DOCS, QUERIES, idf="lucene")
    rows = retrieval.bm25_topk(docs_df, queries_df, k=10, idf="lucene").collect()
    got = {(r["query_id"], r["doc_id"]): r["score_micro"] for r in rows}
    assert set(got) == set(ref)
    for key, v in got.items():
        assert abs(v - ref[key]) <= 1
    for qid in {q for q, _ in QUERIES}:
        ranked = sorted(
            [r for r in rows if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        ref_ranked = sorted(
            [(d, s) for (q, d), s in ref.items() if q == qid],
            key=lambda x: (-x[1], x[0]),
        )
        assert [r["doc_id"] for r in ranked] == [d for d, _ in ref_ranked]


def test_bm25_top_k_and_ties(spark, docs_df):
    # 'the' appears twice in doc 1, once in doc 2 with shorter dl; the
    # k cut and the (score desc, doc_id) tiebreak must be deterministic
    q = spark.createDataFrame([(9, "and")], ["query_id", "term"])
    rows = retrieval.bm25_topk(docs_df, q, k=1).collect()
    assert len(rows) == 1
    ref = _ref_scores(DOCS, [(9, "and")])
    best = min(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0][1]))[:1])
    assert (rows[0]["query_id"], rows[0]["doc_id"]) == best[0]


def test_bm25_absent_term_and_no_match(spark, docs_df):
    q = spark.createDataFrame([(1, "zzzzz")], ["query_id", "term"])
    assert retrieval.bm25_topk(docs_df, q).count() == 0


def test_bm25_null_query_term_dropped(spark, docs_df):
    """A null term can never match a token; the pre-r12 broadcast join
    dropped it silently and the literal path must too (ADVICE r12 —
    sorted() over {None, str} raised TypeError)."""
    q_null = spark.createDataFrame(
        [(1, "fox"), (1, None)], "query_id INT, term STRING"
    )
    q = spark.createDataFrame([(1, "fox")], ["query_id", "term"])
    a = retrieval.bm25_topk(docs_df, q_null).collect()
    b = retrieval.bm25_topk(docs_df, q).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # all-null query: no terms, no results, no crash
    q_all_null = spark.createDataFrame([(1, None)], "query_id INT, term STRING")
    assert retrieval.bm25_topk(docs_df, q_all_null).count() == 0


def test_bm25_large_vocab_fallback_matches_literal(spark, docs_df, queries_df, monkeypatch):
    """Above BM25_LITERAL_TERMS_MAX the broadcast-join fallback (ADVICE
    r12) must score identically to the literal-array path."""
    monkeypatch.setattr(retrieval, "BM25_LITERAL_TERMS_MAX", 0)
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_topk(docs_df, queries_df, k=10).collect()
    }
    assert got == _ref_scores(DOCS, QUERIES)


def test_bm25_duplicate_query_terms_count_once(spark, docs_df):
    q1 = spark.createDataFrame([(1, "fox")], ["query_id", "term"])
    q2 = spark.createDataFrame([(1, "fox"), (1, "fox")], ["query_id", "term"])
    a = retrieval.bm25_topk(docs_df, q1).collect()
    b = retrieval.bm25_topk(docs_df, q2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.fixture(scope="module")
def index(spark, docs_df):
    d = tempfile.mkdtemp(prefix="inv_idx_")
    idx = InvertedIndex.build(docs_df, d, n_buckets=8)
    yield idx
    shutil.rmtree(d, ignore_errors=True)


def test_index_matches_adhoc(spark, docs_df, queries_df, index):
    adhoc = retrieval.bm25_topk(docs_df, queries_df, k=10).collect()
    indexed = index.topk(queries_df, k=10).collect()
    assert sorted(map(tuple, adhoc)) == sorted(map(tuple, indexed))


def test_index_probe_prunes_partitions(spark, index):
    """The probe plan must read ONLY the query terms' pbucket dirs —
    asserted from the files the executed scan actually touched."""
    q = spark.createDataFrame([(1, "fox")], ["query_id", "term"])
    buckets = index._probe_buckets(q.select("term"))
    post = (
        spark.read.parquet(index.postings_dir)
        .where(F.col("pbucket").isin(buckets))
        .where(F.col("term").isin(["fox"]))
    )
    touched = {
        r["f"]
        for r in post.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched, "probe read no files"
    for f in touched:
        assert any(f"pbucket={b}/" in f for b in buckets)
    n_total = len(
        {
            r["f"]
            for r in spark.read.parquet(index.postings_dir)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
    )
    assert len(touched) < n_total


def test_index_max_df_prunes_stopwords(spark, docs_df):
    d = tempfile.mkdtemp(prefix="inv_idx_maxdf_")
    try:
        idx = InvertedIndex.build(docs_df, d, n_buckets=4, max_df=2)
        post = spark.read.parquet(idx.postings_dir)
        assert post.where(F.col("df") > 2).count() == 0
        # surviving terms score exactly as in the unpruned corpus
        q = spark.createDataFrame([(1, "spark")], ["query_id", "term"])
        got = {
            (r["query_id"], r["doc_id"]): r["score_micro"]
            for r in idx.topk(q).collect()
        }
        assert got == _ref_scores(DOCS, [(1, "spark")])
    finally:
        shutil.rmtree(d, ignore_errors=True)


PHRASES = [
    (1, "quick brown fox"),
    (2, "lazy summer"),
    (3, "Fox FOX"),            # case-normalized; adjacent repeats
    (4, "walk into a bar"),
    (5, "no such phrase here"),
    (6, "fox"),                # single-token phrase
    (7, "a.b (c"),             # regex metacharacters stay literal
    (8, "   "),                # blank: matches nothing
]

PHRASE_DOCS = DOCS + [(7, "tokens with a.b (c inside")]


def _ref_phrase_hits(docs, phrases):
    """Scalar reference: normalized token streams, greedy
    non-overlapping count via str.replace arithmetic (the engine
    contract)."""
    out = {}
    for pid, phrase in phrases:
        pat = " " + " ".join(phrase.lower().split()) + " "
        if pat == "  ":
            continue
        for d, t in docs:
            s = " " + " ".join(t.lower().split()) + " "
            if pat in s:
                out[(pid, d)] = (len(s) - len(s.replace(pat, ""))) // len(pat)
    return out


def test_phrase_hits_matches_scalar_reference(spark):
    docs = spark.createDataFrame(PHRASE_DOCS, ["doc_id", "text"])
    ph = spark.createDataFrame(PHRASES, ["phrase_id", "phrase"])
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_hits"]
        for r in retrieval.phrase_hits(docs, ph).collect()
    }
    ref = _ref_phrase_hits(PHRASE_DOCS, PHRASES)
    assert got == ref
    # the facts the fixture is built to pin (counts follow the single
    # left-to-right non-overlapping replace pass: padded occurrences
    # share boundary spaces, so ' fox ' in ' fox fox fox fox ' = 2 and
    # ' fox fox ' = 1 — identical in Python, Spark, and DuckDB)
    assert (1, 1) in got and (1, 2) in got
    assert got[(2, 3)] == 2                       # 'lazy summer' twice in doc 3
    assert got[(3, 6)] == 1
    assert got[(6, 6)] == 2
    assert (7, 7) in got                          # metacharacters literal
    assert not any(pid == 5 for pid, _ in got)
    assert not any(pid == 8 for pid, _ in got)
    assert (4, 4) in got


def test_phrase_hits_indexed_matches_adhoc(spark, docs_df):
    ph = spark.createDataFrame(PHRASES, ["phrase_id", "phrase"])
    d = tempfile.mkdtemp(prefix="inv_idx_phrase_")
    try:
        idx = InvertedIndex.build(docs_df, d, n_buckets=8)
        adhoc = retrieval.phrase_hits(docs_df, ph).collect()
        indexed = idx.phrase_hits(docs_df, ph).collect()
        assert sorted(map(tuple, adhoc)) == sorted(map(tuple, indexed))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_phrase_hits_on_delta_index_covers_streamed_docs(spark, docs_df):
    from pyspark.sql import functions as SF

    from fluxgraph_spark.sources.text_index import DeltaInvertedIndex

    ph = spark.createDataFrame(PHRASES, ["phrase_id", "phrase"])
    d = tempfile.mkdtemp(prefix="inv_idx_phrase_delta_")
    try:
        base = docs_df.where(SF.col("doc_id") % 2 == 0)
        DeltaInvertedIndex.build(base, d, n_buckets=8)
        idx = DeltaInvertedIndex(spark, d)
        idx.append_batch(docs_df.where(SF.col("doc_id") % 2 == 1), 0)
        adhoc = retrieval.phrase_hits(docs_df, ph).collect()
        indexed = idx.phrase_hits(docs_df, ph).collect()
        assert sorted(map(tuple, adhoc)) == sorted(map(tuple, indexed))
        # doc 1 ('quick brown fox...') arrived via the DELTA: candidacy
        # must have come from the streamed postings
        assert any(r["doc_id"] == 1 for r in indexed)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_phrase_hits_rejects_max_df_index(spark, docs_df):
    ph = spark.createDataFrame([(1, "quick brown")], ["phrase_id", "phrase"])
    d = tempfile.mkdtemp(prefix="inv_idx_phrase_maxdf_")
    try:
        idx = InvertedIndex.build(docs_df, d, n_buckets=4, max_df=2)
        with pytest.raises(ValueError, match="max_df"):
            idx.phrase_hits(docs_df, ph)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_corpus_stats_counts_empty_docs(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
    assert retrieval.corpus_stats(df) == (2, 2)


def test_bm25_empty_corpus_raises(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    q = spark.createDataFrame([(1, "a")], ["query_id", "term"])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(df, q)


def test_bad_idf_kind_raises(spark, docs_df):
    q = spark.createDataFrame([(1, "fox")], ["query_id", "term"])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs_df, q, idf="bm25plus")
