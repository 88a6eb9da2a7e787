"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs.  Every operator has a matching
ANSI-SQL formulation (see __spark_entry__.py oracles) so results are
verifiable against DuckDB on the same parquet.

Determinism contract: any hashing uses md5 (stable across engines), via
:func:`stable_hash64`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
# BPE-ish word/piece splitter: words, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def let_(value: Column, body) -> Column:
    """Let-binding for expression trees: evaluate ``value`` ONCE per row
    and pass the result to ``body`` as a bound lambda variable —
    ``transform(array(value), x -> body(x))[0]``.

    Why this exists: Spark's subexpression elimination cannot hoist an
    expression OUT of a higher-order-function lambda, so writing e.g.
    ``transform(idx, i -> slice(regexp_extract_all(text, ...), i, n))``
    re-runs the tokenizer for EVERY gram — O(tokens x doc_len) per row
    (measured ~2.3 ms/row on 300-char docs).  Binding the tokenized
    array with ``let_`` makes inner lambda references an O(1) variable
    lookup, the same rows in, the same values out."""
    return F.transform(F.array(value), body)[0]


def stable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash identical in Spark and DuckDB:
    first 15 hex chars of md5, base-16 decoded.
    DuckDB equivalent: ``('0x' || substring(md5(x),1,15))::UBIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stable_hash64_py(s: str) -> int:
    """Driver-side twin of :func:`stable_hash64`: the identical 60-bit
    value for a Python string (UTF-8 md5, first 15 hex chars) — lets
    bounded driver tiers replay hash decisions without a Spark job."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count with the BPE-style regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), F.lit(0)))


# Tiny per-language stopword panels (public common words; enough for a
# coarse n-gram/stopword language heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
    "es": ["el", "los", "las", "es", "una", "con", "por", "para"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def language_id(text: Column) -> Column:
    """Stopword-panel language guess: argmax of per-language marker hits,
    'und' (undetermined) when no panel matches."""
    hits = [(lang, _marker_hits(text, words)) for lang, words in LANG_MARKERS.items()]
    best = F.greatest(*[h for _, h in hits])
    expr = F.lit("und")
    # reverse order so earlier languages win ties (en > de > fr > es)
    for lang, h in reversed(hits):
        expr = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token count, alpha ratio,
    punctuation ratio, stopword ratio, mean token length."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    n_stop = _marker_hits(t, LANG_MARKERS["en"])
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("q_alpha_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("q_punct_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("q_stopword_ratio"),
        (n_alpha / F.greatest(n_tokens, F.lit(1))).alias("q_mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar [0,1] quality score from the metrics: rewards alpha-heavy,
    stopword-bearing, mid-length documents; penalizes punctuation soup."""
    m = quality_metrics(df, text_col)
    length_term = F.least(F.col("q_tokens") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.35) * F.col("q_alpha_ratio")
        + F.lit(0.25) * F.least(F.col("q_stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.25) * length_term
        + F.lit(0.15) * (F.lit(1.0) - F.least(F.col("q_punct_ratio") * 5, F.lit(1.0)))
    )
    return m.withColumn("quality_score", F.round(score, 6))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint (key-collision style):
    md5 of the sorted distinct lowercase tokens."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0))
    )
    return F.md5(F.array_join(F.array_sort(toks), " "))


# PII patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
# backrefs, no lookaround
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """PII scrubbing (training-data hygiene): emails, phone numbers, and
    IPv4 addresses replaced with typed placeholder tokens.  Pure JVM
    regexp_replace chain — stays inside whole-stage codegen; order
    matters (emails first, so user@host never half-matches as a phone)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return out


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """Per-document PII hit counts (email, phone, ip) for audit metrics."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0))),
    )


def repetition_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Gopher-style repetition quality signal: fraction of duplicate
    word n-grams per document.  All array ops on the row — a narrow map,
    no shuffle; heavily repetitive (boilerplate / spam) docs score high.

    N-grams are xxhash64-folded token-hash windows, never materialized
    as strings (the dedup.shingle_arrays trick — ~4x faster; duplicate
    counts identical up to 64-bit hash collisions)."""
    grams = F.expr(
        f"""transform(
          sequence(1, greatest(size(__th) - {n - 1}, 1)),
          i -> aggregate(slice(__th, i, {n}), cast(0 as bigint),
                         (acc, h) -> xxhash64(acc, h)))"""
    )
    with_grams = df.select(
        id_col,
        F.expr(
            f"transform(filter(split(lower({text_col}), '\\\\s+'), t -> t != ''),"
            " t -> xxhash64(t))"
        ).alias("__th"),
    ).select(id_col, grams.alias("__g"))
    n_grams = F.size("__g")
    n_distinct = F.size(F.array_distinct(F.col("__g")))
    return with_grams.select(
        id_col,
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        F.round(
            (n_grams - n_distinct) / F.greatest(n_grams, F.lit(1)).cast("double"), 6
        ).alias("dup_gram_ratio"),
    )


def ngram_novelty(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Cross-corpus n-gram novelty: for every document, the fraction of
    its DISTINCT word n-grams that appear in no other document —
    boilerplate/templated docs score near 0, genuinely fresh text near
    1.  The corpus-wide complement of :func:`repetition_metrics`
    (which is within-doc) and the soft sibling of exact span dedup: a
    training-data curation signal for "is this document adding anything
    the corpus does not already have".

    Output: ``(doc_id, n_grams, novel_ratio)`` — docs with fewer than
    ``n`` tokens have no grams and drop out (mirror any SQL oracle with
    ``len(tokens) >= n``).

    Scale: grams are xxhash64-folded token-hash windows (the
    ``repetition_metrics`` / dedup.shingle trick) — the gram SHUFFLE
    carries 8-byte keys, never strings (doc-frequency counts are
    identical up to 64-bit collisions, the same accepted trade).  Plan:
    per-doc distinct grams (narrow map) → two map-side-combinable
    aggregations (per-gram df keeping only the df==1 rows with their
    single owning doc; per-doc totals) → one DOC-granularity join.  No
    gram-level join-back and no count window, so a boilerplate gram in
    billions of docs collapses to slim partials instead of funneling
    one partition."""
    def grams_of(th: Column) -> Column:
        # th is a let_-bound variable: O(1) per reference, so neither
        # the tokenizer nor the token-hash array re-runs per gram (the
        # shingle_table/rolling_hashes discipline — without the binding
        # this projection re-tokenized per gram and was ~400x slower)
        idx = F.sequence(F.lit(1), F.size(th) - (n - 1))
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.aggregate(
                    F.slice(th, i, n),
                    F.lit(0).cast("bigint"),
                    lambda acc, h: F.xxhash64(acc, h),
                ),
            )
        )

    token_hashes = F.transform(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)),
        lambda t: F.xxhash64(t),
    )
    with_grams = (
        df.select(
            id_col,
            let_(
                token_hashes,
                lambda th: F.when(F.size(th) >= n, grams_of(th)),
            ).alias("__g"),
        )
        .where(F.col("__g").isNotNull())
    )
    exploded = with_grams.select(id_col, F.explode("__g").alias("g"))
    # a gram with doc-frequency 1 has exactly ONE owning doc, so novelty
    # needs no gram->doc join-back: aggregate (df, max(doc)) per gram,
    # keep the df == 1 rows (per-doc-sized), and join at DOC granularity
    # with the per-doc totals.  Both aggregations partial-combine
    # map-side, so a boilerplate gram sitting in billions of documents
    # collapses to one slim partial per task — no count-window funnel,
    # no skewed join.  The tokenize+fold scan IS evaluated once per
    # branch (the two shuffles key differently, so no one-pass plan
    # exists without a corpus-sized persist); two narrow scans is the
    # 100 TB-safe constant, a skew funnel is not.
    novel = (
        exploded.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"), F.max(id_col).alias(id_col))
        .where(F.col("df") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    totals = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    per_doc = totals.join(novel, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("novel_ratio"),
    )


def split_assign(id_col: Column, val_pct: int = 5, test_pct: int = 5) -> Column:
    """Deterministic train/val/test split by stable hash of the id —
    reproducible across engines and runs, no RNG state.  Buckets 0-99:
    [0, val) = val, [val, val+test) = test, rest train."""
    bucket = stable_hash64(id_col.cast("string")) % 100
    return (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum downsampling (the language/source
    rebalancing step of a training-data mix): keep a row iff
    ``stable_hash(id || salt) % 100000 < rate(stratum) * 100000``.
    Strata absent from ``rates`` are dropped (rate 0).

    Unlike ``df.sampleBy`` this is reproducible across runs, engines,
    and partitionings (no RNG seed plumbing), and it is a pure narrow
    filter — pushed to the scan, no shuffle, trivially correct at any
    scale.  Change ``salt`` to draw an independent sample."""
    bucket = (
        stable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % 100000
    )
    thresh = F.lit(0)
    for stratum, rate in rates.items():
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(rate * 100000)))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def quality_weighted_sample(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    salt: str = "qw",
) -> DataFrame:
    """Quality-weighted sampling (the CCNet-style soft filter): keep
    each document with probability equal to its quality score, selected
    deterministically — ``stable_hash(id || salt) % 100000 <
    quality_score * 100000`` — so high-quality docs are (almost) always
    kept, junk is (almost) always dropped, and the middle is sampled in
    proportion.  Reproducible across runs/engines/partitionings; a pure
    narrow map + filter, no shuffle."""
    q = quality_score(df, text_col)
    bucket = (
        stable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % 100000
    )
    return q.where(bucket < F.col("quality_score") * 100000)


def rolling_hashes(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: stable hash of each
    ``window``-gram of tokens (array of hashes; pair with explode +
    min-sampling for shingle sketches)."""
    def grams_of(toks: Column) -> Column:
        # toks is a let_-bound variable: O(1) per reference, so the
        # per-gram slice never re-runs the tokenizer (see let_)
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, window), " ")
        )

    grams = let_(
        F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), F.lit(0)), grams_of
    )
    return F.transform(grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"))


def bigram_familiarity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram-LM familiarity scoring — the integer-exact analog of
    perplexity filtering (CCNet / Gopher-style: drop documents whose
    content the corpus-level language model finds surprising).  The
    "model" is the corpus bigram frequency table itself; a document's
    familiarity is the mean corpus frequency of its bigrams.

    Output: (id_col, n_bigrams, fam_micro, below_mean) where fam_micro
    = floor(sum(bigram_count) * 1e6 / n_bigrams) and below_mean flags
    docs under the corpus mean — the filter decision.  Documents with
    fewer than two tokens are excluded (no bigrams to score).

    Scale shape: one explode for bigrams, one map-side-combined count
    (the "LM"), one equi-join back (the count side is one row per
    distinct bigram; hot Zipf-head keys are AQE-skew territory, not a
    plan problem), one per-doc partial agg, and the mean is a scalar
    aggregate broadcast back — no global sort anywhere.  All integer
    arithmetic (``div``), so the score replays exactly in SQL.
    """
    toks = df.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0))
        ).alias("pos", "token"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    big = (
        toks.withColumn("nxt", F.lead("token").over(w))
        .where(F.col("nxt").isNotNull())
        .select(id_col, F.concat_ws(" ", "token", "nxt").alias("bigram"))
    )
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc"))
    scored = (
        big.join(counts, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bc").alias("fam_sum"),
        )
        .withColumn("fam_micro", F.expr("fam_sum * 1000000 div n_bigrams"))
    )
    mean = scored.agg(
        F.expr("sum(fam_micro) div count(1)").alias("mean_micro")
    )
    return scored.crossJoin(F.broadcast(mean)).select(
        id_col,
        "n_bigrams",
        "fam_micro",
        (F.col("fam_micro") < F.col("mean_micro")).alias("below_mean"),
    )


def token_budget_mix(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pretraining-mix construction: fill a per-language token budget
    with a deterministic random sample of documents (ordered by
    md5(doc_id)) — every language contributes until its budget is
    exhausted, mid-document cutoff included (the doc that crosses the
    budget line is kept).

    Output: (id_col, lang, n_tok, cum_tokens) for the selected docs.

    Scale shape — the budget fill needs a cumulative sum in a global
    per-language order, and a language has ~corpus-sized populations,
    so a naive ``Window.partitionBy(lang)`` would drag whole languages
    through single tasks.  Instead the md5 order is split at its own
    prefix: 256 ``substring(md5,1,2)`` buckets whose PER-BUCKET token
    sums (a tiny aggregate) give exclusive per-bucket offsets via a
    window over ≤ langs x 256 rows; the corpus-sized window then
    partitions by (lang, bucket) — 256-way parallel per language —
    and adds its bucket offset.  Because the bucket is a prefix of the
    ordering key, the composite (bucket, h, id) order equals the plain
    (h, id) order, so the result is identical to the naive window (how
    the SQL oracle states it).
    """
    from pyspark.sql import Window

    base = df.select(
        id_col,
        language_id(F.col(text_col)).alias("lang"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    sums = base.groupBy("lang", "bucket").agg(F.sum("n_tok").alias("btok"))
    wo = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sums.withColumn(
        "off", F.coalesce(F.sum("btok").over(wo), F.lit(0))
    ).select("lang", "bucket", "off")
    w2 = Window.partitionBy("lang", "bucket").orderBy("h", id_col)
    cum = base.join(F.broadcast(offs), ["lang", "bucket"]).withColumn(
        "cum_tokens", F.col("off") + F.sum("n_tok").over(w2)
    )
    return cum.where(
        F.col("cum_tokens") - F.col("n_tok") < F.lit(int(budget_tokens))
    ).select(id_col, "lang", "n_tok", "cum_tokens")


def pack_sequences_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """True greedy sequence packing: within each ``group_col`` shard,
    rows in ``order_col`` order fill fixed ``budget``-token packs; a row
    that does not fit CLOSES the pack and opens the next (fill resets —
    no pack exceeds the budget unless a single row alone does, in which
    case that row gets its own pack).  Contrast with the cumulative
    bucketing of ``q_x_pack`` (floor(cumsum/budget)), which can overflow
    a pack by one row and skip ids but is window-expressible.

    The greedy recurrence is inherently sequential WITHIN a shard
    (each decision depends on the running fill), so it runs as
    ``applyInPandas`` per group — shards pack in parallel, one shuffle
    on ``group_col``.  At 100 TB the shard (source/file) is the natural
    packing unit and packs never cross shards, so wall-clock scales
    with the widest shard.  The same recurrence replays in SQL as a
    recursive CTE (see the ``x_pack_greedy`` oracle).

    Output: input columns + ``pack_id`` (0-based per shard).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pack_id", T.LongType(), False)]
    )
    b = int(budget)
    oc, tc = order_col, tokens_col

    def _pack(pdf):
        pdf = pdf.sort_values(oc, kind="mergesort").reset_index(drop=True)
        fill = b + 1  # forces the first row to open pack 0
        pack = -1
        ids = []
        for n in pdf[tc]:
            n = int(n)
            if fill + n <= b:
                fill += n
            else:
                pack += 1
                fill = n
            ids.append(pack)
        pdf["pack_id"] = ids
        return pdf

    return df.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def ngram_overlap(
    df: "DataFrame",
    id_col: str,
    cand_col: str,
    ref_col: str,
    n: int = 1,
) -> "DataFrame":
    """Clipped n-gram overlap between a candidate and a reference text —
    the counting primitive under BLEU (Papineni et al. ACL'02) and
    ROUGE-N (Lin 2004), the standard reference-based eval for generated
    text: per row, ``n_match = Σ_g min(count_cand(g), count_ref(g))``
    over word n-grams (each reference occurrence credits at most one
    candidate occurrence), with ``precision = n_match / n_cand`` and
    ``recall = n_match / n_ref`` left to the caller as exact integer
    micro ratios.

    Returns ``(id, n_cand, n_ref, n_match)`` — all exact BIGINT counts
    (rows whose candidate or reference has fewer than ``n`` tokens
    count zero grams on that side).  Scale shape: two narrow gram
    explodes, per-(id, gram) counts with map-side combine, one
    equi-join on (id, gram) for the clipped sum — never a cross join,
    and every count is an integer so the result replays exactly in
    SQL."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    # Tokenize ONCE into cached columns, then build grams from the
    # cached arrays.  Putting the tokenizer inside the gram expression
    # re-evaluates it PER LAMBDA ELEMENT: Spark's subexpression
    # elimination does not reach inside higher-order-function lambdas,
    # so ``transform(idx, i -> slice(regexp_extract_all(...), i, n))``
    # re-runs the regex for every gram — O(tokens x doc_len) per row,
    # measured ~2.3 ms/row on 300-char docs (and at small SF AQE
    # coalesces the stage to one task, serializing all of it).
    base = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(
            F.lower(F.col(cand_col)), F.lit(TOKEN_RE), F.lit(0)
        ).alias("__ct"),
        F.regexp_extract_all(
            F.lower(F.col(ref_col)), F.lit(TOKEN_RE), F.lit(0)
        ).alias("__rt"),
    ).persist()

    def grams(col: str) -> Column:
        toks = F.col(col)  # a cached array — O(1) to reference
        if n == 1:
            return toks  # the tokens ARE the unigrams
        # sequence(1, 0) would generate a DESCENDING [1, 0] — clamp the
        # stop at 1 and blank out the too-short case explicitly instead
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
        )
        full = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        return F.when(F.size(toks) >= n, full).otherwise(
            F.array().cast("array<string>")
        )

    def n_grams(col: str) -> Column:
        # gram COUNT from the token count — no gram materialization
        return (
            F.when(F.size(F.col(col)) >= n, F.size(F.col(col)) - (n - 1))
            .otherwise(F.lit(0))
            .cast("long")
        )

    totals = base.select(
        "id",
        n_grams("__ct").alias("n_cand"),
        n_grams("__rt").alias("n_ref"),
    )
    cc = (
        base.select("id", F.explode(grams("__ct")).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    rc = (
        base.select("id", F.explode(grams("__rt")).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("__r"))
    )
    match = (
        cc.join(rc, ["id", "g"])
        .groupBy("id")
        .agg(F.sum(F.least("__c", "__r")).cast("long").alias("n_match"))
    )
    out = totals.join(match, "id", "left").select(
        "id",
        "n_cand",
        "n_ref",
        F.coalesce("n_match", F.lit(0)).cast("long").alias("n_match"),
    )
    # one small row (4 BIGINTs) per input row: materialize, cut lineage,
    # release the gram-array cache (dedup.corpus_dedupe's pattern) so
    # repeated eval calls don't accumulate cached corpus explodes
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-budget token-window chunking with overlap — the
    RAG / embedding-prep primitive that turns long documents into
    model-window-sized pieces (overlap = budget - stride keeps context
    across boundaries; stride = budget is disjoint tiling).

    Chunk c of a doc covers tokens [c*stride, c*stride + budget);
    n_chunks = 1 + ceil((n - budget) / stride) for n > budget else 1,
    so every token is covered and the last chunk may run short.  Docs
    with no tokens emit no chunks.  Output: (id, chunk_id,
    chunk_start, n_chunk_tokens, chunk_text).

    Scale shape: one narrow map — tokenize, per-row integer sequence,
    explode, slice — ZERO shuffles at any corpus size; chunk counts
    are pure integer arithmetic, so the expansion replays exactly in
    SQL (generate_series + list_slice).  The downstream embed step is
    where the FLOPs live; this stage should never be the bottleneck,
    and as a stateless per-row map it cannot be.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if stride < 1 or stride > budget:
        raise ValueError(
            f"stride must be in 1..budget ({budget}), got {stride} "
            f"(stride > budget would skip tokens between chunks)"
        )
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
    base = df.select(F.col(id_col), toks.alias("__toks")).where(
        F.size("__toks") > 0
    )
    n_chunks = (
        F.when(F.size("__toks") <= budget, F.lit(1).cast("long"))
        .otherwise(
            F.expr(
                f"(size(__toks) - {budget} + {stride - 1}) div {stride}"
            )
            + F.lit(1)
        )
        .cast("long")
    )
    exploded = base.select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    chunk = F.slice(F.col("__toks"), (start + 1).cast("int"), budget)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
