"""Physical-plan audit for the headline queries.

For every query in bench.py's HEADLINE (plus the iterative analytics and
the corpus pipeline), captures the formatted physical plan and greps it
for the scale-critical properties:

* ``PushedFilters`` — predicates reached the parquet scan;
* ``ReadSchema``    — column pruning (scan reads only referenced cols);
* ``BroadcastHashJoin`` / ``BroadcastExchange`` — bounded dims broadcast;
* ``WholeStageCodegen`` — expression work stays JVM-side;
* Python row-at-a-time evals (``BatchEvalPython``) — the slow path; only
  the multimodal mapInPandas stage is allowed to show Arrow evals.

Writes PLAN_AUDIT.md (a per-query summary + plan excerpts) and exits
non-zero if a query misses a property it is expected to have.

Usage: python scripts/explain_audit.py [sf_dir]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

# The audit covers the ENTIRE registry (VERDICT r6 item 4): the list is
# enumerated from __spark_entry__.queries() at runtime, so a new query
# is audited the round it lands — a query whose plan misses a property
# fails the audit until it is either fixed or classified in the
# expectation sets below (full-corpus maps have nothing to push down;
# driver-fixpoint queries return checkpoint scans; etc.).
AUDITED = list(entrymod.queries().keys())

# queries where no parquet filter is expected (full-corpus maps/aggs, or
# graph queries whose kind/label predicates constant-fold into union-branch
# pruning — the non-matching table scans vanish entirely, which beats a
# pushed filter)
NO_PUSHDOWN_EXPECTED = {
    "g_orders_per_customer",
    "g_motif_open_paths",   # pattern over ALL edges/kinds — nothing to push
    "g_out_degree_top20",   # degree over ALL edges
    "pricing_summary",      # predicate on derived date arithmetic
    "d_minhash_lsh_pairs",  # full-corpus shingling
    "d_simhash",
    "x_quality",
    "s_cosine_topk",
    "t_scd2_versions",      # full-events window build
    "t_sessionize",
    "t_asof_join",
    "pipeline_corpus",      # quality filter is a derived expression
    "pipeline_crawl",       # same stages over WARC-extracted text
    "r_order_priority",     # the only filter is the join-time shipdate arithmetic
    "r_big_orders",         # HAVING on an aggregate — nothing scan-level
    "r_rollup_revenue",     # full-table rollup
    "r_small_quantity_rev", # threshold is a derived per-part aggregate
    "t_time_buckets",       # full-events rollup
    "x_percentiles",        # full-events agg
    "x_rolling",            # full-events window
    "x_scrub", "x_repetition", "x_split",  # full-corpus narrow maps
    "x_bpe_encode",        # full-corpus word explode — nothing to push
    "x_lm_familiarity",    # full-corpus bigram explode
    "x_mix_budget",        # full-corpus token accounting
    "k_sketches",           # full-events sketch agg
    "g_copurchase_top",     # label predicate folds into union-branch pruning
    "t_versions_at",        # full-events interval expansion
    "t_asof_join_fwd",      # event_type equality DOES push, but keep symmetric with t_asof_join
    "x_range_frame",        # full-events window
    "x_json_extract",       # full-events JSON map
    "r_topk_per_group",     # full lineitem/part agg
    "r_pivot_status",       # full orders pivot
    "r_cube_stats",         # full lineitem cube
    "d_winnow_pairs",       # full-corpus sketching
    "d_edit_near_dups",     # full-corpus sketching + pair verify
    "d_incr_dedupe",        # batch-vs-index fingerprint joins, derived predicate
    "r_priority_lines",     # lateness predicate is join-time date arithmetic
    "r_custdist",           # priority filter lives in the LEFT JOIN condition
    "g_triangles",          # full-lineitem projection; threshold is a HAVING
    "x_window_suite",       # full-events agg
    "x_tfidf_top_terms",    # full-corpus explode
    "x_vocab",              # full-corpus explode
    "x_decontaminate",      # doc_id % 50 is a derived predicate, not scan-level
    "st_changefeed",        # memory-sink read-back; scans ran in the drain
    "x_decontaminate_bloom",  # same derived predicate; bloom prune is map-side
    "t_asof_tolerance",     # keep symmetric with t_asof_join
    "d_span_dup",           # full-corpus span fingerprinting
    "x_strat_sample",       # md5-bucket predicate is derived, not scan-level
    "s_label_centroids",    # full-table mean pooling
    "g_link_predict",       # full-lineitem projection; support threshold is a HAVING
    "d_prefix_dedupe",      # full-corpus prefix fingerprinting
    "x_corpus_stats",       # full-corpus rollup
    "t_retention",          # full-events cohort rollup
    "x_weighted_sample",    # score predicate is derived, not scan-level
    "d_semantic_dedupe",    # full-embeddings pair join + components
    "d_semantic_ivf_dedupe",  # same, IVF-blocked (label-free)
    "d_lsh_verified_pairs", # full-corpus shingling
    "d_lsh_budget",         # same, budgeted candidate stream
    "x_pack",               # full-corpus token count + window
    "x_pack_greedy",        # full-corpus token count + grouped pandas pack
    "x_unpivot",            # full-lineitem melt
    "t_resample",           # grid generation from per-key min/max
    "t_asof_nearest",       # full-events union + window
    "s_ivf_topk",           # full-embeddings scan + centroid sample
    "s_pq_topk",            # full-embeddings narrow encode + LUT broadcast
    "s_sq_topk",            # full-embeddings narrow int8 encode
    "s_lsh_topk",           # full-embeddings bucketing
    "g_gremlin_pipe",       # kind/label predicates fold into union-branch pruning
    "g_gremlin_heavy",      # label/quantity predicates fold into union branches
    "d_indexed_dedupe",     # batch-vs-persisted-index fingerprint joins
    "x_frames",             # full-corpus synthetic AVI decode (mapInPandas)
    "s_ivf_indexed_topk",   # probe prune is PartitionFilters (directory-level,
                            # stronger than a row-group PushedFilters entry)
    "s_ivfpq_topk",         # same: PartitionFilters on the codes scan
    "s_ivfpq_derived_topk",  # same, derived FAISS geometry (r12)
    "s_ivf_kmeans_topk",    # full-embeddings scan + iterative centroid refine
    "g_gremlin_path",       # kind predicates fold into union-branch pruning
    "g_gremlin_loop",       # kind/date predicates fold into union branches
    "g_gremlin_except",     # kind predicates fold into union branches
    "s_ivfpq_rerank",       # PartitionFilters on codes AND vectors scans
    "s_ivfpq_residual_topk",  # PartitionFilters on the codes scan
    "x_frames_mjpeg",       # full-corpus synthetic MJPEG decode (mapInPandas)
    "st_ann_ingest",        # PartitionFilters on BOTH union branches of the
                            # base+delta probe (directory-level prune)
    "st_annpq_ingest",      # same, on the compressed base+delta code scans
    "g_gremlin_loop_while",  # fixpoint: the final plan aggregates the
                             # union of per-round localCheckpoint scans —
                             # upstream pruning happened in earlier jobs
    "g_gremlin_loop_emit",   # same
    "st_ann_drift",          # full-index aggregation by design (the
                             # monitor reads every list once)
    "st_annpq_drift",        # same (over the raw-vector sidecar)
    "x_frames_msv1",         # full-corpus synthetic CRAM decode
                             # (mapInPandas; doc_id % 11 is not a
                             # pushable predicate)
    "x_audio_adpcm",         # same (ADPCM decode; doc_id % 13)
    "x_warc_ingest",         # binaryFile scan + executor-side parse
    "s_bm25_topk",           # full-corpus tokenize — the query-term
                             # prune is the broadcast semi-join, not a
                             # scan-level predicate
    "x_phrase_hits",         # full-corpus token-stream render; the
                             # phrase book is a broadcast, the match a
                             # map-side literal scan
    "s_cluster_sample",      # full-embeddings narrow assignment map
    "k_cms_heavy",           # full-corpus token explode into the sketch
    "m_dhash_dups",          # doc_id % 19 is not a pushable predicate;
                             # the decode is a narrow mapInPandas
    "k_hll_orderkeys",       # full-lineitem register fold by design
    "g_ktruss",              # fixpoint peel: the final plan reads the
                             # last localCheckpoint, no parquet scan
    "r_profile",             # full-table ANALYZE pass by design
    # --- full-registry extension (VERDICT r6 item 4) ---
    "d_containment",        # full-corpus shingling; rare-df blocking is an agg
    "d_corpus_dedupe",      # full-corpus fingerprinting
    "d_exact_dups",         # full-corpus hash groupBy
    "d_lsh_fast_pairs",     # full-corpus shingling (both hash families)
    "d_minhash_sigs",       # full-corpus shingling
    "d_text_hashes",        # full-corpus narrow hash map
    "x_chunks",             # full-corpus narrow chunk map (filter is on
                            # the computed token array — nothing pushable)
    "events_type_stats",    # full-events aggregation
    "g_bfs_levels",         # iterative: final plan reads round checkpoints
    "g_closeness",          # same (per-source BFS frontier)
    "g_components",         # same
    "g_components_star",    # same
    "g_hits",               # same
    "g_clustering",         # one-row checkpointed transitivity result
    "g_triangles_local",    # checkpointed per-vertex triangle counts
    "g_kcore",              # same
    "g_lpa_communities",    # same
    "g_pagerank_top10",     # same
    "g_ppr_top10",          # same
    "g_edges_by_label",     # label predicate folds into union-branch pruning
    "g_vertices_by_kind",   # kind predicate folds into union-branch pruning
    "m_media_features",     # full-corpus mapInPandas feature extraction
    "m_media_meta",         # full-corpus narrow metadata map
    "m_resized_meta",       # full-corpus mapInPandas resize
    "st_dedup_ingest",      # reads back the sink's committed output table
    "st_scd2_ingest",       # same
    "st_running_stats",     # memory-sink read-back
    "st_sessionize",        # same
    "st_stream_join",       # same
    "st_windowed_counts",   # same
    "t_compact",            # full-events run-merge windows
    "t_gap_stats",          # full-events lag windows
    "t_scd2_travel",        # manifest-resolved versioned table read
    "t_validity_intervals", # full tx_log interval build
    "t_version_counts",     # full tx_log rollup
    "x_bpe_merges",         # driver-collected merge table: LocalTableScan
    "x_fingerprint",        # full-corpus narrow hash map
    "x_graphml_ingest",     # binaryFile scan + executor-side XML parse
    "x_graphml_export",     # same reader shape on the written shards
    "g_random_walks",       # co-purchase projection; %7 seed filter is derived
    "g_walk_skipgrams",     # same walk tree + narrow pair map
    "g_mis",                # iterative: final plan joins round checkpoints
    "x_langid",             # full-corpus narrow n-gram map
    "x_tokens",             # full-corpus narrow token count
    "d_containment_budget",  # same checkpointed-pair-table shape as
                             # d_containment
    "g_node2vec_budget",     # same (hash-rank-capped twin)
    "g_node2vec_walks",      # co-purchase projection; %7 seed filter is
                             # derived (g_random_walks' shape)
    "x_rouge",              # ngram_overlap materializes via localCheckpoint
                            # (cache-lifetime fix): final plan joins two
                            # checkpoint scans — upstream pruning ran in
                            # the checkpointed jobs
}
# queries whose only joins are vertex-id scale (AQE decides at runtime)
NO_BROADCAST_EXPECTED = {
    "g_out_degree_top20",
    "pricing_summary",
    "revenue_filter",
    "t_scd2_versions",
    "t_sessionize",
    "d_simhash",
    "x_quality",
    "t_asof_join",
    "s_cosine_topk",
    "pipeline_corpus",      # pure per-document maps + one window — no joins
    "pipeline_crawl",       # same (ingest is mapInPandas, no joins)
    "r_order_priority",     # orders/lineitem semi-join: AQE decides at runtime
    "r_inactive_customers", # customer/orders anti-join: AQE decides
    "r_promo_share",        # lineitem/part join: AQE decides
    "r_big_orders",
    "r_disjunctive_rev",
    "r_small_quantity_rev",
    "t_time_buckets",       # no joins
    "t_range_join",         # point/interval equi-join: AQE decides
    "x_percentiles", "x_rolling", "x_scrub", "x_repetition", "x_split",
    "k_sketches",
    "g_copurchase_top",     # order-keyed self-join: AQE decides
    "g_triangles_local",    # wedge/close equi-joins on vertex ids: AQE decides
    "g_motif_open_paths",   # pattern equi-joins on vertex ids: AQE decides
    "t_versions_at",        # no joins
    "t_asof_join_fwd",      # union + window, no joins
    "x_range_frame", "x_json_extract",
    "r_topk_per_group",     # lineitem/part join: AQE decides
    "r_pivot_status", "r_cube_stats",
    "r_setops",             # cohort full-outer join: AQE decides
    "d_winnow_pairs",       # fingerprint self-join: AQE decides
    "d_edit_near_dups",     # fingerprint + text joins: AQE decides
    "d_incr_dedupe",        # batch-vs-index joins: AQE decides
    "r_priority_lines",     # orders/lineitem join: AQE decides
    "r_custdist",           # customer/orders outer join: AQE decides
    "r_important_parts",    # scalar joins via BroadcastNestedLoop (1 row); semi-join AQE
    "r_excess_suppliers",   # SF-proportional aggs both sides: AQE decides
    "r_supplier_cnt",       # bad-supplier list broadcasts, but the anti-join may
                            # plan as BroadcastNestedLoop under AQE-off audit; allow
    "g_triangles",          # edge-set self-joins: AQE decides
    "x_window_suite",       # no joins
    "x_tfidf_top_terms",    # tf/df join: AQE decides
    "x_vocab",              # no joins
    "t_asof_tolerance",     # union + window, no joins
    "d_span_dup",           # count window + per-doc agg, no joins
    "x_strat_sample",       # pure narrow filter, no joins
    "s_label_centroids",    # posexplode + one agg, no joins
    "g_link_predict",       # wedge self-join + anti-join: AQE decides
    "d_prefix_dedupe",      # one window, no joins
    "t_funnel",             # user-keyed stage joins: AQE decides
    "x_corpus_stats",       # one agg, no joins
    "x_weighted_sample",    # narrow map + filter, no joins
    "x_pack",               # no joins (window + agg)
    "x_pack_greedy",        # no joins (group shuffle + applyInPandas + agg)
    "x_unpivot",            # no joins
    "t_asof_nearest",       # union + window, no joins
    "t_resample",           # grid/hourly join: AQE decides
    "s_lsh_topk",           # bucket equi-join: broadcast chosen by hint/AQE
    "st_changefeed",        # memory-sink rollup, no joins
    "s_ivf_topk",           # probe joins: AQE decides
    "d_semantic_dedupe",    # corpus-scale embedding self-join: must NOT broadcast at scale
    "d_semantic_ivf_dedupe",  # bucket self-join: must NOT broadcast at scale
    "g_gremlin_pipe",       # hop equi-joins: AQE decides at runtime
    "g_gremlin_heavy",      # endpoint join: AQE decides
    "d_indexed_dedupe",     # batch-vs-index joins: AQE decides
    "x_frames",             # narrow mapInPandas decode, no joins
    "s_ivf_kmeans_topk",    # probe joins: AQE decides
    "g_gremlin_path",       # hop equi-joins: AQE decides
    "g_gremlin_loop",       # hop equi-joins: AQE decides
    "g_gremlin_except",     # hop + anti joins: AQE decides
    "x_frames_mjpeg",       # narrow mapInPandas decode, no joins
    "g_gremlin_loop_while",  # exit-split filters over checkpointed rounds
    "g_gremlin_loop_emit",   # same
    "x_frames_msv1",         # narrow mapInPandas decode, no joins
    "x_audio_adpcm",         # narrow mapInPandas decode, no joins
    "x_warc_ingest",         # narrow mapInPandas parse, no joins
    "s_cluster_sample",      # narrow unrolled-centroid assignment +
                             # two windows, no joins at all
    "m_dhash_dups",          # band self-join: AQE decides
    "g_ktruss",              # final plan is the checkpointed edge set
    "r_profile",             # one aggregation, no joins
    # --- full-registry extension (VERDICT r6 item 4) ---
    "d_exact_dups",         # hash groupBy, no joins
    "d_minhash_sigs",       # shingle explode + min-agg, no joins
    "d_text_hashes",        # narrow map, no joins
    "x_chunks",             # narrow map, no joins
    "events_type_stats",    # one agg, no joins
    "g_bfs_levels",         # vertex-id-scale frontier joins: AQE decides
    "g_closeness",          # same
    "g_components",         # same
    "g_components_star",    # same
    "g_kcore",              # same
    "g_lpa_communities",    # same
    "g_pagerank_top10",     # same
    "g_ppr_top10",          # same
    "g_customers_in_nation",  # one pruned scan + filter, no joins
    "g_edges_by_label",     # pruned union scan, no joins
    "g_vertices_by_kind",   # pruned union scan, no joins
    "m_dhash_survivors",    # band self-join + component joins: AQE decides
    "m_frame_samples",      # narrow mapInPandas decode, no joins
    "m_media_features",     # narrow mapInPandas, no joins
    "m_media_meta",         # narrow map, no joins
    "m_resized_meta",       # narrow mapInPandas, no joins
    "st_dedup_ingest",      # sink read-back + fingerprint joins: AQE decides
    "st_scd2_ingest",       # sink read-back scan, no joins
    "st_running_stats",     # memory-sink read-back, no joins
    "st_sessionize",        # same
    "st_stream_join",       # stream-stream join already materialized
    "st_windowed_counts",   # memory-sink read-back, no joins
    "t_asof_user_state",    # union + window, no joins
    "t_compact",            # windows, no joins
    "t_gap_stats",          # lag windows, no joins
    "t_scd2_travel",        # versioned read, no joins
    "t_validity_intervals", # lead window over tx_log, no joins
    "t_version_counts",     # one rollup, no joins
    "x_bpe_merges",         # LocalTableScan, no joins
    "x_fingerprint",        # narrow map, no joins
    "x_langid",             # narrow map, no joins
    "x_tokens",             # narrow map, no joins
    "g_mis",                # undecided-frontier joins: AQE decides
    "g_hits",               # top-10 window over the checkpointed scores
    "g_clustering",         # one-row checkpointed result
    "g_random_walks",       # final plan is the checkpointed walk table
    "g_node2vec_budget",    # same
    "g_node2vec_walks",     # same
    "g_walk_skipgrams",     # narrow pair map + agg over the checkpoint
    "d_minhash_lsh_pairs",  # final plan is the checkpointed pair table
    "d_lsh_verified_pairs", # same
    "d_lsh_budget",         # same
    "d_lsh_fast_pairs",     # recall audit over two checkpointed pair sets
    "x_graphml_ingest",     # degree join over checkpointed splits: AQE decides
    "x_graphml_export",     # same
    "d_containment",        # final plan is the checkpointed pair table
    "d_containment_budget", # same
    "x_rouge",              # joins two checkpoint scans: AQE decides
}
# queries whose FINAL plan legitimately contains no file scan at all:
# the driver-side fixpoint materializes each round via localCheckpoint,
# so the returned DataFrame unions checkpointed RDD scans — the pruned
# parquet scans ran (and were audited) in the per-round jobs upstream.
NO_SCAN_EXPECTED = {
    "g_gremlin_loop_while",
    "g_gremlin_loop_emit",
    "g_ktruss",              # fixpoint peel: the final plan reads the
                             # last round's localCheckpoint
    # --- full-registry extension: iterative analytics return the last
    # round's localCheckpoint; memory-sink streaming queries return the
    # sink's in-memory table; x_bpe_merges returns the driver-collected
    # merge table (LocalTableScan).  The upstream parquet scans ran (and
    # were pruned) in earlier jobs.
    "g_bfs_levels",
    "g_closeness",
    "g_components",
    "g_kcore",
    "g_lpa_communities",
    "g_pagerank_top10",
    "g_ppr_top10",
    "st_running_stats",
    "st_sessionize",
    "st_stream_join",
    "st_windowed_counts",
    "st_changefeed",
    "x_bpe_merges",
    # cache-lifetime fixes (ADVICE r7): the pair/overlap tables
    # localCheckpoint inside the operator so the shingle/gram caches can
    # be released; the pruned parquet scans ran in the checkpointed jobs
    "d_containment",
    "d_containment_budget",
    "x_rouge",
    "g_random_walks",
    "g_node2vec_budget",
    "g_node2vec_walks",
    "g_walk_skipgrams",
    "d_minhash_lsh_pairs",
    "d_lsh_verified_pairs",
    "d_lsh_budget",
    "d_lsh_fast_pairs",
    # graph-text loads checkpoint both splits and release the parse
    # cache; the binaryFile scan ran in the checkpointed job
    "x_graphml_ingest",
    "x_graphml_export",
    # iterative/enumeration operators now materialize their results and
    # release the per-call edge caches (_finish): the final plan is the
    # checkpointed result (the upstream scans ran in earlier jobs)
    "g_hits",
    "g_mis",
    "g_components_star",
    "g_clustering",
    "g_triangles_local",
}


# Plan-size gate (VERDICT r10 item 6): a healthy Catalyst plan is a few
# KB to a few tens of KB of formatted text, INDEPENDENT of the data.  A
# plan whose size scales with a data-derived constant — the r10 finding:
# ivf_assign unrolling k = ceil(sqrt(corpus)) centroids × dim literal
# arrays into one expression (~1.5 KB per centroid at dim 64, so the
# derived k=45 at sf0.1 was ~70 KB and a 100 TB corpus' k≈10^6 would be
# gigabytes of expression tree, unbuildable) — blows through this cap
# long before it kills the driver, so the audit catches the CLASS at
# gate scale: the cap (256 KB) sits ~3× above today's largest
# legitimate plan, while one data-derived 10× step in an unrolled knob
# crosses it.  A query over the cap fails the audit (non-zero exit)
# until its operator gets a size-independent strategy (the way
# ivf_assign now switches to the broadcast+Arrow scan past
# IVF_ASSIGN_UNROLL_MAX).
PLAN_SIZE_CAP_BYTES = 256 * 1024


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def audit(name: str, plan: str) -> dict:
    return {
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        "read_schema_pruned": "ReadSchema" in plan,
        "broadcast": "BroadcastHashJoin" in plan or "BroadcastExchange" in plan,
        "codegen": "codegen id" in plan or "WholeStageCodegen" in plan,
        "python_row_eval": "BatchEvalPython" in plan,
        "arrow_eval": "ArrowEvalPython" in plan or "MapInPandas" in plan,
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "plan_bytes": len(plan),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        # AQE off ONLY here: the static plan then carries codegen ids and
        # final join strategies, so the audit can grep them (bench and
        # production sessions keep AQE on)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    lines = [
        "# PLAN_AUDIT — physical plans of the headline queries",
        "",
        f"Generated by `scripts/explain_audit.py` at `{sf_dir}`.",
        "",
        "Checks per query: predicate pushdown reached the parquet scan, the",
        "scan's ReadSchema is pruned to referenced columns, bounded dims use",
        "broadcast joins, expression work runs inside WholeStageCodegen, and",
        "no row-at-a-time Python eval appears in any plan (Arrow-batched",
        "`mapInPandas` is allowed only in the multimodal stage).  `plan`",
        "is the formatted-plan size — capped (r11) at "
        f"{PLAN_SIZE_CAP_BYTES // 1024} KB to catch expression trees that",
        "grow with a data-derived constant (the r10 ivf_assign finding).",
        "",
        "| query | pushdown | pruned scan | broadcast | codegen | py-row-eval | shuffles | plan |",
        "|---|---|---|---|---|---|---|---|",
    ]
    failures = []
    excerpts = []
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        plan = plan_of(df)
        a = audit(name, plan)
        ok_push = a["pushed_filters"] or name in NO_PUSHDOWN_EXPECTED
        ok_bcast = a["broadcast"] or name in NO_BROADCAST_EXPECTED
        if not ok_push:
            failures.append(f"{name}: expected PushedFilters, none found")
        if not ok_bcast:
            failures.append(f"{name}: expected a broadcast join, none found")
        if not a["read_schema_pruned"] and name not in NO_SCAN_EXPECTED:
            failures.append(f"{name}: no ReadSchema (scan not pruned?)")
        if not a["codegen"]:
            failures.append(f"{name}: no WholeStageCodegen span")
        if a["python_row_eval"]:
            failures.append(f"{name}: BatchEvalPython in plan (row-at-a-time Python)")
        if a["plan_bytes"] > PLAN_SIZE_CAP_BYTES:
            failures.append(
                f"{name}: formatted plan is {a['plan_bytes']} bytes "
                f"(> {PLAN_SIZE_CAP_BYTES}) — a plan this large almost "
                f"always means a data-derived constant was unrolled into "
                f"the expression tree (the r10 ivf_assign class); give the "
                f"operator a size-independent strategy"
            )
        mark = lambda b: "✓" if b else "—"
        lines.append(
            f"| {name} | {mark(a['pushed_filters'])} | {mark(a['read_schema_pruned'])} "
            f"| {mark(a['broadcast'])} | {mark(a['codegen'])} "
            f"| {'✗ FAIL' if a['python_row_eval'] else '—'} | {a['exchanges']} "
            f"| {a['plan_bytes'] // 1024}K |"
        )
        # keep one representative excerpt: the scan lines + join strategy lines
        keep = [
            l
            for l in plan.splitlines()
            if re.search(
                r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|HashAggregate\b",
                l,
            )
        ][:12]
        excerpts.append((name, keep))
    lines += ["", "`—` = not applicable for that query's shape (see", "`NO_PUSHDOWN_EXPECTED` / `NO_BROADCAST_EXPECTED` in the script —", "e.g. full-corpus maps have nothing to push down; vertex-scale joins", "are left to AQE to pick broadcast vs shuffle at runtime).", ""]
    lines.append("## Plan excerpts (scan + join strategy lines)")
    for name, keep in excerpts:
        lines.append(f"\n### {name}\n")
        lines.append("```")
        lines.extend(l.strip()[:160] for l in keep)
        lines.append("```")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    if failures:
        print("AUDIT FAILURES:")
        for f_ in failures:
            print(" -", f_)
        sys.exit(1)
    print("AUDIT OK")
    spark.stop()


if __name__ == "__main__":
    main()
