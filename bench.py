"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink — full computation, no
driver-side collect skewing the timing.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

HEADLINE = [
    "g_revenue_by_region",      # flagship 3-hop graph rollup
    "g_orders_per_customer",    # 1-hop + agg
    "g_out_degree_top20",       # degree + topk
    "g_touch_count_3hop",       # reference benchmark counter
    "pricing_summary",          # TPC-H Q1 shape
    "top_orders_building",      # TPC-H Q3 shape
    "region_revenue",           # TPC-H Q5 shape
    "revenue_filter",           # TPC-H Q6 shape
    "t_scd2_versions",          # SCD2 window build
    "t_asof_join",              # as-of join (union+window)
    "t_sessionize",             # sessionization
    "d_lsh_fast_raw",           # dedup: minhash->LSH->verify (xxhash64 fast
                                # path; bench-local callable — the registry's
                                # d_lsh_fast_pairs is now a recall audit that
                                # also computes the md5 truth set, which would
                                # double-count here.  Same plan/params as the
                                # d_lsh_fast_pairs benched in BENCH_r04.)
    "d_indexed_probe",          # dedup steady state: batch probe against the
                                # PERSISTED bucketed index (built once outside
                                # timings — the recurring cost a crawl pays;
                                # VERDICT r4 item 4)
    "d_simhash",                # simhash fingerprints
    "x_quality",                # text quality scoring
    "s_cosine_topk",            # similarity search
    "pipeline_corpus",          # end-to-end quality->langid->dedup pipeline
    "r_order_priority",         # semi-join (EXISTS)
    "r_rollup_revenue",         # ROLLUP multi-level agg
    "t_range_join",             # bucketed interval/band join
    "g_copurchase_top",         # co-occurrence self-join
    "x_repetition",             # dup-n-gram repetition signal
    "d_semantic_dedupe",        # embedding pairs -> components -> survivors
    "d_lsh_verified_pairs",     # md5 minhash LSH + exact-Jaccard verify
    "x_pack",                   # context-window sequence packing
    "g_gremlin_loop_while",     # driver-fixpoint loop: region-bound walk
                                # (r6 — superstep rounds, localCheckpoint
                                # per round, data-dependent exit)
    "s_sq_topk",                # int8 scalar-quantized compressed scan (r6)
    "s_bm25_topk",              # BM25 one-scan full-text ranking (r6)
    "s_bm25_indexed_probe",     # BM25 steady state: probe against the
                                # PERSISTED inverted index (built once
                                # outside timings — the d_indexed_probe
                                # split for full-text; VERDICT r6 item 6)
    "g_node2vec_walks",         # second-order biased walks (r8 — per-hop
                                # candidate windows, a different execution
                                # shape than the one-row-per-walk pick)
    "d_semantic_ivf_dedupe",    # label-free IVF-blocked semantic dedup (r9
                                # — narrow centroid assignment + per-list
                                # pair join + asserted components)
    "d_lsh_budget",             # budgeted LSH verify (r9 — dense 8-band
                                # candidate stream cut 10x by the per-doc
                                # evidence-rank budget before the verify)
    "g_closeness",              # sampled-source closeness (r9 late —
                                # labelled multi-source BFS frontier,
                                # convergence-asserted fixed rounds)
    "s_ann_recall",             # ANN recall@k measurement (r9 late —
                                # brute truth vs IVF at half probe width)
    "k_theta_setops",           # theta-sketch set ops (r9 late — O(k)
                                # overlap audit from two KMV sketches)
    "x_chunks",                 # RAG chunking (r9 late — zero-shuffle
                                # token-window explode)
    "g_node2vec_budget",        # degree-budgeted walks (r9 late — the
                                # GraphSAGE neighbor-sampling cap that
                                # bounds per-hop cost at hub growth)
    "m_dhash_survivors",        # ADDED r13 (additions-only per the bench
                                # contract): the multimodal family's
                                # heaviest member — real PNG encode/decode
                                # through the Arrow boundary, dHash band
                                # join, convergence-asserted components,
                                # survivors.  First round the m_* family
                                # is represented in the bench at all.
]


def _bench_local_queries(spark, sf_dir):
    """Bench-only callables (not registry entries):

    * ``d_lsh_fast_raw`` — the raw xxhash64 fast-path pairs.  The
      registry's d_lsh_fast_pairs is now a recall bounds audit that also
      computes the md5-family truth set; timing it would charge the fast
      path for both plans.
    * ``d_indexed_probe`` — dedupe a batch against the PERSISTED bucketed
      index.  The index is built here, ONCE, outside the timings: that is
      the steady-state split a crawl pipeline actually runs (build
      amortized over many batches; the probe is the recurring cost).
      SCALE_BENCH showed the recompute path's verify tier at 8.15x for
      10x data vs 1.94x for the indexed path — this entry tracks the
      number that matters at 100 TB.
    """
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    def _tmp(prefix):
        d = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        return d

    from fluxgraph_spark.functions import dedup as dedup_mod
    from fluxgraph_spark.sources import bucketed as BK
    from fluxgraph_spark.sources import text_index as TI
    from fluxgraph_spark.sources import tpch as tpch_mod

    def d_lsh_fast_raw(spark, sf_dir):
        docs = tpch_mod.read_tables(spark, sf_dir)["documents"]
        return dedup_mod.minhash_lsh_dedup(
            docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.5
        )

    db = "flux_bench_idx"
    BK.ensure_database(spark, db, _tmp(f"{db}_"))
    docs = tpch_mod.read_tables(spark, sf_dir)["documents"]
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    idx = BK.DedupIndex.build(
        corpus, "doc_id", "text", f"{db}.corpus",
        n=3, num_hashes=8, bands=4,
    )

    def d_indexed_probe(spark, sf_dir):
        batch = tpch_mod.read_tables(spark, sf_dir)["documents"].where(
            F.col("doc_id") % 5 == 0
        )
        return idx.dedupe_batch(batch, corpus, "doc_id", "text", threshold=0.5)

    # BM25 steady state: the inverted index builds here, ONCE, outside
    # the timings (the registry entry's session cache would also reuse
    # it, but an explicit bench-local probe keeps the split visible and
    # the timing honest even on the first run)
    inv_idx = TI.InvertedIndex.build(
        docs, _tmp("bench_inv_idx_"), n_buckets=16
    )

    def s_bm25_indexed_probe(spark, sf_dir):
        return inv_idx.topk(entrymod._bm25_queries_df(spark), k=10)

    return {
        "d_lsh_fast_raw": d_lsh_fast_raw,
        "d_indexed_probe": d_indexed_probe,
        "s_bm25_indexed_probe": s_bm25_indexed_probe,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fluxgraph_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Materialize the property graph ONCE (outside the timings) as
    # kind-/label-partitioned parquet — the storage layout a production
    # graph lives in.  g_* timings then measure the query, not the
    # per-call union derivation (VERDICT r3 item 6: a ~1-2s floor per
    # graph query was construction, not query).
    if not os.environ.get("SPARK_GRAFT_GRAPH_DIR"):
        from fluxgraph_spark.sources import tpch as tpch_mod

        gdir = os.path.join("/tmp", f"spark_graft_bench_graph_sf{sf}")
        tpch_mod.materialize_graph(spark, sf_dir, gdir)
        os.environ["SPARK_GRAFT_GRAPH_DIR"] = gdir
    # warmup: JVM codegen + parquet footers land outside the timings;
    # one small graph query warms the vertex/edge scan codegen paths too
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entrymod.queries()
    qs.update(_bench_local_queries(spark, sf_dir))
    qs["g_vertices_by_kind"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    # Load calibration (VERDICT r10 item 4): BENCH_r10 read 2.5x over r9
    # purely from tenant load during the driver's window — detectable
    # only by judge re-measurement.  This probe makes a load-poisoned
    # round machine-readable from the artifact alone: a PINNED trivial
    # query (revenue_filter — one pushed-filter scan + one agg, code
    # untouched since r1, historical solo band 0.17-0.27s at sf0.1)
    # timed 3x at the start AND end of the bench, plus /proc/loadavg at
    # both points.  Interpretation: probe mins far above the historical
    # band, or a large start-vs-end drift, or loadavg >> this session's
    # core count => the per-query numbers carry external load; compare
    # round-over-round only after discounting it (STATE.md documents
    # the band per round).
    def _calibrate():
        runs = []
        for _ in range(3):
            t0 = time.time()
            qs["revenue_filter"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        with open("/proc/loadavg") as f:
            load = f.read().split()[:3]
        return {"probe_runs": runs, "probe_min": min(runs),
                "loadavg": [float(x) for x in load]}

    calibration = {"probe": "revenue_filter", "cpus": int(cpus),
                   "start": _calibrate()}
    # three timed runs per query, report the min: the first run on this
    # box pays JVM codegen compilation, and individual runs occasionally
    # spike 2-4x under thread contention (documented in STATE.md) — the
    # min over three is the steady-state cost a warmed executor fleet
    # would see.  Caches are cleared between runs so the min never
    # benefits from a persist() left over by the previous run — each run
    # recomputes from parquet.
    timings = {}
    errors = {}
    for name in HEADLINE:
        fn = qs[name]
        per_run = []
        try:
            for _ in range(3):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                per_run.append(time.time() - t0)
                # queries may persist() intermediates; drop them so no run
                # (and no later query) inherits another's cache
                spark.catalog.clearCache()
        except Exception as ex:  # noqa: BLE001 — one broken query must not
            # zero out the whole bench (round-1 lesson: a data-layout
            # change killed the run before any JSON was emitted)
            errors[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        timings[name] = round(min(per_run), 3)
    calibration["end"] = _calibrate()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 3,
        "aggregation": "min",
        "calibration": calibration,
    }
    if errors:
        out["errors"] = errors
    # Scale-proof points live in the committed SCALE_BENCH.json; embedding
    # the whole blob in the final line made it unparseable for the driver
    # (BENCH_r05/r06 recorded `parsed: null` — only a 2 KB tail survives).
    # Print a one-line POINTER on stderr and keep the final stdout line the
    # compact headline JSON only (VERDICT r6 item 3).
    scale_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "SCALE_BENCH.json")
    if os.path.exists(scale_path):
        try:
            with open(scale_path) as f:
                sc = json.load(f)
            out["scale_check_file"] = "SCALE_BENCH.json"
            out["scale_super_linear"] = sorted(sc.get("super_linear", {}))
        except Exception:  # noqa: BLE001 — never break the bench line
            pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
