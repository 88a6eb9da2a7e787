"""Generate a 10x replica of the sf0.1 testdata for scale-proofing.

Writes parquet under the repo (default .scale_data/sf1.0 — gitignored);
never touches /root/testdata.  Replication preserves WORKLOAD SHAPE so a
bench ratio is meaningful:

* fact keys shift per replica (custkey/orderkey/partkey/suppkey/doc_id/
  vec_id/user_id/event_id), so key cardinality scales with the data and
  per-key group sizes stay constant;
* nation/region stay single-copy fixed dims (10x customers across the
  same 25 nations — how a real 10x corpus behaves);
* document tokens get a per-replica suffix, so WITHIN-replica near-dup
  structure is identical to sf0.1 while replicas are mutually distinct
  (otherwise every doc gains 9 exact twins and LSH bucket sizes grow
  10x, turning pair counts quadratic — a workload change, not a scale
  test);
* embedding labels (the cosine blocking key) are per-replica for the
  same reason: blocks scale in COUNT, not size.

Usage: python scripts/gen_scale_data.py [factor] [src_dir] [out_dir]
                                        [key_shift] [label_mult] [skew]

SKEW MODE (6th arg literally ``skew`` — VERDICT r10 item 3): the
key-shifted replicas above keep per-doc candidate degree and hub degree
scale-INVARIANT by construction, so the two skew knobs (containment
budget, walk degree budget) measure parity at every local tier.  Skew
mode grows both with SF, the way a real corpus does:

* **duplicate density**: documents whose BASE doc_id % 50 == 0 (2%)
  SKIP the per-replica token suffix, so each gains FACTOR-1 exact
  twins per tier — near-dup cluster sizes (and the banded candidate
  degree the containment budget caps) grow ×FACTOR per tier while the
  other 98% keep the shape-preserving suffix;
* **hub degree**: lineitem rows whose BASE l_partkey % 100 < 5 (5%)
  keep their partkey UNSHIFTED — those GLOBAL hub parts collect
  co-purchase edges from every replica's orders, so hub out-degree
  (what the walk budget caps) grows ×FACTOR per tier.

Both masks are modulo the base key and every tier shift is a multiple
of 100, so tier-2 replication composes: the same global docs/parts
keep growing (cluster 10 → 100, hub degree 10× → 100×).

    python scripts/gen_scale_data.py 10 /root/testdata/sf0.1 \
        .scale_data/sf1.0_skew 1000000000 1000 skew
    python scripts/gen_scale_data.py 10 .scale_data/sf1.0_skew \
        .scale_data/sf10_skew 10000000000 10000 skew

A SECOND tier (100x: replicate the sf1.0 replica 10x again) needs a
key shift ABOVE the first tier's range and a label multiplier above its
label range, or tier-2 replica r2 of tier-1 replica r1 collides with
(r1', r2') whenever r1+r2 = r1'+r2':

    python scripts/gen_scale_data.py 10 .scale_data/sf1.0 \
        .scale_data/sf10 10000000000 10000
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = (
    sys.argv[3]
    if len(sys.argv) > 3
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".scale_data", "sf1.0")
)

# key offset per replica, far above any base key (tier 2 passes a value
# above tier 1's whole key range)
SHIFT = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000_000
# embedding-label offset per replica (tier 2 passes a value above tier
# 1's whole label range)
LABEL_MULT = int(sys.argv[5]) if len(sys.argv) > 5 else 1_000
# skew mode: grow duplicate density and hub degree with SF (see module
# docstring) — the masks divide the tier shifts, so tiers compose
SKEW = len(sys.argv) > 6 and sys.argv[6] == "skew"
SKEW_DOC_MOD = 50   # 2% of docs become global (unsuffixed) duplicates
SKEW_PART_MOD, SKEW_PART_HUBS = 100, 5  # 5% of lineitem keeps global partkeys

# table -> columns to shift by replica * SHIFT
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
FIXED_DIMS = ["nation", "region"]


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gen_scale_data")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    for tbl in FIXED_DIMS:
        df = spark.read.parquet(os.path.join(SRC, f"{tbl}.parquet"))
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(OUT, f"{tbl}.parquet"))
        print(f"{tbl}: copied fixed dim")

    for tbl, keys in SHIFT_COLS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{tbl}.parquet"))
        rep = df.crossJoin(
            spark.range(FACTOR).select(F.col("id").alias("__r"))
        )
        # skew masks evaluate on the PRE-shift key (and survive tiers:
        # every SHIFT is a multiple of the mask moduli)
        skew_doc = SKEW and tbl == "documents"
        if skew_doc:
            rep = rep.withColumn(
                "__global_dup", (F.col("doc_id") % SKEW_DOC_MOD) == 0
            )
        for k in keys:
            if SKEW and tbl == "lineitem" and k == "l_partkey":
                rep = rep.withColumn(
                    k,
                    F.when(
                        F.col(k) % SKEW_PART_MOD < SKEW_PART_HUBS, F.col(k)
                    ).otherwise(F.col(k) + F.col("__r") * F.lit(SHIFT)),
                )
            else:
                rep = rep.withColumn(k, F.col(k) + F.col("__r") * F.lit(SHIFT))
        if tbl == "documents":
            # per-replica token suffix: replicas mutually distinct,
            # within-replica shingle structure unchanged
            # split on runs of whitespace and drop empties so irregular
            # spacing never fabricates extra "~r" tokens (token counts and
            # shingle sets must keep the base corpus's shape)
            suffixed = F.array_join(
                F.transform(
                    F.filter(
                        F.split(F.col("text"), r"\s+"), lambda x: x != ""
                    ),
                    lambda x: F.concat(x, F.lit("~"), F.col("__r").cast("string")),
                ),
                " ",
            )
            if skew_doc:
                # global duplicates keep the RAW text — FACTOR-sized
                # near-dup clusters per tier (the skew the budget knobs
                # exist for); everyone else keeps the shape-preserving
                # per-replica suffix
                rep = rep.withColumn(
                    "text",
                    F.when(F.col("__global_dup"), F.col("text")).otherwise(suffixed),
                ).drop("__global_dup")
            else:
                rep = rep.withColumn("text", suffixed)
            rep = rep.withColumn("n_chars", F.length("text"))
        if tbl == "embeddings":
            rep = rep.withColumn(
                "label", F.col("label") + (F.col("__r") * LABEL_MULT).cast("int")
            )
        # keep PER-FILE size constant as data scales (file count grows
        # FACTOR-fold per tier): a replicate of a single-file source
        # otherwise lands as ONE parquet file, and a file under
        # maxPartitionBytes is ONE split — at 100x that made the whole
        # 6M-doc explode a single straggler task (observed: 25+ min on
        # one core).  Real lakehouse data arrives in many
        # constant-sized files; the replica tiers should look the same
        # so scan parallelism scales with the data, as it would in
        # production.
        src_path = os.path.join(SRC, f"{tbl}.parquet")
        n_src_files = (
            len([f for f in os.listdir(src_path) if f.startswith("part-")])
            if os.path.isdir(src_path)
            else 1  # the driver testdata ships single-file tables
        )
        out = rep.drop("__r").repartition(FACTOR * max(1, n_src_files))
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{tbl}.parquet"))
        print(f"{tbl}: {df.count()} -> {out.count()} rows")

    spark.stop()
    print(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
