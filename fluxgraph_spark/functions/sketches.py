"""Count-min sketch — fixed-size frequency estimation for heavy-hitter
analysis over corpora too large for an exact distinct-count table.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): ``depth`` hash rows of
``width`` counters; every key increments one counter per row
(``counter[j][h_j(key)] += w``), a lookup takes the MINIMUM over its
row counters.  Estimates are ONE-SIDED (``est >= true`` always — a
counter only ever accumulates its own key plus collisions) and
over-estimate by at most ``e/width * N`` per row with probability
``1 - e^-depth`` (union bound over the independent rows).

Why this shape at 100 TB: the sketch is ``depth x width`` rows NO
MATTER the corpus size, the build is one map-side-combinable
aggregation (the shuffle carries (row, bucket) partial sums, never
keys), and two sketches over disjoint corpora MERGE by counter
addition — the streaming/partitioned form every production frequency
monitor uses.  An exact term-frequency table at 10^12 tokens is a
10^9-row shuffle; the sketch is ~10^4 rows.

Determinism contract: the row hashes are md5-derived
(``md5(j || ':' || key)``, first 15 hex chars, mod width — the
stable_hash64 family), so the ENTIRE sketch, and therefore every
estimate, replays bit-for-bit in an external SQL engine.  No verdict
columns needed: the oracle recomputes the same counters and the same
minima.

Reference parity note: the reference engine has no sketch surface; the
extended analytics family (SURVEY §2.9 A9/A10, k_sketches) carries the
approximate tier, and this module adds the frequency member beside the
existing HLL-distinct and quantile sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_hash(key: Column, j: int, width: int) -> Column:
    """Row-``j`` bucket of ``key``: md5-derived 60-bit hash mod width.
    DuckDB equivalent:
    ``('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || key), 1, 15))::UBIGINT % width``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(int(j))), F.lit(":"), key)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(int(width)))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch ``df[key_col]`` (one increment per row, or ``weight_col``
    units per row) into ``(j, bucket, cnt)`` — at most ``depth*width``
    rows.  The explode-by-row is a narrow map (depth is 3-5); the one
    shuffle is the (j, bucket) aggregation with map-side combine."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_hash(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
        w.alias("__w"),
    )
    return (
        rows.select(F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"), "__w")
        .groupBy("j", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum of two sketches built with the SAME depth/width
    — the associative merge that makes per-partition / per-day sketches
    composable."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """``(key, est_n)`` for every row of ``keys`` — the minimum of the
    key's ``depth`` row counters (0 when a counter was never touched).
    ``depth``/``width`` must match the build.  The sketch is at most
    depth*width rows, so it broadcasts; the probe never shuffles the
    key set."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_hash(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("key", F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est_n"))
