"""Column profiling — the ANALYZE/data-quality pass every ingest runs
before trusting a new table: per-column null counts and exact distinct
cardinalities in ONE scan.

Reference parity note: the reference era's closest analog is manual
per-attribute queries; a corpus pipeline wants the whole profile as a
table it can assert on (null-rate regressions, cardinality drift
between crawl batches).

Scale shape: one aggregation — Catalyst plans the multi-distinct via
Expand (|cols|+1 rows per input row before partial aggregation), the
standard exact-ANALYZE cost.  At 10^12 rows exact distincts are the
expensive part; pass ``exact=False`` to swap them for HLL-based
``approx_count_distinct`` (same single-scan shape, fixed-size state —
but implementation-defined values, so the hash-gated registry query
uses the exact form).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """``(col_name, n_rows, n_nulls, n_distinct)`` — one row per
    profiled column, computed in a single aggregation pass.

    ``n_distinct`` counts DISTINCT NON-NULL values (the SQL
    ``count(DISTINCT col)`` contract).  With ``exact=False`` it is the
    HLL estimate at relative standard deviation ``rsd``."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c), rsd))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
        aggs.append(nd(c).cast("long").alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
