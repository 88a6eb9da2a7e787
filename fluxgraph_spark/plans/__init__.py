"""Physical-layout planning helpers.

The reference has no optimizer (SURVEY.md §4.1) — Catalyst supplies
predicate pushdown, join selection, and AQE for free.  What Catalyst
cannot invent is the on-disk LAYOUT, so this package owns the two
engine-level layout decisions that matter at 100 TB:

* time-bucketed partitioning of SCD2 element tables so as-of snapshot
  reads prune to the buckets that can contain visible versions
  (SURVEY.md §4.2.6 — implemented as explicit partition columns, no
  custom Catalyst rule needed);
* id-bucketing so traversal joins co-locate without a shuffle.
"""

from .layout import (
    write_time_bucketed,
    read_as_of_pruned,
    write_id_bucketed,
    materialize_graph_bucketed,
    BucketedGraph,
    explain_str,
)

__all__ = [
    "write_time_bucketed",
    "read_as_of_pruned",
    "write_id_bucketed",
    "materialize_graph_bucketed",
    "BucketedGraph",
    "explain_str",
]
