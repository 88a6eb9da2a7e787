"""Driver-side SCD2 row store backing the mutable write path.

The reference auto-commits one Datomic transaction per graph mutation
(supportsTransactions=false, FluxGraph.java:63; thread-local datom buffer
flushed per op, FluxGraph.java:32-36, 325-340).  Per-element writes are
inherently row-at-a-time, so the engine keeps the *write path* on the
driver (cheap dict updates, exact reference semantics) and materializes
Spark DataFrames lazily for the *read/analytics path* — the scale story
for writes at 100 TB is the batch path (`TemporalGraph.from_dataframes` /
`operators.temporal.scd2_upsert`), not one-vertex-at-a-time CRUD.

DataFrames are rebuilt only when the store has mutated since the last
build (generation counter), so repeated reads are free.
"""

from __future__ import annotations

import datetime
from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from . import model as M


class RowVersion(dict):
    """One SCD2 version row.  Keys: id, tx_from, tx_to, (src, dst, label
    for edges), props (mangled-column -> value)."""


class LocalStore:
    def __init__(self) -> None:
        self.vertices: list[RowVersion] = []
        self.edges: list[RowVersion] = []
        self.tx_log: list[dict[str, Any]] = []
        # index: element id -> list of row indices (append order == tx order)
        self._v_index: dict[int, list[int]] = {}
        self._e_index: dict[int, list[int]] = {}
        # adjacency over *currently open* edges: vertex id -> set of edge ids
        self._out: dict[int, set[int]] = {}
        self._in: dict[int, set[int]] = {}
        self._next_id = 1
        self._next_tx = 1
        self.generation = 0
        # dataframe caches keyed by generation
        self._df_cache: dict[str, tuple[int, DataFrame]] = {}

    # -- id / tx allocation -------------------------------------------------

    def new_element_id(self) -> int:
        i = self._next_id
        self._next_id += 1
        return i

    def new_tx(self, tx_time: datetime.datetime) -> int:
        t = self._next_tx
        self._next_tx += 1
        self.generation += 1
        return t

    @property
    def max_tx(self) -> int:
        return self._next_tx - 1

    # -- row access ---------------------------------------------------------

    def _rows(self, kind: str) -> list[RowVersion]:
        return self.vertices if kind == M.VERTEX_KIND else self.edges

    def _index(self, kind: str) -> dict[int, list[int]]:
        return self._v_index if kind == M.VERTEX_KIND else self._e_index

    def history(self, kind: str, element_id: int) -> list[RowVersion]:
        rows = self._rows(kind)
        return [rows[i] for i in self._index(kind).get(element_id, [])]

    def version_at(self, kind: str, element_id: int, tx: Optional[int]) -> Optional[RowVersion]:
        """Visible version at snapshot ``tx`` (None = current)."""
        for row in reversed(self.history(kind, element_id)):
            if tx is None:
                if row["tx_to"] is None:
                    return row
                return None  # newest row closed => deleted
            if row["tx_from"] <= tx and (row["tx_to"] is None or row["tx_to"] > tx):
                return row
        return None

    def append_version(self, kind: str, row: RowVersion) -> None:
        rows = self._rows(kind)
        self._index(kind).setdefault(row["id"], []).append(len(rows))
        rows.append(row)
        if kind == M.EDGE_KIND:
            self._out.setdefault(row["src"], set()).add(row["id"])
            self._in.setdefault(row["dst"], set()).add(row["id"])

    def close_version(self, kind: str, element_id: int, tx: int) -> Optional[RowVersion]:
        row = self.version_at(kind, element_id, None)
        if row is not None:
            row["tx_to"] = tx
        return row

    def retire_edge(self, edge_row: RowVersion) -> None:
        self._out.get(edge_row["src"], set()).discard(edge_row["id"])
        self._in.get(edge_row["dst"], set()).discard(edge_row["id"])

    def log_tx(
        self,
        tx_id: int,
        tx_time: datetime.datetime,
        element_id: int,
        prev_tx_id: Optional[int],
        kind: str,
    ) -> None:
        self.tx_log.append(
            {
                "tx_id": tx_id,
                "tx_time": tx_time,
                "element_id": element_id,
                "prev_tx_id": prev_tx_id,
                "kind": kind,
            }
        )

    # -- adjacency (current snapshot only; historical reads go via rows) ----

    def out_edge_ids(self, vertex_id: int) -> set[int]:
        return self._out.get(vertex_id, set())

    def in_edge_ids(self, vertex_id: int) -> set[int]:
        return self._in.get(vertex_id, set())

    # -- iteration ----------------------------------------------------------

    def iter_visible(self, kind: str, tx: Optional[int]) -> Iterator[RowVersion]:
        seen: set[int] = set()
        for row in self._rows(kind):
            if row["id"] in seen:
                continue
            vis = self.version_at(kind, row["id"], tx)
            if vis is not None:
                seen.add(row["id"])
                yield vis

    # -- property columns ---------------------------------------------------

    def prop_columns(self, kind: str) -> list[str]:
        cols: dict[str, None] = {}
        for row in self._rows(kind):
            for c in row["props"]:
                cols[c] = None
        return sorted(cols)

    # -- DataFrame materialization ------------------------------------------

    def to_dataframe(self, spark: SparkSession, kind: str) -> DataFrame:
        cached = self._df_cache.get(kind)
        if cached is not None and cached[0] == self.generation:
            return cached[1]
        props = self.prop_columns(kind)
        if kind == M.VERTEX_KIND:
            schema = M.vertex_schema(props)
            base = (M.ID, M.TX_FROM, M.TX_TO)
        else:
            schema = M.edge_schema(props)
            base = (M.ID, M.SRC, M.DST, M.LABEL, M.TX_FROM, M.TX_TO)
        data = [
            tuple(row[b] for b in base) + tuple(row["props"].get(c) for c in props)
            for row in self._rows(kind)
        ]
        df = spark.createDataFrame(data, schema=schema)
        self._df_cache[kind] = (self.generation, df)
        return df

    def tx_log_dataframe(self, spark: SparkSession) -> DataFrame:
        cached = self._df_cache.get("tx_log")
        if cached is not None and cached[0] == self.generation:
            return cached[1]
        data = [
            (r["tx_id"], r["tx_time"], r["element_id"], r["prev_tx_id"], r["kind"])
            for r in self.tx_log
        ]
        df = spark.createDataFrame(data, schema=M.TX_LOG_SCHEMA)
        self._df_cache["tx_log"] = (self.generation, df)
        return df
