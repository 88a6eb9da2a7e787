"""Local stand-in for the driver's t2 gate: run every queries() entry in
Spark AND its oracle_sql() in DuckDB on the same sf dir; compare row
count, sorted column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [--parallel N] [query ...]

``--parallel N`` (r12, VERDICT item 7) runs N queries at a time as
threads over ONE SparkSession (Spark schedules concurrent actions from
multiple threads fine; each worker compares through its own DuckDB
cursor).  The full 190-entry registry at sf0.001 runs in minutes
instead of the serial tens — so a round can re-verify the WHOLE
registry, not a sample, in one sitting.  Safe because no registry
query mutates shared session state the others read: none touch the
graph `.sql()` temp views, the staging/session-index caches are
build-once-idempotent (a concurrent double build wastes work, never
changes a result), and the one conf toggle (bucketed reads) only
affects physical plans, never values.  Default N=1 preserves the
serial behavior and per-query output order.
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB result types that survive a pandas/arrow round-trip with the
# same python-value rendering Spark produces (int64/float64/str/bool/ts)
SAFE_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT",
    "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def norm_cell(v):
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def check_one(name, fn, spark, sf_dir, oracles, cursor):
    """Run one query in Spark + its oracle in DuckDB and compare.
    Returns (failed: bool, lines: list[str])."""
    lines = []
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        s_rows = sdf.collect()
        s_cols = sdf.columns
    except Exception as ex:  # noqa: BLE001
        lines.append(
            f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:160]}"
        )
        return True, lines
    if name not in oracles:
        lines.append(
            f"rows-only  {name}: {len(s_rows)} rows  ({time.time()-t0:.1f}s)"
        )
        return False, lines
    try:
        rel = cursor.sql(oracles[name])
        d_cols = list(rel.columns)
        # the driver fetches through pandas/arrow, where DuckDB's
        # HUGEINT/DECIMAL/FLOAT become float64/decimal128 and stop
        # hash-matching Spark's int64/double even on equal values —
        # fail fast on any unsafe output type (round-1 lesson)
        unsafe = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in SAFE_DUCK_TYPES
        ]
        if unsafe:
            lines.append(f"FAIL  {name}: unsafe duckdb result types {unsafe}")
            return True, lines
        d_rows = rel.fetchall()
    except Exception as ex:  # noqa: BLE001
        lines.append(f"FAIL  {name}: duckdb error {str(ex)[:160]}")
        return True, lines
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_count = len(s_rows) == len(d_rows)
    sh = value_hash(s_cols, [[r[c] for c in s_cols] for r in s_rows])
    dh = value_hash(d_cols, d_rows)
    ok_hash = sh == dh
    failed = not (ok_cols and ok_count and ok_hash)
    status = "FAIL " if failed else "OK   "
    lines.append(
        f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} "
        f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
        f"({time.time()-t0:.1f}s)"
    )
    if not ok_cols:
        lines.append(
            f"       spark cols: {sorted(s_cols)}\n"
            f"       duck  cols: {sorted(d_cols)}"
        )
    if ok_cols and ok_count and not ok_hash and len(s_rows) <= 20000:
        s_set = {tuple(norm_cell(r[c]) for c in sorted(s_cols)) for r in s_rows}
        order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        d_set = {tuple(norm_cell(r[i]) for i in order) for r in d_rows}
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        lines.append(f"       only-spark: {only_s}\n       only-duck : {only_d}")
    return failed, lines


def main():
    args = list(sys.argv[1:])
    parallel = 1
    if "--parallel" in args:
        i = args.index("--parallel")
        parallel = max(1, int(args[i + 1]))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs if not only or n in only]
    failures = []
    t_all = time.time()
    if parallel == 1:
        for name in names:
            failed, lines = check_one(name, qs[name], spark, sf_dir, oracles, con)
            print("\n".join(lines))
            if failed:
                failures.append(name)
    else:
        from concurrent.futures import ThreadPoolExecutor

        def task(name):
            # one DuckDB cursor per worker task — connections aren't
            # thread-safe, cursors off one connection are
            return name, check_one(
                name, qs[name], spark, sf_dir, oracles, con.cursor()
            )

        with ThreadPoolExecutor(max_workers=parallel) as pool:
            for name, (failed, lines) in pool.map(task, names):
                print("\n".join(lines), flush=True)
                if failed:
                    failures.append(name)
    print(
        f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}"
        f"  ({len(names)} queries, {time.time()-t_all:.0f}s, parallel={parallel})"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
