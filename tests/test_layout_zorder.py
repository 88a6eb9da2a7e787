"""Z-order clustered writes (plans/layout.zorder_write): the skipping
property — per-file parquet min-max stats form tight boxes on EVERY
clustered column, so multi-column box predicates skip most files —
plus Morton-key correctness and result layout-independence."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.plans.layout import morton_col, zorder_write


def _files_intersecting(path, box):
    """(n_intersecting, n_files) by parquet footer stats: a file can be
    SKIPPED when any predicate column's [min, max] misses its range —
    exactly the reasoning Spark's parquet reader applies per row group
    (each file here holds one row group at these sizes)."""
    hit, total = 0, 0
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo, hi = {}, {}
        for rg in range(md.num_row_groups):
            for i, name in enumerate(names):
                st = md.row_group(rg).column(i).statistics
                lo[name] = min(lo.get(name, st.min), st.min)
                hi[name] = max(hi.get(name, st.max), st.max)
        total += 1
        if all(lo[c] <= b_hi and hi[c] >= b_lo for c, (b_lo, b_hi) in box.items()):
            hit += 1
    return hit, total


def test_morton_interleave_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(morton_col([F.col("a"), F.col("b")], bits=3).alias("z"))
    # a-bits at even positions, b-bits at odd: a=101, b=011
    # -> z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert z.collect()[0]["z"] == 0b011011


def test_zorder_write_skips_multi_column_boxes(spark, tmp_path):
    """On a 64x64 grid split into 16 files: a one-column sort only
    skips for ITS column, the Z-order layout skips for both."""
    rows = [(u, s, u * 64 + s) for u in range(64) for s in range(64)]
    df = spark.createDataFrame(rows, "u long, s long, v long")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_write(df, zdir, ["u", "s"], bits=8, n_files=16)
    (
        df.repartitionByRange(16, F.col("s"))
        .sortWithinPartitions("s")
        .write.parquet(ldir)
    )

    # u-band, s unrestricted: the s-sorted layout cannot skip at all
    z_hit, z_total = _files_intersecting(zdir, {"u": (8, 15)})
    l_hit, l_total = _files_intersecting(ldir, {"u": (8, 15)})
    assert l_hit == l_total == 16  # every file spans all of u
    assert z_total == 16 and z_hit <= 6, z_hit

    # 2-D box: z-files are boxes in (u, s), so few intersect
    z2, _ = _files_intersecting(zdir, {"u": (8, 15), "s": (8, 15)})
    assert z2 <= 3, z2

    # layout independence: same rows back through the box predicate
    want = sorted(
        r["v"] for r in df.where(
            F.col("u").between(8, 15) & F.col("s").between(8, 15)
        ).collect()
    )
    got = sorted(
        r["v"] for r in spark.read.parquet(zdir).where(
            F.col("u").between(8, 15) & F.col("s").between(8, 15)
        ).collect()
    )
    assert got == want and len(want) == 64


def test_zorder_write_rejects_empty_cols(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="at least one column"):
        zorder_write(df, str(tmp_path / "x"), [])


def test_morton_sign_bit_guard(spark, tmp_path):
    """bits x dims past 63 would put coordinates into the long sign bit
    and silently invert the clustering order — rejected loudly."""
    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="sign bit"):
        zorder_write(df, str(tmp_path / "x"), ["a", "b", "c", "d"])  # 16*4
    zorder_write(df, str(tmp_path / "ok"), ["a", "b", "c", "d"], bits=15)
    assert spark.read.parquet(str(tmp_path / "ok")).count() == 1


def test_zorder_write_empty_input(spark, tmp_path):
    """Zero matching rows: the (empty) table still writes and reads
    back instead of dying in the min/max scaler."""
    df = spark.createDataFrame([], "a long, b long")
    zorder_write(df, str(tmp_path / "e"), ["a", "b"])
    out = spark.read.parquet(str(tmp_path / "e"))
    assert out.count() == 0 and set(out.columns) == {"a", "b"}


# ---------------------------------------------------------------- hilbert

def _xy2d_ref(bits, x, y):
    """Pure-python reference of the classic xy2d recurrence (emit the
    quadrant digit top bit down, then rotate/reflect the lower bits)."""
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
    return d


def test_hilbert_key_matches_reference(spark):
    """The projection-chain key equals the classic xy2d recurrence on a
    full 16x16 grid (bijectivity + unit-step continuity follow)."""
    from fluxgraph_spark.plans.layout import hilbert_key_frame

    bits, n = 4, 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    out = hilbert_key_frame(df, [F.col("x"), F.col("y")], bits=bits, out="h")
    got = {(r["x"], r["y"]): r["h"] for r in out.collect()}
    want = {(x, y): _xy2d_ref(bits, x, y) for x in range(n) for y in range(n)}
    assert got == want
    # unit-step continuity (the property Morton lacks): consecutive curve
    # positions are Manhattan-adjacent lattice points
    byd = {d: xy for xy, d in got.items()}
    steps = [
        abs(byd[d][0] - byd[d + 1][0]) + abs(byd[d][1] - byd[d + 1][1])
        for d in range(n * n - 1)
    ]
    assert set(steps) == {1}


def test_hilbert_write_skips_boxes_no_worse_than_morton(spark, tmp_path):
    """Same 64x64 grid / 16 files as the Z-order test: the Hilbert
    layout skips 2-D boxes at least as well as Morton (unit-step
    locality => contiguous key ranges decompose into tighter boxes),
    and results stay layout-independent."""
    from fluxgraph_spark.plans.layout import hilbert_write

    rows = [(u, s, u * 64 + s) for u in range(64) for s in range(64)]
    df = spark.createDataFrame(rows, "u long, s long, v long")
    hdir, zdir = str(tmp_path / "h"), str(tmp_path / "z")
    hilbert_write(df, hdir, ["u", "s"], bits=8, n_files=16)
    zorder_write(df, zdir, ["u", "s"], bits=8, n_files=16)

    boxes = [
        {"u": (8, 15), "s": (8, 15)},
        {"u": (0, 7), "s": (48, 63)},
        {"u": (30, 40), "s": (30, 40)},
    ]
    h_total = sum(_files_intersecting(hdir, b)[0] for b in boxes)
    z_total = sum(_files_intersecting(zdir, b)[0] for b in boxes)
    assert h_total <= z_total, (h_total, z_total)
    # every box touches only a corner of the grid: far under all 16 files
    assert _files_intersecting(hdir, boxes[0])[0] <= 3

    want = sorted(
        r["v"]
        for r in df.where(
            F.col("u").between(8, 15) & F.col("s").between(8, 15)
        ).collect()
    )
    got = sorted(
        r["v"]
        for r in spark.read.parquet(hdir).where(
            F.col("u").between(8, 15) & F.col("s").between(8, 15)
        ).collect()
    )
    assert got == want and len(want) == 64


def test_hilbert_write_rejects_non_2d(spark, tmp_path):
    from fluxgraph_spark.plans.layout import hilbert_write

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_write(df, str(tmp_path / "x"), ["a", "b", "c"])


def test_hilbert_write_empty_input(spark, tmp_path):
    from fluxgraph_spark.plans.layout import hilbert_write

    df = spark.createDataFrame([], "a long, b long")
    hilbert_write(df, str(tmp_path / "e"), ["a", "b"])
    out = spark.read.parquet(str(tmp_path / "e"))
    assert out.count() == 0 and set(out.columns) == {"a", "b"}
