"""Z-order write layout: the measurable clustering property.

A plain x-sorted write gives each file a narrow x span and a FULL y
span (slabs). The Z-ordered write must give BOTH columns sub-linear
per-file spans (tiles) — that per-file footprint is exactly what
parquet min/max file pruning consumes. Plus a content round-trip.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from puregraphdb_spark.sources.layout import morton_code, write_zordered


def _per_file_spans(spark, path, cols):
    """Mean normalized (max-min)/range per parquet file, per column."""
    spans = {c: [] for c in cols}
    full = spark.read.parquet(path)
    rng = {c: (full.agg(F.min(c)).collect()[0][0],
               full.agg(F.max(c)).collect()[0][0]) for c in cols}
    for f in glob.glob(f"{path}/part-*.parquet"):
        pf = spark.read.parquet(f)
        row = pf.agg(*[x for c in cols for x in
                       (F.min(c).alias(f"mn_{c}"),
                        F.max(c).alias(f"mx_{c}"))]).collect()[0]
        for c in cols:
            lo, hi = rng[c]
            spans[c].append((row[f"mx_{c}"] - row[f"mn_{c}"]) / (hi - lo))
    return {c: sum(v) / len(v) for c, v in spans.items()}, spans


def test_zorder_tiles_both_columns(spark, tmp_path):
    # independent uniform grid: 256x256 points
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    # naive comparison layout: sorted by x only
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.parquet(spath)

    zmean, _ = _per_file_spans(spark, zpath, ["x", "y"])
    smean, _ = _per_file_spans(spark, spath, ["x", "y"])
    # x-sorted slabs: x tight, y spans ~everything
    assert smean["x"] < 0.15
    assert smean["y"] > 0.9
    # z-order tiles: BOTH columns well under the slab's full span
    # (16 files on a 2-D curve -> ~1/4 per dimension)
    assert zmean["x"] < 0.6 and zmean["y"] < 0.6, (zmean, smean)
    # content round-trip
    assert spark.read.parquet(zpath).count() == 256 * 256
    got = spark.read.parquet(zpath).agg(
        F.sum("x"), F.sum("y")).collect()[0]
    want = df.agg(F.sum("x"), F.sum("y")).collect()[0]
    assert tuple(got) == tuple(want)


def test_morton_code_hand_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)],
                               ["x", "y"])
    out = df.select(
        "x", "y",
        morton_code([F.col("x"), F.col("y")], bits=4).alias("m"),
    ).collect()
    got = {(r.x, r.y): r.m for r in out}
    # interleave: x bit b -> position 2b, y bit b -> position 2b+1
    # (3,5) = x 0011, y 0101 -> bits: p0=1,p1=1,p2=1,p3=0,p4=0,p5=1 -> 0b100111 = 39
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 5): 39}


def test_morton_code_rejects_bad_args(spark):
    import pytest

    with pytest.raises(ValueError):
        morton_code([], bits=16)
    with pytest.raises(ValueError):
        morton_code([F.lit(1)] * 4, bits=16)  # 64 bits > signed long


def test_zorder_actually_skips_files_for_either_column(spark, tmp_path):
    """The pruning property stated as the engine consumes it: for a
    selective range filter on EITHER clustered column, count the
    files whose parquet footer (min, max) excludes the range — the
    exact file-skipping decision a stats-based reader makes. Z-order
    must skip files for both columns; the x-sorted slab layout skips
    only for x."""
    import pyarrow.parquet as pq

    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    zpath, spath = str(tmp_path / "z2"), str(tmp_path / "s2")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.parquet(spath)

    def skipped(path, col, lo, hi):
        total, skip = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            total += 1
            if mx < lo or mn > hi:
                skip += 1
        return skip, total

    # a 1/8th range on each dimension
    for col in ("x", "y"):
        zs, zt = skipped(zpath, col, 0, 31)
        assert zs >= zt // 2, (col, zs, zt)  # z-order: most files skip
    ss_x, st = skipped(spath, "x", 0, 31)
    ss_y, _ = skipped(spath, "y", 0, 31)
    assert ss_x >= st // 2      # slabs skip on the sort column...
    assert ss_y == 0            # ...and NEVER on the other one


def test_zorder_nulls_keep_clustering_on_other_columns(spark, tmp_path):
    """ADVICE r7: a NULL in one clustered column must not void the
    Morton code — null rows map to that column's min rank and still
    cluster on the remaining dimensions. Files must still prune on
    the non-null column, and no row may be lost."""
    import pyarrow.parquet as pq

    df = spark.range(64 * 64).select(
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "znull")
    write_zordered(df, zpath, ["x", "y"], n_files=8)
    assert spark.read.parquet(zpath).count() == 64 * 64  # nothing lost

    total, skip = 0, 0
    for f in glob.glob(f"{zpath}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("y")
        mn = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        total += 1
        if mx < 0 or mn > 7:  # selective range on y: 1/8th
            skip += 1
    assert skip >= total // 2, (skip, total)


def test_zorder_3d_prunes_on_every_column(spark, tmp_path):
    """3-D Z-order (VERDICT r7 item 5): a selective filter on ANY of
    the three clustered columns must skip files; an x-sorted slab
    layout only prunes on x."""
    import pyarrow.parquet as pq

    df = spark.range(32 * 32 * 32).select(
        (F.col("id") % 32).alias("x"),
        ((F.col("id") / 32).cast("long") % 32).alias("y"),
        (F.col("id") / (32 * 32)).cast("long").alias("z"),
    )
    zpath = str(tmp_path / "z3")
    write_zordered(df, zpath, ["x", "y", "z"], n_files=16)

    def skipped(col, lo, hi):
        total, skip = 0, 0
        for f in glob.glob(f"{zpath}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            total += 1
            if mx < lo or mn > hi:
                skip += 1
        return skip, total

    # 1/4 range on each of the three dimensions: with 16 files over a
    # 32^3 cube the curve gives ~2 bits per dim, so at least a quarter
    # of the files must prune on every axis.
    for col in ("x", "y", "z"):
        s, t = skipped(col, 0, 7)
        assert s >= t // 4, (col, s, t)
