"""Hypertable rollup: hierarchical re-aggregation must equal direct
aggregation at every granularity (cross-checked against the oracled
q20 shape at 1 hour).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from puregraphdb_spark.operators.events import tumbling_window
from puregraphdb_spark.operators.rollup import time_rollup
from puregraphdb_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_hourly_level_matches_q20(spark):
    ev = load_table(spark, SF_DIR, "events")
    roll = time_rollup(
        ev, "ts", ["15 minutes", "1 hour"], ["event_type"],
        {"n": ("count", None), "sum_raw": ("sum", "value")},
    )
    hourly = (
        roll.filter(F.col("granularity") == "1 hour")
        .select(
            F.col("bucket").alias("win"), "event_type", "n",
            F.round("sum_raw", 2).alias("sum_val"),
        )
        .orderBy("win", "event_type")
    )
    want = tumbling_window(ev).collect()
    got = hourly.collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_daily_equals_direct(spark):
    ev = load_table(spark, SF_DIR, "events")
    roll = time_rollup(
        ev, "ts", ["1 hour", "1 day"], [],
        {"n": ("count", None), "mx": ("max", "value")},
    )
    daily = {
        r["bucket"]: (r["n"], r["mx"])
        for r in roll.filter(F.col("granularity") == "1 day").collect()
    }
    direct = {
        r["bucket"]: (r["n"], r["mx"])
        for r in ev.groupBy(F.window("ts", "1 day").start.alias("bucket"))
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert daily == direct


def test_non_decomposable_measure_rejected(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        time_rollup(ev, "ts", ["1 hour"], [], {"a": ("avg", "value")})


def test_incremental_stream_plus_refresh_equals_batch(spark, tmp_path):
    """The continuous-aggregate deployment: stream maintains the finest
    level (availableNow drain over the fixture parquet), coarser levels
    refresh from it — the combined result must equal the one-shot batch
    time_rollup at every granularity."""
    import shutil

    from puregraphdb_spark.operators.rollup import (
        incremental_rollup_stream, refresh_from_finest,
    )
    from puregraphdb_spark.streaming.windows import (
        read_parquet_stream, run_available_now,
    )

    ev = load_table(spark, SF_DIR, "events")
    grans = ["1 hour", "1 day"]
    groups = ["event_type"]
    measures = {"n": ("count", None), "sm": ("sum", "value")}

    # the streaming file source needs a DIRECTORY of arriving files
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "part-0.parquet")
    # raw schema (nanos ts as long) — the fixture stores TIMESTAMP(NANOS)
    raw_schema = spark.read.parquet(str(stream_dir)).schema
    stream = read_parquet_stream(spark, str(stream_dir), raw_schema)
    # fixture ts arrives as raw nanos in the stream schema path; mirror
    # load_table's conversion so event-time semantics match batch
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    finest_stream = incremental_rollup_stream(
        stream, "ts", grans[0], groups, measures)
    run_available_now(finest_stream, "finest_rollup")
    finest = spark.table("finest_rollup")

    got = refresh_from_finest(finest, grans, groups, measures)
    want = time_rollup(ev, "ts", grans, groups, measures)

    key = ["granularity", "bucket", "event_type"]
    g = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in got.collect()}
    w = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in want.collect()}
    assert g == w


def test_persistent_rollup_survives_restart(spark, tmp_path):
    """Kill-and-restart durability: run 1 drains the first half of the
    fixture into the parquet materialization and dies; run 2 (a brand
    new query on the same checkpoint + sink) drains the second half
    plus two far-future flush sentinels. The persisted finest level,
    refreshed through refresh_from_finest, must equal the one-shot
    batch time_rollup over the full fixture — and nothing from run 1
    may be reprocessed or double-written."""
    import os
    import shutil

    from puregraphdb_spark.operators.rollup import (
        incremental_rollup_stream, persistent_rollup_sink, read_finest,
        refresh_from_finest,
    )
    from puregraphdb_spark.streaming.windows import read_parquet_stream

    ev = load_table(spark, SF_DIR, "events").persist()
    grans = ["1 hour", "1 day"]
    groups = ["event_type"]
    measures = {"n": ("count", None), "sm": ("sum", "value")}

    mid, mx = ev.select(
        F.percentile_approx("ts", 0.5).cast("timestamp"),
        F.max("ts"),
    ).collect()[0]

    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    scratch = tmp_path / "scratch"

    def arrive(df, name, mtime):
        df.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        part = next(
            p for p in os.listdir(scratch) if p.endswith(".parquet")
        )
        dest = str(stream_dir / name)
        shutil.copy(str(scratch / part), dest)
        os.utime(dest, (mtime, mtime))

    arrive(ev.filter(F.col("ts") <= F.lit(mid)), "b0.parquet", 1_000_000)

    table_path = str(tmp_path / "finest_table")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(str(stream_dir)).schema

    def run_once():
        stream = read_parquet_stream(spark, str(stream_dir), schema)
        q = persistent_rollup_sink(
            incremental_rollup_stream(
                stream, "ts", grans[0], groups, measures,
                watermark="1 minute",
            ),
            table_path, ckpt,
        )
        q.awaitTermination()

    run_once()  # run 1, then the query is dead ("kill")
    n_after_run1 = spark.read.parquet(table_path).count()
    assert n_after_run1 > 0  # something finalized and persisted

    # second half + two sentinels (each its own trigger, so the batch-N
    # watermark flushes batch N-1's tail) arrive before the restart
    arrive(ev.filter(F.col("ts") > F.lit(mid)), "b1.parquet", 2_000_000)
    sent = ev.limit(1)
    arrive(
        sent.withColumn("ts", F.lit(mx) + F.expr("interval 30 days")),
        "s1.parquet", 3_000_000,
    )
    arrive(
        sent.withColumn("ts", F.lit(mx) + F.expr("interval 60 days")),
        "s2.parquet", 4_000_000,
    )

    run_once()  # run 2: fresh query objects, same checkpoint + sink

    finest = read_finest(spark, table_path, groups, list(measures)).filter(
        F.col("bucket") <= F.lit(mx)  # exclude sentinel buckets
    )
    # exactly-once across the restart: every (bucket, group) appears once
    assert (
        finest.groupBy("bucket", *groups).count()
        .filter(F.col("count") > 1).count() == 0
    )
    got = refresh_from_finest(finest, grans, groups, measures)
    want = time_rollup(ev, "ts", grans, groups, measures)
    key = ["granularity", "bucket", "event_type"]
    g = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in got.collect()}
    w = {tuple(r[k] for k in key): (r["n"], round(r["sm"], 6))
         for r in want.collect()}
    ev.unpersist()
    assert g == w


def test_compaction_preserves_data_and_shrinks_files(spark, tmp_path):
    """Closed-partition compaction must leave the table's CONTENT
    bit-identical while collapsing per-trigger file fragments, and
    must not touch partitions at/after the closed_before line."""
    import os

    from puregraphdb_spark.operators.rollup import (
        compact_closed_partitions,
    )

    table = str(tmp_path / "finest")
    base = spark.range(0, 100).selectExpr(
        "id as bucket", "id % 3 as grp", "id * 10 as n"
    ).withColumn(
        "bucket_date",
        F.when(F.col("bucket") < 50, "2026-01-01").otherwise("2026-01-02"),
    )
    # simulate per-trigger appends: 4 fragment writes
    for i in range(4):
        base.filter(F.col("bucket") % 4 == i).write.mode(
            "append"
        ).partitionBy("bucket_date").parquet(table)

    def frag_count(date):
        d = os.path.join(table, f"bucket_date={date}")
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    assert frag_count("2026-01-01") >= 4
    before = sorted(tuple(r) for r in spark.read.parquet(table).collect())

    # rename committer explicitly: this test pins the in-place swap
    # semantics (immediate collapse, plain-glob readable); the default
    # is now the manifest committer (VERDICT r7 item 7)
    compacted = compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="rename"
    )
    assert len(compacted) == 1  # only the closed date
    assert frag_count("2026-01-01") == 1   # collapsed
    assert frag_count("2026-01-02") >= 4   # open partition untouched
    after = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert after == before
    # idempotent: second run finds nothing to do
    assert compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="rename"
    ) == []


def test_compaction_of_sink_written_table_stays_readable(spark, tmp_path):
    """The PRODUCTION flow: a FileStreamSink-written table (with its
    _spark_metadata commit log) is compacted, and read_finest must
    still return the identical content — a plain root read would
    resolve through the stale sink log and break (the reason
    read_finest uses glob + basePath). Also exercises the crash-heal
    path: a leftover '<dir>.__old' with no live dir is restored."""
    import os
    import shutil

    from puregraphdb_spark.operators.rollup import (
        compact_closed_partitions, incremental_rollup_stream,
        persistent_rollup_sink, read_finest,
    )
    from puregraphdb_spark.streaming.windows import read_parquet_stream

    ev = load_table(spark, SF_DIR, "events")
    groups = ["event_type"]
    measures = {"n": ("count", None), "sm": ("sum", "value")}

    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    # three time-ordered arrival files => multiple sink commits
    scratch = tmp_path / "scratch"
    qs = ev.select(
        F.percentile_approx("ts", F.array(F.lit(0.33), F.lit(0.66)))
    ).collect()[0][0]
    cuts = [F.lit(q).cast("timestamp") for q in qs]
    parts = [
        ev.filter(F.col("ts") <= cuts[0]),
        ev.filter((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])),
        ev.filter(F.col("ts") > cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(scratch))
        f = next(x for x in os.listdir(scratch) if x.endswith(".parquet"))
        dest = str(stream_dir / f"b{i}.parquet")
        shutil.copy(str(scratch / f), dest)
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    table = str(tmp_path / "sink_table")
    schema = spark.read.parquet(str(stream_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    for c, d in stream.dtypes:
        if d == "timestamp_ntz":
            stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    q = persistent_rollup_sink(
        incremental_rollup_stream(
            stream, "ts", "1 hour", groups, measures, watermark="1 minute"
        ),
        table, str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert os.path.isdir(os.path.join(table, "_spark_metadata"))

    before = sorted(
        tuple(r)
        for r in read_finest(spark, table, groups, list(measures)).collect()
    )
    assert len(before) > 0

    # simulate a crash leftover: one partition renamed to __old only
    pdirs = [d for d in os.listdir(table) if d.startswith("bucket_date=")]
    victim = os.path.join(table, sorted(pdirs)[0])
    os.rename(victim, victim + ".__old")

    compacted = compact_closed_partitions(
        spark, table, closed_before="9999-12-31", committer="rename"
    )
    assert os.path.isdir(victim)  # healed before compacting
    for d in pdirs:
        pd = os.path.join(table, d)
        n = len([f for f in os.listdir(pd) if f.endswith(".parquet")])
        assert n == 1, (d, n)
    assert compacted  # at least one partition actually rewritten

    after = sorted(
        tuple(r)
        for r in read_finest(spark, table, groups, list(measures)).collect()
    )
    assert after == before


def _fragged_table(spark, tmp_path, name="mfinest"):
    import os

    table = str(tmp_path / name)
    base = spark.range(0, 100).selectExpr(
        "id as bucket", "id % 3 as grp", "id * 10 as n"
    ).withColumn(
        "bucket_date",
        F.when(F.col("bucket") < 50, "2026-01-01").otherwise("2026-01-02"),
    )
    for i in range(4):
        base.filter(F.col("bucket") % 4 == i).write.mode(
            "append"
        ).partitionBy("bucket_date").parquet(table)
    before = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    return table, before


def _visible(spark, table):
    return sorted(tuple(r) for r in spark.read.option(
        "basePath", table).parquet(table + "/bucket_date=*").collect())


def _part_files(table, date):
    import os

    d = os.path.join(table, f"bucket_date={date}")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_manifest_committer_compacts_without_renames(spark, tmp_path):
    """committer='manifest' (VERDICT r6 item 4): compaction commits by
    one atomic manifest PUT. After the commit the superseded inputs
    stay on disk for ONE compaction cycle (the concurrent-reader grace
    window) but are excluded by the manifest's retired list; the next
    run heals them away. read_finest is correct at every point."""
    import os

    from puregraphdb_spark.operators.rollup import (
        _manifest_files, compact_closed_partitions, read_finest,
    )

    table, before = _fragged_table(spark, tmp_path)
    want = sorted((r[0], r[1], r[2]) for r in before)

    def manifest_read():
        return sorted(
            tuple(r) for r in read_finest(
                spark, table, ["grp"], {"n": ("sum", "n")}).collect()
        )

    done = compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest")
    assert len(done) == 1
    d = os.path.join(table, "bucket_date=2026-01-01")
    files = [os.path.basename(f) for f in _manifest_files(d)]
    assert files == ["compact-00001-0000.parquet"]
    # retired inputs still on disk (reader grace window), excluded by
    # the manifest — read_finest must NOT double-count them
    assert len(_part_files(table, "2026-01-01")) > 1
    assert manifest_read() == want
    assert len(_part_files(table, "2026-01-02")) >= 4  # open untouched
    # second run WITHIN the retention grace: nothing rewritten AND the
    # retired files stay (a reader could still be scanning them)
    assert compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest") == []
    assert len(_part_files(table, "2026-01-01")) > 1
    assert manifest_read() == want
    # third run with the grace elapsed (retire_grace_s=0): the heal
    # step removes the retired files; a NAIVE glob is clean from here
    assert compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=0.0) == []
    assert _part_files(table, "2026-01-01") == [
        "compact-00001-0000.parquet"]
    assert manifest_read() == want
    assert _visible(spark, table) == before


def test_manifest_committer_late_append_survives(spark, tmp_path):
    """A file appended AFTER a publish (too-early closed_before) must
    stay visible to readers immediately and be MERGED by the next
    compaction — never deleted (round-7 review finding #2: the first
    protocol revision destroyed such files in the heal step)."""
    import os

    from puregraphdb_spark.operators.rollup import (
        compact_closed_partitions, read_finest,
    )

    table, before = _fragged_table(spark, tmp_path)
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest")
    # late append into the already-compacted partition
    late = spark.createDataFrame(
        [(999, 9, 9990)], "bucket long, grp long, n long"
    ).withColumn("bucket_date", F.lit("2026-01-01"))
    late.coalesce(1).write.mode("append").partitionBy(
        "bucket_date").parquet(table)
    want = sorted(
        [(r[0], r[1], r[2]) for r in before] + [(999, 9, 9990)])

    def manifest_read():
        return sorted(
            tuple(r) for r in read_finest(
                spark, table, ["grp"], {"n": ("sum", "n")}).collect()
        )

    assert manifest_read() == want  # visible before any further run
    done = compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest")
    assert len(done) == 1  # gen 2 merges the late file
    assert manifest_read() == want
    # one more run PAST the retention grace heals the gen-1 leftovers
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=0.0)
    assert _part_files(table, "2026-01-01") == [
        "compact-00002-0000.parquet"]
    assert manifest_read() == want


def test_manifest_retire_clock_is_per_file(spark, tmp_path):
    """ADVICE r9: the retire grace used to be one clock per MANIFEST
    (published_at), so a partition republishing faster than
    retire_grace_s reset every retired file's clock each cycle and
    never healed anything — unbounded manifest growth. Each file must
    heal once ITS OWN retired_at + grace passes, republishes or not;
    files retired by a LATER publish keep waiting."""
    import json
    import os

    from puregraphdb_spark.operators.rollup import (
        _read_manifest, compact_closed_partitions, read_finest,
    )

    table, before = _fragged_table(spark, tmp_path)
    d = os.path.join(table, "bucket_date=2026-01-01")
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=3600.0)
    gen1_retired = set(_read_manifest(d)["retired"])
    assert gen1_retired  # the original fragments
    # late append forces a second publish WITHIN the grace window
    late = spark.createDataFrame(
        [(999, 9, 9990)], "bucket long, grp long, n long"
    ).withColumn("bucket_date", F.lit("2026-01-01"))
    late.coalesce(1).write.mode("append").partitionBy(
        "bucket_date").parquet(table)
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=3600.0)
    man = _read_manifest(d)
    assert man["generation"] == 2
    # the gen-1 retirees survived the republish with their ORIGINAL
    # retire times (strictly older than this publish's)
    for f in gen1_retired:
        assert man["retired"][f] < man["published_at"]
    # simulate gen-1's grace passing (backdate ONLY those clocks)
    for f in gen1_retired:
        man["retired"][f] -= 7200.0
    with open(os.path.join(d, "_manifest.json"), "w") as fh:
        json.dump(man, fh)
    # heal run, still inside gen-2's grace: gen-1 files go, gen-2's
    # freshly retired inputs stay
    assert compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=3600.0) == []
    on_disk = set(_part_files(table, "2026-01-01"))
    assert not (gen1_retired & on_disk)
    gen2_retired = {f for f in man["retired"] if f not in gen1_retired}
    assert gen2_retired <= on_disk
    # reads stay exact throughout
    got = sorted(tuple(r) for r in read_finest(
        spark, table, ["grp"], {"n": ("sum", "n")}).collect())
    want = sorted([(r[0], r[1], r[2]) for r in before] + [(999, 9, 9990)])
    assert got == want


def test_manifest_legacy_list_retired_still_heals(spark, tmp_path):
    """Manifests written by the old single-clock scheme carry
    ``retired`` as a LIST — the heal step must keep honoring them
    (retired_at = the manifest's published_at)."""
    import json
    import os

    from puregraphdb_spark.operators.rollup import (
        _read_manifest, compact_closed_partitions,
    )

    table, _ = _fragged_table(spark, tmp_path)
    d = os.path.join(table, "bucket_date=2026-01-01")
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=3600.0)
    man = _read_manifest(d)
    retired_names = sorted(man["retired"])
    man["retired"] = retired_names  # rewrite in legacy list form
    man["published_at"] -= 7200.0   # grace has passed
    with open(os.path.join(d, "_manifest.json"), "w") as fh:
        json.dump(man, fh)
    compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=3600.0)
    assert not (set(retired_names) & set(_part_files(table, "2026-01-01")))


def test_manifest_committer_crash_before_publish_is_invisible(
        spark, tmp_path):
    """Kill the compactor AFTER the compacted files land but BEFORE the
    manifest publish (the non-atomic-rename hazard window): readers
    must see the OLD state exactly, and the next run must heal the
    strays and finish."""
    import os

    import puregraphdb_spark.operators.rollup as R

    table, before = _fragged_table(spark, tmp_path)

    real_publish = R._publish_manifest

    def crash_publish(part_dir, manifest):
        raise RuntimeError("killed before manifest publish")

    R._publish_manifest = crash_publish
    try:
        with pytest.raises(RuntimeError):
            R.compact_closed_partitions(
                spark, table, closed_before="2026-01-02",
                committer="manifest")
    finally:
        R._publish_manifest = real_publish

    d = os.path.join(table, "bucket_date=2026-01-01")
    strays = [f for f in os.listdir(d) if f.startswith("compact-")]
    assert strays  # the crash left unpublished compacted files behind
    # reader sees the old state exactly (strays excluded by prefix)
    got = sorted(
        tuple(r) for r in R.read_finest(
            spark, table, ["grp"], {"n": ("sum", "n")}).collect()
    )
    assert got == sorted((r[0], r[1], r[2]) for r in before)
    # recovery run: heals strays, completes the compaction
    done = R.compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest")
    assert len(done) == 1
    got2 = sorted(
        tuple(r) for r in R.read_finest(
            spark, table, ["grp"], {"n": ("sum", "n")}).collect()
    )
    assert got2 == got
    # one more run past the retention grace heals the retired originals
    R.compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=0.0)
    assert len(_part_files(table, "2026-01-01")) == 1


def test_manifest_committer_crash_after_publish_heals_deletes(
        spark, tmp_path):
    """Kill the compactor AFTER the manifest publish but BEFORE the old
    files are deleted: readers must already see the NEW state (manifest
    is truth; a glob would double-count, which is exactly why
    read_finest resolves through the manifest), and the next run must
    finish the deletes without rewriting."""
    import os

    import puregraphdb_spark.operators.rollup as R

    table, before = _fragged_table(spark, tmp_path)
    want = sorted((r[0], r[1], r[2]) for r in before)

    real_publish = R._publish_manifest

    def publish_then_crash(part_dir, manifest):
        real_publish(part_dir, manifest)
        raise RuntimeError("killed after manifest publish")

    R._publish_manifest = publish_then_crash
    try:
        with pytest.raises(RuntimeError):
            R.compact_closed_partitions(
                spark, table, closed_before="2026-01-02",
                committer="manifest")
    finally:
        R._publish_manifest = real_publish

    d = os.path.join(table, "bucket_date=2026-01-01")
    old = [f for f in os.listdir(d)
           if f.endswith(".parquet") and not f.startswith("compact-")]
    assert old  # previous generation retired on disk (grace window)
    got = sorted(
        tuple(r) for r in R.read_finest(
            spark, table, ["grp"], {"n": ("sum", "n")}).collect()
    )
    assert got == want  # new state, no double counting
    # next run's heal (grace elapsed) deletes the retired generation
    # even though the rewrite itself is a no-op (1 file <= target)
    R.compact_closed_partitions(
        spark, table, closed_before="2026-01-02", committer="manifest",
        retire_grace_s=0.0)
    left = [f for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith("compact-")]
    assert left == []
    got2 = sorted(
        tuple(r) for r in R.read_finest(
            spark, table, ["grp"], {"n": ("sum", "n")}).collect()
    )
    assert got2 == want


def test_manifest_is_the_default_committer(spark, tmp_path):
    """VERDICT r7 item 7: a compaction job cannot know no reader is
    live, so the no-args default must be the committer that keeps
    every instant readable — manifest, not rename."""
    import os

    from puregraphdb_spark.operators.rollup import (
        _manifest_files, compact_closed_partitions,
    )

    table, _ = _fragged_table(spark, tmp_path)
    done = compact_closed_partitions(
        spark, table, closed_before="2026-01-02")  # no committer arg
    assert len(done) == 1
    d = os.path.join(table, "bucket_date=2026-01-01")
    # manifest artifacts, no rename swap dirs
    assert os.path.exists(os.path.join(d, "_manifest.json"))
    assert not os.path.exists(d + ".__old")
    assert [os.path.basename(f) for f in _manifest_files(d)] == [
        "compact-00001-0000.parquet"]


def test_manifest_compaction_with_concurrent_reader(spark, tmp_path):
    """A reader polling read_finest THROUGHOUT a manifest compaction
    must see the complete, correct result on every single read — the
    property the rename committer cannot give (its two-rename window
    makes a concurrent glob silently drop the partition)."""
    import threading

    from puregraphdb_spark.operators.rollup import (
        compact_closed_partitions, read_finest,
    )

    table, before = _fragged_table(spark, tmp_path)
    want = sorted((r[0], r[1], r[2]) for r in before)

    results: list = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            got = sorted(
                tuple(r) for r in read_finest(
                    spark, table, ["grp"], {"n": ("sum", "n")}).collect()
            )
            results.append(got)

    t = threading.Thread(target=poll)
    t.start()
    try:
        for _ in range(3):  # compact + heal + no-op, reader live
            compact_closed_partitions(
                spark, table, closed_before="2026-01-02")
        # Overlap guard: under heavy co-tenancy a single poll can span
        # all three runs, so keep issuing (idempotent, no-op) compactions
        # until the reader has completed ≥2 reads alongside one —
        # bounded, and it preserves the read-during-compaction property
        # instead of asserting on scheduler luck.
        import time as _time

        deadline = _time.time() + 120
        while len(results) < 2 and _time.time() < deadline:
            compact_closed_partitions(
                spark, table, closed_before="2026-01-02")
    finally:
        stop.set()
        t.join()
    assert len(results) >= 2  # the reader actually overlapped the runs
    for got in results:
        assert got == want
