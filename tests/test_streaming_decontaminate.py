"""Streaming decontamination: a doc stream filtered against a static
benchmark-gram broadcast must (a) equal the batch run of the same
operator bit-for-bit, and (b) actually drop the contaminated docs
(benchmark members contaminate themselves at ratio 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.decontaminate import (
    benchmark_gram_row, decontaminate_stream,
)
from tests.conftest import SF_DIR


def _drain(df, name: str):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_stream_matches_batch_and_drops_contaminated(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text")
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    n_bench = bench.count()
    assert n_bench > 0
    grams = benchmark_gram_row(bench, n=5)

    batch = decontaminate_stream(
        spark.read.parquet(path), grams, n=5, max_ratio=0.5)

    raw = spark.read.parquet(path)
    stream = sw.read_parquet_stream(spark, path, raw.schema)
    got = _drain(
        decontaminate_stream(stream, grams, n=5, max_ratio=0.5),
        "t_decontam",
    )

    # stream ≡ batch (same rows, same annotations)
    assert (
        got.exceptAll(batch).count() == 0
        and batch.exceptAll(got).count() == 0
    )
    # benchmark members self-contaminate at ratio 1.0 → all dropped.
    # Token counting mirrors word_ngrams' tokenization (\s+ split,
    # empties dropped) so docs with doubled/trailing whitespace and
    # < 5 real tokens aren't spuriously expected to be dropped
    # (ADVICE r5).
    kept_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    bench_with_grams = {
        r["doc_id"]
        for r in bench.filter(
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda t: t != ""
                )
            ) >= 5
        ).collect()
    }
    assert not (kept_ids & bench_with_grams)
    # non-benchmark docs with no verbatim 5-gram overlap survive
    assert len(kept_ids) > 0


def test_short_docs_always_pass(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d"), (3, "one two three four five")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(9, "one two three four five")], ["doc_id", "text"])
    out = decontaminate_stream(
        docs, benchmark_gram_row(bench, n=5), n=5, max_ratio=0.1
    )
    rows = {r["doc_id"]: (r["n_ngrams"], r["n_matched"])
            for r in out.collect()}
    # docs 1 and 2 have < 5 tokens → 0 n-grams → pass by definition
    assert set(rows) == {1, 2}
    assert rows[1] == (0, 0) and rows[2] == (0, 0)
