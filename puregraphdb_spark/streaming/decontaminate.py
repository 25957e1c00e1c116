"""Streaming decontamination — the ingest-time half of the
contamination-check family (batch counterparts: q66 and
operators/text.contamination_report).

A training corpus is assembled as a stream; docs that share too many
word n-grams with a benchmark set must never reach the sink. The
benchmark side is BOUNDED by contract (eval sets are small), so the
check can be fully STATELESS: the distinct benchmark grams collapse to
a single array row, the stream cross-joins that one broadcast row, and
the per-doc overlap is a map-side ``array_intersect`` — no streaming
aggregation, no state store, append-mode safe at any stream volume.

At 100 TB of stream this is the right shape precisely because state is
zero: every micro-batch filters independently against the same
broadcast grams; scaling is linear in stream partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from puregraphdb_spark.operators.text import word_ngrams


def benchmark_gram_row(benchmark: DataFrame, n: int = 5,
                       text_col: str = "text") -> DataFrame:
    """Collapse a (bounded) benchmark table to ONE row holding its
    distinct word n-gram array — the static side of the stream-static
    join. Sorted so the array is deterministic."""
    return (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
        .agg(F.sort_array(F.collect_list("gram")).alias("bench_grams"))
    )


def decontaminate_stream(docs: DataFrame, bench_grams: DataFrame,
                         n: int = 5, max_ratio: float = 0.1,
                         text_col: str = "text") -> DataFrame:
    """Pass through only docs whose benchmark n-gram overlap ratio is
    below ``max_ratio``; annotates survivors with (n_ngrams,
    n_matched). Docs with fewer than n tokens have no n-grams and
    always pass (ratio 0 by definition).

    Works identically on a streaming or batch ``docs`` frame — the
    equivalence test drains the stream and compares against the batch
    run bit-for-bit.
    """
    ng = word_ngrams(text_col, n)
    staged = docs.crossJoin(F.broadcast(bench_grams)).withColumn(
        "n_matched",
        F.size(F.array_intersect(ng, F.col("bench_grams"))).cast("long"),
    ).withColumn("n_ngrams", F.size(ng).cast("long"))
    return (
        staged.filter(
            (F.col("n_ngrams") == 0)
            | (
                F.col("n_matched").cast("double")
                < F.lit(max_ratio) * F.col("n_ngrams").cast("double")
            )
        )
        .drop("bench_grams")
    )
