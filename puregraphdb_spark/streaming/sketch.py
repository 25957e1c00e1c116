"""Streaming heavy hitters: the stateful twin of
``operators.sketch.heavy_hitters`` — per-bucket Misra-Gries summaries
maintained in ``applyInPandasWithState`` state as values stream in.

Values hash into ``n_buckets`` groups (xxhash64 pmod — the shuffle
key), and each group folds its arrivals into the SAME ``mg_ingest``
core the batch sketch uses, with O(capacity) state per bucket
(bounded regardless of stream volume or key cardinality — the whole
point of the sketch). The guarantee is TIGHTER than the batch
sketch's: est(v) ≤ true(v) ≤ est(v) + err_b(v's own bucket), because
a value hashes to exactly ONE bucket — all of its mass lives in that
summary, so only that bucket's decrement total can have touched it
(the batch sketch must add every partition's error since any
partition may hold the value).

Emission contract: each trigger that changes a bucket re-emits that
bucket's FULL summary stamped with a monotonically increasing ``seq``
(update mode). A sink consumer must read ONLY each bucket's max-seq
emission — evicted counters from older emissions would otherwise
resurrect (``merged_heavy_hitters`` does this; re-emitting deltas
instead of snapshots cannot express eviction, the same append-mode
impossibility the A-ES reservoir documents).

Streaming ≡ batch: in the no-decrement regime (capacity ≥ distinct
values per bucket) the merged stream state equals the exact batch
counts after ANY trigger split; in the decremented regime the bounds
bracket the exact counts (arrival order legitimately changes est, so
exact stream≡batch equality is not claimed — the BOUNDS are the
contract). Both pinned in tests/test_streaming_sketch.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from puregraphdb_spark.operators.sketch import mg_ingest

SKETCH_SCHEMA = StructType([
    StructField("bucket", LongType(), False),
    StructField("seq", LongType(), False),
    StructField("value", StringType(), True),   # NULL = the err row
    StructField("est", LongType(), False),
    StructField("err", LongType(), False),
])

SKETCH_STATE_SCHEMA = StructType([
    StructField("values", ArrayType(StringType()), True),
    StructField("counts", ArrayType(LongType()), True),
    StructField("err", LongType(), True),
    StructField("seq", LongType(), True),
])


def heavy_hitters_stateful(stream: DataFrame, col: str,
                           capacity: int = 64,
                           n_buckets: int = 32) -> DataFrame:
    """Maintain per-bucket MG summaries over a streaming DataFrame.

    Returns the update-mode stream of SKETCH_SCHEMA rows; pair with
    ``merged_heavy_hitters`` on the sink table for the live top-k.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_buckets < 1:
        # ADVICE r7: n_buckets=0 would make pmod(xxhash64, 0) yield
        # NULL buckets and fail deep inside the executor with an
        # opaque int(None) TypeError — validate at the API edge.
        raise ValueError("n_buckets must be >= 1")

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            values, counts, err, seq = state.get
            counters = dict(zip(values, (int(c) for c in counts)))
            err, seq = int(err), int(seq)
        else:
            counters, err, seq = {}, 0, 0
        changed = False
        for pdf in pdfs:
            if len(pdf):
                err += mg_ingest(counters, pdf["value"], capacity)
                changed = True
        if not changed:
            yield pd.DataFrame(columns=[f.name for f in SKETCH_SCHEMA])
            return
        seq += 1
        state.update((list(counters.keys()),
                      [int(c) for c in counters.values()], err, seq))
        n = len(counters)
        yield pd.DataFrame({
            "bucket": [int(bucket)] * (n + 1),
            "seq": [seq] * (n + 1),
            "value": list(counters.keys()) + [None],
            "est": [int(c) for c in counters.values()] + [0],
            "err": [0] * n + [err],
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = (
        stream.select(F.col(col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("value"), F.lit(n_buckets)).cast("long"),
        )
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=SKETCH_SCHEMA,
        stateStructType=SKETCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merged_heavy_hitters(sink: DataFrame, k: int = 20) -> DataFrame:
    """Live top-k from an update-mode sink of SKETCH_SCHEMA rows:
    keep each bucket's LATEST (max-seq) emission, then bound each
    counter with ITS OWN bucket's error mass — count_lower = est,
    count_upper = est + err_b (see module docstring for why the
    per-bucket bound is valid here but not in the batch merge).
    """
    from pyspark.sql import Window

    wb = Window.partitionBy("bucket")
    latest = sink.withColumn(
        "__max_seq", F.max("seq").over(wb)
    ).filter(F.col("seq") == F.col("__max_seq"))
    bucket_err = F.max(
        F.when(F.col("value").isNull(), F.col("err"))
    ).over(wb)
    return (
        latest.withColumn("__be", bucket_err)
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.col("est").cast("long").alias("count_lower"),
            (F.col("est") + F.coalesce(F.col("__be"), F.lit(0)))
            .cast("long").alias("count_upper"),
        )
        .orderBy(F.desc("count_lower"), F.desc("count_upper"), "value")
        .limit(k)
    )
