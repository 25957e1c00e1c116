"""Streaming weighted reservoir: the incremental twin of
``operators.pipeline.weighted_sample`` (q112) — a per-key
Efraimidis–Spirakis A-ES sample without replacement maintained in
``applyInPandasWithState`` state as documents stream in.

Semantics: each arriving doc draws the SAME deterministic u ∈ (0,1]
from the portable multiplicative hash of its id as the batch operator
and is keyed by ln(u)/w; the state holds the current top-k
(key, doc_id, weight) per group. Because the keys are
value-deterministic (no RNG state), the reservoir after ANY trigger
split equals the batch sample over everything seen so far — the exact
batch ≡ streaming equivalence the dedup/decontaminate twins already
pin, proven in tests/test_streaming_sampling.py for one- and
two-trigger runs.

Emission contract: UPSERT rows (lang, rk, doc_id, weight) in update
mode, re-emitted whenever the group's reservoir changes — a sink that
upserts on (lang, rk) always holds the current sample (memory-sink
consumers keep the LAST row per (lang, rk)). A-ES eviction means
append-only emission is impossible BY DESIGN: a better-keyed late
arrival displaces a sampled doc, so the operator must re-state rank
assignments — update mode is the honest mode, not a limitation.

Scale: state is k rows of three scalars per group (k·24 bytes —
independent of stream volume); the only shuffle is the group-by key,
identical to the batch top-k window's exchange. The Arrow seam is the
sanctioned stateful-custom-operator boundary (SURVEY §7.5).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

RESERVOIR_SCHEMA = StructType([
    StructField("lang", StringType(), False),
    StructField("rk", LongType(), False),
    StructField("doc_id", LongType(), False),
    StructField("weight", LongType(), False),
])

RESERVOIR_STATE_SCHEMA = StructType([
    StructField("keys", ArrayType(DoubleType()), True),
    StructField("ids", ArrayType(LongType()), True),
    StructField("weights", ArrayType(LongType()), True),
])

#: keep in lockstep with operators.pipeline._hash_bucket / the q112
#: oracle: Knuth multiplicative hash over the 32-bit ring.
_MULT = 2654435761
_RING = 4294967296
_BUCKETS = 1048576


def _aes_key(doc_id: int, weight: int) -> float:
    b = ((doc_id % _RING) + _RING) % _RING
    u = ((b * _MULT) % _RING % _BUCKETS + 1) / float(_BUCKETS)
    return math.log(u) / float(max(weight, 1))


def weighted_reservoir_stateful(docs: DataFrame, k: int = 10,
                                key_col: str = "lang",
                                id_col: str = "doc_id",
                                weight_col: str = "n_chars") -> DataFrame:
    """Per-``key_col`` streaming A-ES reservoir of size ``k``.

    ``docs`` must be a streaming DataFrame with (key_col, id_col,
    weight_col). Returns the update-mode stream of RESERVOIR_SCHEMA
    rows (upsert on (lang, rk)).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def sample(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        (lang,) = key
        if state.exists:
            keys, ids, weights = state.get
            pool = {i: (kk, w) for kk, i, w in zip(keys, ids, weights)}
        else:
            pool = {}
        changed = False
        for pdf in pdfs:
            for i, w in zip(pdf[id_col].astype("int64"),
                            pdf[weight_col].astype("int64")):
                i, w = int(i), int(w)
                if i not in pool:
                    pool[i] = (_aes_key(i, w), w)
                    changed = True
        # rank: key desc, id asc — identical order to the batch window
        top = sorted(pool.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        if not changed and state.exists:
            yield pd.DataFrame(columns=[f.name for f in RESERVOIR_SCHEMA])
            return
        state.update((
            [kk for _, (kk, _) in top],
            [i for i, _ in top],
            [w for _, (_, w) in top],
        ))
        yield pd.DataFrame({
            "lang": [lang] * len(top),
            "rk": list(range(1, len(top) + 1)),
            "doc_id": [i for i, _ in top],
            "weight": [w for _, (_, w) in top],
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        docs.select(
            F.col(key_col).alias("lang"), F.col(id_col).alias(id_col),
            F.col(weight_col).alias(weight_col),
        )
        .groupBy("lang")
        .applyInPandasWithState(
            sample,
            outputStructType=RESERVOIR_SCHEMA,
            stateStructType=RESERVOIR_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
