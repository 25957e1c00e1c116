"""Oracle-text consistency guards: several oracles embed constants
that MUST track the Python implementations (stopword profiles, MinHash
coefficients, the multiplicative-hash constants). A drift would make
the oracle test a different function than the engine computes — these
checks fail the suite at the source instead of as a puzzling
hash-mismatch.
"""

from __future__ import annotations

import __spark_entry__ as em
from puregraphdb_spark.operators.pipeline import (
    _MINHASH_COEF, _MINHASH_PRIME, _MULT, _RING,
)
from puregraphdb_spark.operators.text import _STOPWORDS
from puregraphdb_spark.sql_library import SPARK_SQL

ORACLES = em.oracle_sql()


def test_langid_oracle_embeds_the_stopword_profiles():
    for sql in (ORACLES["q72_langid_confusion"],
                SPARK_SQL["q72_langid_confusion"]):
        for lang, words in _STOPWORDS.items():
            for w in words:
                assert f"'{w}'" in sql, (
                    f"stopword {w!r} ({lang}) missing from the q72 oracle "
                    "— update the SQL to match text._STOPWORDS"
                )


def test_minhash_oracle_embeds_the_coefficients():
    for sql in (ORACLES["q74_minhash_vocab"], SPARK_SQL["q74_minhash_vocab"]):
        assert str(_MINHASH_PRIME) in sql
        for a, b in _MINHASH_COEF:
            assert str(a) in sql and str(b) in sql, (
                f"MinHash coefficient ({a}, {b}) missing from the q74 "
                "oracle — update the SQL to match pipeline._MINHASH_COEF"
            )


def test_hash_split_oracles_embed_the_multiplicative_constants():
    for name in ("q69_hash_split", "q73_stratified_sample"):
        sql = ORACLES[name]
        assert str(_MULT) in sql and str(_RING) in sql, (
            f"{name} oracle drifted from pipeline._MULT/_RING"
        )


def test_sequence_pack_range_decomposition_exact(spark):
    """The distributed two-pass scan (range partials + offsets + local
    windows) must assign every doc the same pack as the naive global
    prefix sum — forced across MANY ranges (range_size=8), including
    streams whose ids are sparse/nonaligned."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from puregraphdb_spark.operators.pipeline import sequence_pack

    rows = []
    for lang, ids in (
        ("aa", range(0, 100, 3)),      # stride-3 ids across 5 ranges
        ("bb", list(range(7)) + list(range(50, 90))),  # gap
    ):
        rows += [(lang, i, "tok " * ((i * 7) % 13 + 1)) for i in ids]
    docs = spark.createDataFrame(rows, ["lang", "doc_id", "text"])

    got = sequence_pack(docs, budget=16, range_size=8)

    # naive single-window reference
    staged = docs.select(
        "lang", "doc_id",
        F.size(F.filter(F.split(F.lower("text"), " "),
                        lambda t: t != "")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = (
        staged.withColumn(
            "pack_id",
            F.floor(
                F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(16)
            ).cast("long"),
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    g = sorted(
        (r["lang"], r["pack_id"], r["n_docs"], r["pack_tokens"],
         r["first_doc"], r["last_doc"])
        for r in got.collect()
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert g == want and len(g) > 5


def test_sequence_pack_keeps_null_stream_keys(spark):
    """A NULL stream key is a real group to the window formulation;
    the range-offset join must be null-safe so those rows pack instead
    of silently vanishing (review r6)."""
    from puregraphdb_spark.operators.pipeline import sequence_pack

    docs = spark.createDataFrame(
        [("aa", 1, "a b c"), (None, 2, "d e f g"), ("aa", 3, "h i"),
         (None, 4, "j k")],
        ["lang", "doc_id", "text"],
    )
    got = sequence_pack(docs, budget=4, range_size=2)
    rows = {
        (r["lang"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
        for r in got.collect()
    }
    # every doc accounted for, including the NULL stream
    assert sum(n for n, _ in rows.values()) == 4
    null_packs = {k: v for k, v in rows.items() if k[0] is None}
    assert sum(n for n, _ in null_packs.values()) == 2
    assert sum(t for _, t in null_packs.values()) == 6  # 4 + 2 tokens
