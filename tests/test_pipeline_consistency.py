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
