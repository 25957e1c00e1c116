"""BPE trainer/applier (round 14): closed-form corpora, determinism,
round-trip, fertility, and the merge-loop reference equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.operators.bpe import (
    EOW, _merge_word, _train_on_dict, bpe_apply, bpe_fertility_report,
    bpe_train, tokenize_word, word_counts,
)
from tests.conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_merge_word_non_overlapping_left_to_right():
    assert _merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]


def test_train_closed_form_first_merge():
    """Corpus 'ab ab ab cd': the most frequent pair is (a, b</w>)
    with count 3 — the first merge, by construction."""
    merges = _train_on_dict([("ab", 3), ("cd", 1)], num_merges=2)
    assert merges[0][1:] == ("a", "b" + EOW, 3)
    # after merging, no pair occurs >= 2 times -> training stops
    assert len(merges) == 1


def test_train_tiebreak_is_lexicographic():
    """Equal-count pairs must break ties on (left, right) asc —
    determinism across partitionings and re-runs."""
    merges = _train_on_dict([("xy", 2), ("ab", 2)], num_merges=1)
    assert merges[0][1:] == ("a", "b" + EOW, 2)


def test_progressive_merges_build_longer_tokens():
    """'aaaa'×5: merge 1 = (a,a)->aa (count 15: 3 adjacencies per
    word... non-overlapping: pairs in a,a,a,a</w> are (a,a)x?).
    The check is structural: each later merge's left/right must be
    buildable from earlier tokens."""
    merges = _train_on_dict([("aaaa", 5)], num_merges=4)
    built = {c for c in "a"} | {"a" + EOW}
    for _, left, right, _n in merges:
        assert left in built
        assert right in built
        built.add(left + right)


def test_tokenize_word_roundtrip():
    """Concatenating a word's tokens (stripping the EOW sentinel)
    must reproduce the word, for ANY merge list."""
    merges = [(m[1], m[2]) for m in _train_on_dict(
        [("hello", 3), ("help", 2), ("hell", 2)], num_merges=6)]
    for w in ["hello", "help", "hell", "hel", "x", "shell"]:
        toks = tokenize_word(w, merges)
        assert "".join(toks).replace(EOW, "") == w
        assert toks[-1].endswith(EOW)


def test_apply_matches_driver_reference(spark):
    """bpe_apply's distributed tokenization (pandas UDF over the
    vocab + join) must equal tokenize_word per occurrence."""
    texts = ["the cat sat on the mat", "the mat sat", "cat cat cat"]
    docs = _docs(spark, texts)
    merges_df = bpe_train(docs, num_merges=10)
    ranked = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]
    got = bpe_apply(docs, merges_df).collect()
    assert got
    for r in got:
        assert list(r["tokens"]) == tokenize_word(r["word"], ranked)
        assert r["n_tokens"] == len(r["tokens"])
    # every word occurrence of the corpus is present exactly once
    n_words = sum(len(t.split()) for t in texts)
    assert len(got) == n_words


def test_train_is_deterministic_across_partitionings(spark):
    docs = _docs(spark, ["pack my box with five dozen liquor jugs",
                         "the quick brown fox", "pack the box"])
    a = bpe_train(docs.repartition(7), num_merges=8).collect()
    b = bpe_train(docs.coalesce(1), num_merges=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_fertility_report_shape_and_bounds(spark):
    docs = _docs(spark, ["aa aa aa bb", "aa bb aa"])
    merges_df = bpe_train(docs, num_merges=5)
    rep = bpe_fertility_report(docs, merges_df).collect()[0]
    assert rep["n_words"] == 7
    # fertility >= 1 token per word, <= word length + sentinel
    assert 1.0 <= rep["fertility"] <= 3.0
    assert rep["n_distinct_tokens"] >= 1


def test_vocab_gate_logs_and_truncates(spark, capfd):
    docs = _docs(spark, ["a b c d e f g h i j"])
    merges_df = bpe_train(docs, num_merges=3, max_vocab=4)
    merges_df.collect()
    err = capfd.readouterr().err
    assert "vocab gate hit" in err and "dropped 6" in err


def test_word_counts_one_shuffle(spark):
    docs = _docs(spark, ["x y x"])
    plan = word_counts(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_train_on_fixture_documents(spark):
    """End-to-end on the real documents table: trains, merges are
    well-formed, applying them tokenizes the corpus."""
    from puregraphdb_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges_df = bpe_train(docs, num_merges=20)
    rows = merges_df.collect()
    assert 1 <= len(rows) <= 20
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    # counts are non-increasing? NOT guaranteed for BPE in general
    # (merges create new frequent pairs), but every count >= 2
    assert all(r["pair_count"] >= 2 for r in rows)
    rep = bpe_fertility_report(docs, merges_df).collect()[0]
    assert rep["n_words"] > 0 and rep["fertility"] >= 1.0
