"""Byte-pair-encoding tokenizer: train + apply (round 14, VERDICT r13
item 8 — the one tokenizer-family member q64/q152's regex stand-in did
not cover).

Spark-first decomposition of the classic algorithm (Sennrich et al.,
ACL 2016):

- **Word counting is the distributed part.** BPE trains on the
  word-frequency DICTIONARY, not the corpus: one regex pre-tokenize +
  one groupBy over the corpus collapses 100 TB of text to |vocab|
  rows (a natural-language vocab is ~10⁵–10⁷ words regardless of
  corpus size — Heaps' law; the corpus never appears again).
- **The merge loop is driver-side model fitting.** Each merge depends
  on the previous one (inherently sequential — 50 iterations of
  "count pairs, pick argmax, rewrite" over the dict), and the dict is
  model-state-sized, so the loop runs in plain Python on the
  collected dictionary behind an explicit size gate — the same
  contract as kmeans_centroids collecting k×dim floats. A dict
  overflowing the gate is truncated to the most frequent ``max_vocab``
  words with the dropped mass LOGGED in the returned stats (no
  silent cap — the house rule).
- **Application is vocab-sized, not corpus-sized.** Tokenizing
  re-runs the merge rules per DISTINCT word (an Arrow-batched pandas
  UDF over the dictionary relation), then joins the corpus's words
  against that tokenization map — so the per-word Python loop costs
  O(|vocab|), and the corpus-side work is one hash join.

Everything is deterministic: pair counts are exact bigints; the
argmax tie-breaks on (count desc, left asc, right asc); no RNG, no
floats anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the q64 pre-tokenizer grain: alpha runs | digit runs | single punct
WORD_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: WORD_PATTERN spelled for a Spark SQL string literal (backslashes
#: doubled: the SQL parser unescapes '\s' to 's', silently matching
#: whitespace — caught by the occurrence-count test)
_SQL_PATTERN = WORD_PATTERN.replace("\\", "\\\\")

#: end-of-word sentinel appended to each word's final symbol so merges
#: never cross word boundaries and suffix tokens stay distinct from
#: mid-word tokens ("est</w>" vs "est") — the original BPE scheme.
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the lowercased corpus — the ONE corpus-wide
    shuffle in the whole trainer."""
    return (
        docs.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}),"
                    f" '{_SQL_PATTERN}', 0)")
            ).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    """Replace every non-overlapping (left, right) adjacency, left to
    right — the canonical BPE apply order."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (i + 1 < len(symbols) and symbols[i] == left
                and symbols[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _train_on_dict(dict_rows: list[tuple[str, int]],
                   num_merges: int) -> list[tuple[int, str, str, int]]:
    """The sequential merge loop on the collected dictionary.
    Returns [(rank, left, right, pair_count)]; stops early when no
    pair occurs twice."""
    words: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + EOW], n) for w, n in dict_rows if w]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append((rank, left, right, best))
        words = [(_merge_word(s, left, right), n) for s, n in words]
    return merges


def bpe_train(docs: DataFrame, num_merges: int = 50,
              text_col: str = "text",
              max_vocab: int = 200_000) -> DataFrame:
    """Train BPE merge rules → DataFrame (rank, left, right,
    pair_count) ordered by rank.

    The dictionary collect is gated at ``max_vocab`` distinct words
    (most frequent first, ties by word asc for determinism); if the
    corpus vocabulary overflows the gate, the dropped word-mass is
    surfaced via an INFO-level stderr line AND the returned frame's
    metadata-free contract stays exact for the kept dict — callers
    needing the exact tail raise ``max_vocab``.
    """
    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    top = (wc.orderBy(F.desc("n"), F.asc("word")).limit(max_vocab)
           .collect())
    if len(top) == max_vocab:
        dropped = wc.count() - max_vocab
        if dropped > 0:
            import sys

            print(f"bpe_train: vocab gate hit — dropped {dropped} "
                  f"least-frequent words (raise max_vocab for the "
                  f"exact tail)", file=sys.stderr)
    merges = _train_on_dict([(r["word"], r["n"]) for r in top],
                            num_merges)
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string,"
        " pair_count long")


def tokenize_word(word: str,
                  merges: list[tuple[str, str]]) -> list[str]:
    """Apply the ranked merge list to one word (plain Python — used
    per DISTINCT word inside the Arrow batch, and by tests)."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, left, right)
    return syms


def bpe_apply(docs: DataFrame, merges_df: DataFrame,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Tokenize the corpus with trained merges → (id, word, tokens,
    n_tokens) one row per word occurrence position — the fertility
    grain (q152 compares tokenizers on exactly this).

    Plan: merges collect to a ranked broadcast list (model state);
    the per-word merge loop runs ONCE per distinct word via an
    Arrow-batched pandas UDF over the vocab relation; the corpus side
    explodes words (with position, so downstream can reassemble) and
    hash-joins the |vocab|-sized tokenization map."""
    from pyspark.sql.functions import pandas_udf

    ranked = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]

    @pandas_udf("array<string>")
    def tok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: tokenize_word(w, ranked))

    corpus_words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"regexp_extract_all(lower({text_col}),"
                f" '{_SQL_PATTERN}', 0)")
        ).alias("pos", "word"))
    vocab = corpus_words.select("word").distinct().select(
        "word", tok(F.col("word")).alias("tokens"),
    ).select("word", "tokens", F.size("tokens").alias("n_tokens"))
    return corpus_words.join(vocab, "word").select(
        id_col, "pos", "word", "tokens", "n_tokens")


def bpe_fertility_report(docs: DataFrame, merges_df: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Corpus-level fertility of the trained tokenizer: one row
    (n_words, n_tokens, n_distinct_tokens, fertility) — the number
    that decides whether the vocab/merge budget is right (≈1 token
    per word = saturated; ≫1 = undertrained)."""
    from puregraphdb_spark.functions.numeric import decimal_round

    toks = bpe_apply(docs, merges_df, text_col, id_col)
    totals = toks.agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    distinct = (
        toks.select(F.explode("tokens").alias("t"))
        .agg(F.count_distinct("t").cast("long")
             .alias("n_distinct_tokens"))
    )
    return totals.crossJoin(distinct).select(
        "n_words", "n_tokens", "n_distinct_tokens",
        decimal_round(
            F.col("n_tokens").cast("double")
            / F.col("n_words").cast("double"), 6, grid=10,
        ).alias("fertility"),
    )
