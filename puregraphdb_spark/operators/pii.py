"""PII detection and redaction over document corpora.

The standard curation stage next to quality filtering (q71) and
contamination screening (q66/q141): count personally-identifiable
patterns per source so a pipeline can gate or quarantine feeds, and
redact them in place for the feeds that pass.

Regex discipline (the q37/q64 rule): every pattern uses ONLY literal
characters, character classes, and bounded quantifiers — the subset
Java regex (Spark, whole-stage codegen) and RE2 (DuckDB oracle)
interpret identically; no lookaround (RE2 has none), no alternation
whose branches share a prefix (leftmost-first vs leftmost-longest
would diverge). Patterns over-match by design (an IPv4 octet of 999
still counts) — detection wants recall; redaction of a false positive
is harmless.

Scale: detection is a map-side ``regexp_extract_all`` count folded
into ONE shuffle on the source key (the match arrays never cross the
exchange); redaction is a pure per-row projection with ZERO shuffles
— both are embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from puregraphdb_spark.functions.numeric import decimal_round
from puregraphdb_spark.sources.registry import final_sort, load_table

#: kind -> (pattern, redaction placeholder). Order matters for
#: redact_pii: emails first so an address's dotted host is never
#: half-eaten by the ipv4 rule before the email rule sees it.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
              "[EMAIL]"),
    "phone": (r"\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}",
              "[PHONE]"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
             "[IP]"),
}


def pii_count_columns(text_col: str = "text") -> list[F.Column]:
    """Per-kind match-count columns (``__email``, ``__phone``,
    ``__ipv4``) — the map-side building block shared by the batch
    report and the streaming monitor (streaming/pii_monitor.py)."""
    return [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .cast("long").alias(f"__{kind}")
        for kind, (pat, _) in PII_PATTERNS.items()
    ]


def pii_scan(docs: DataFrame, text_col: str = "text",
             source_col: str = "source") -> DataFrame:
    """Per-source PII exposure report: document counts, per-kind hit
    counts, and the fraction of documents carrying any PII.

    One map-side tokenize-and-count per kind, one shuffle on the
    source key; only per-doc counts cross the exchange.
    """
    counts = pii_count_columns(text_col)
    per_doc = docs.select(F.col(source_col).alias("source"), *counts)
    any_hit = sum(
        (F.col(f"__{k}") for k in PII_PATTERNS),
        F.lit(0).cast("long"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(any_hit > 0, 1).otherwise(0))
        .cast("long").alias("docs_with_pii"),
        *[F.sum(f"__{k}").cast("long").alias(f"n_{k}")
          for k in PII_PATTERNS],
        decimal_round(
            F.sum(F.when(any_hit > 0, 1).otherwise(0))
            .cast("double") / F.count("*").cast("double"),
            6, grid=10,
        ).alias("pii_doc_ratio"),
    )


def redact_pii(docs: DataFrame, kinds: list[str] | None = None,
               text_col: str = "text") -> DataFrame:
    """Replace every PII match with its placeholder, in PII_PATTERNS
    order (emails before ipv4 — see the dict comment), and append a
    ``n_redactions`` count per row. Pure projection: zero shuffles,
    zero Python — ``regexp_replace`` stays in codegen.
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; known: {list(PII_PATTERNS)}")
    # count matches BEFORE rewriting (a later kind must not count the
    # placeholder text of an earlier one, and placeholders contain no
    # PII-shaped substrings anyway)
    n_redactions = sum(
        (F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(PII_PATTERNS[k][0]), 0))
         .cast("long") for k in kinds),
        F.lit(0).cast("long"),
    )
    redacted = F.col(text_col)
    for k in PII_PATTERNS:  # canonical order, filtered to kinds
        if k in kinds:
            pat, placeholder = PII_PATTERNS[k]
            redacted = F.regexp_replace(redacted, pat, placeholder)
    return docs.withColumns({
        text_col: redacted,
        "n_redactions": n_redactions,
    })


def plant_synthetic_pii(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Deterministically append synthetic PII to a residue-class of
    documents — doc_id % 7 gets an email, % 11 a phone, % 13 an IPv4
    (some docs get several). The fixtures' synthetic text carries no
    real PII, so the oracled q146 plants this test pattern to keep
    the cross-engine regex comparison informative (an all-zero report
    would hash-match without exercising either regex engine). Every
    planted string is built from integer column arithmetic with
    ``concat``/``lpad``, identical on both engines.
    """
    i = F.col(id_col)
    s = lambda e: e.cast("string")  # noqa: E731
    planted = F.concat(
        F.col(text_col),
        F.when(i % 7 == 0, F.concat(
            F.lit(" contact user"), s(i), F.lit("@example.com"),
        )).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.concat(
            F.lit(" call +1-555-867-"), F.lpad(s(i % 10000), 4, "0"),
        )).otherwise(F.lit("")),
        F.when(i % 13 == 0, F.concat(
            F.lit(" from 10."), s(i % 256), F.lit("."), s(i % 100),
            F.lit("."), s(i % 250 + 1),
        )).otherwise(F.lit("")),
    )
    return docs.withColumn(text_col, planted)


def q146_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report over documents with the
    deterministic synthetic plant (see ``plant_synthetic_pii`` for
    why the plant exists). The operator itself (``pii_scan``) runs
    unplanted in production; ``redact_pii`` is the apply side."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    res = pii_scan(plant_synthetic_pii(d))
    return final_sort(res, spark, sf_dir, "documents", "source")
