"""PLANS.md must cover every declared query (VERDICT r3 gap #1: q62
landed without a plan-audit row because regeneration wasn't tied to
adding a query). This guard fails the suite whenever a `queries()`
key has no row in PLANS.md — regenerate with
``python tools/plan_audit.py`` in the same commit that adds a query.
"""

from __future__ import annotations

import os
import re


def test_every_query_has_a_plans_row():
    import __spark_entry__ as entrymod

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path) as f:
        text = f.read()
    rows = set(re.findall(r"^\| (\S+) \|", text, re.MULTILINE))
    declared = set(entrymod.queries())
    missing = sorted(declared - rows)
    assert not missing, (
        f"PLANS.md is stale — missing rows for {missing}; "
        "run `python tools/plan_audit.py` and commit the result"
    )


def test_no_row_level_python_in_plans_doc():
    """The audit marks row-at-a-time Python UDFs as ROW-UDF! — none may
    appear (Arrow-batched seams are reported as 'arrow' and allowed)."""
    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path) as f:
        assert "ROW-UDF!" not in f.read()


#: perf-critical queries whose PLAN SHAPE is pinned: a change to their
#: shuffle/broadcast counts must be deliberate (regenerate PLANS.md in
#: the same commit) — the plan-shape analogue of bench_history.json's
#: time tracking (SURVEY §7.7 item 6).
SIGNATURE = [
    "q01_filter_project", "q05_join_topk_revenue", "q06_join_5way",
    "q11_window_rank", "q16_topk_parts", "q23_graph_degree",
    "q24_graph_triangles", "q25_graph_2hop", "q63_ngram_jaccard",
    "q65_motif_wedge", "q91_motif_weighted", "q92_sequence_pack",
]

_PLANS_SF = "/root/testdata/sf0.01"  # the dir PLANS.md is generated at


def test_signature_plan_shapes_match_plans_doc(spark):
    import re

    import __spark_entry__ as entrymod
    from puregraphdb_spark.plans.explain import (
        broadcast_join_count, count_exchanges,
    )

    plans_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(plans_path) as f:
        text = f.read()
    doc = {
        m[0]: (int(m[1]), int(m[2]))
        for m in re.findall(
            r"^\| (\S+) \| (\d+) \| (\d+) \|", text, re.MULTILINE
        )
    }
    qs = entrymod.queries()
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        mismatches = []
        for name in SIGNATURE:
            df = qs[name](spark, _PLANS_SF)
            live = (count_exchanges(df), broadcast_join_count(df))
            if doc.get(name) != live:
                mismatches.append((name, doc.get(name), live))
        assert not mismatches, (
            "plan shape drifted from PLANS.md (doc (shuffles, "
            f"broadcasts) vs live): {mismatches}; if deliberate, run "
            "`python tools/plan_audit.py` and commit the result"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
