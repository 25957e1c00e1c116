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
