"""Round-13 operator pins: resource-allocation link prediction
(q171) on the shared q100 co-supply core."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

SF = "/root/testdata/sf0.001"


def test_q171_matches_exact_fraction_recompute(spark):
    """The integer-weight RA ranking must equal an independent
    exact-rational recompute (Fraction arithmetic driver-side on the
    small fixture) — pinning both the 10^12 div weight and the
    bigint-sum ordering."""
    from puregraphdb_spark.operators.graph import (
        _co_supply_pairs, q171_resource_allocation)

    rows = _co_supply_pairs(spark, SF, None, 0).collect()
    by_c = defaultdict(list)
    for r in rows:
        by_c[r["c"]].append(r["s"])
    w_int = defaultdict(int)      # what the operator sums (10^12//dz)
    cn = defaultdict(int)
    ra_frac = defaultdict(Fraction)
    for c, ss in by_c.items():
        dz = len(ss)
        for i, s1 in enumerate(sorted(ss)):
            for s2 in sorted(ss)[i + 1:]:
                w_int[(s1, s2)] += 10**12 // dz
                cn[(s1, s2)] += 1
                ra_frac[(s1, s2)] += Fraction(1, dz)
    want = sorted(w_int.items(),
                  key=lambda kv: (-kv[1], kv[0]))[:50]
    got = q171_resource_allocation(spark, SF).collect()
    assert len(got) == min(50, len(want))
    for g, (pair, w) in zip(got, want):
        assert (g["s1"], g["s2"]) == pair
        assert g["cn"] == cn[pair]
        # display score is the truncated-integer sum over 1e12,
        # within one truncation step of the exact rational
        assert abs(g["ra_score"] - float(ra_frac[pair])) < 1e-6


def test_q171_gate_parity_capped_vs_exact(spark):
    """q100 discipline applied to the RA twin: cap above every
    fixture degree (gate forced open) must be bit-identical to the
    exact path."""
    from puregraphdb_spark.operators.graph import (
        q171_resource_allocation)

    capped = sorted(map(tuple, q171_resource_allocation(
        spark, SF, max_neighborhood=512, skew_cap_bytes=0).collect()))
    exact = sorted(map(tuple, q171_resource_allocation(
        spark, SF, max_neighborhood=None).collect()))
    assert capped == exact


def test_q171_tiny_cap_bounds_expansion(spark):
    from puregraphdb_spark.operators.graph import (
        q171_resource_allocation)

    assert q171_resource_allocation(
        spark, SF, max_neighborhood=1, skew_cap_bytes=0).count() == 0
