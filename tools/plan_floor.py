"""Round-14 planning-floor probe: for each core-30 query, split the
bench's per-re-execution cost into (a) analysis+optimization+physical
planning time and (b) execution time, and count logical-plan nodes.

    python tools/plan_floor.py [--runs 3] [--names q01_... ...]

Methodology: build the DataFrame once (prepared-statement model, like
bench.py), warm it, then per run wrap in `where(lit(True))` (fresh
QueryExecution) and time `executedPlan` materialization separately from
the subsequent toPandas. The sum of the two matches the bench's
re-execution cost; the split says how much a slimmer plan tree could
save. Node counts come from the analyzed and optimized logical plans.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puregraphdb_spark.engine import Engine, get_session  # noqa: E402


def count_nodes(jplan) -> int:
    n = 1
    children = jplan.children()
    it = children.iterator()
    while it.hasNext():
        n += count_nodes(it.next())
    # innerChildren (subqueries) are not walked: good enough for sizing
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, args.sf, register_views=False)
    eng.tune_for_data_size()
    eng.register_all_views()
    for name in ("lineitem", "orders", "customer", "supplier", "part",
                 "nation", "region", "events", "documents", "embeddings"):
        eng.table(name).persist().count()

    qs = entrymod.queries()
    if args.names:
        names = args.names
    else:
        names = [k for k in qs if re.match(r"^q(0[1-9]|[12][0-9]|30)_", k)]

    print(f"{'query':34s} {'nodes':>5s} {'plan_ms':>8s} {'exec_ms':>8s} "
          f"{'total_ms':>8s}")
    tot_plan = tot_exec = 0.0
    for name in names:
        df = qs[name](spark, args.sf)
        df.toPandas()  # warm
        nodes = count_nodes(df._jdf.queryExecution().analyzed())
        best_plan = best_exec = float("inf")
        for _ in range(args.runs):
            fresh = df.where(F.lit(True))
            t0 = time.perf_counter()
            fresh._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            fresh.toPandas()
            t2 = time.perf_counter()
            best_plan = min(best_plan, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
        tot_plan += best_plan
        tot_exec += best_exec
        print(f"{name:34s} {nodes:5d} {best_plan*1e3:8.1f} "
              f"{best_exec*1e3:8.1f} {(best_plan+best_exec)*1e3:8.1f}")
    print(f"{'TOTAL':34s} {'':5s} {tot_plan*1e3:8.1f} {tot_exec*1e3:8.1f} "
          f"{(tot_plan+tot_exec)*1e3:8.1f}")


if __name__ == "__main__":
    main()
