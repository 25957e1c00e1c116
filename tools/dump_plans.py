"""Dump `.explain("formatted")` for named declared queries WITHOUT
executing them (plan evidence for plans/r{N}/ — pairs with opt_lab.py,
which also times; this one is safe to run while a bench holds the CPUs).

    python tools/dump_plans.py --dir plans/r15 --suffix before q183_mann_whitney ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puregraphdb_spark.engine import Engine, get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--dir", default="plans/r15")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_session(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, args.sf, register_views=False)
    eng.tune_for_data_size()
    eng.register_all_views()

    qs = entrymod.queries()
    os.makedirs(args.dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        path = os.path.join(args.dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
