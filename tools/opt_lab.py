"""Round-14 optimization lab: isolate one or more declared queries and
time them with the noop sink (guide §1.4) under the exact bench session
(same Engine tuning, persisted base tables, warm codegen), plus dump
`.explain("formatted")` for the plan evidence in plans/r14/.

    python tools/opt_lab.py q185_spearman q100_link_prediction \
        [--runs 5] [--sf /root/testdata/sf0.1] [--explain-dir plans/r14] \
        [--suffix before] [--topandas]

Timing methodology mirrors bench.py: build the DataFrame once, warm it
untimed, then time RUNS full re-executions via `where(lit(True))` (fresh
exchanges each run) keeping the best. Default action is the noop sink so
the computation is timed, not the Arrow fetch; --topandas switches to
the bench's fetch for apples-to-apples with BENCH numbers.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puregraphdb_spark.engine import Engine, get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--topandas", action="store_true")
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
    for name in args.names:
        fn = qs[name]
        df = fn(spark, args.sf)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(args.explain_dir,
                                f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}")
        spark.sparkContext.setJobDescription(f"opt_lab warmup {name}")
        if args.topandas:
            df.toPandas()
        else:
            df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(
                f"opt_lab {name} run {i}")
            fresh = df.where(F.lit(True))
            t0 = time.perf_counter()
            if args.topandas:
                fresh.toPandas()
            else:
                fresh.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            best = min(best, dt)
        print(f"{name}: best {best:.3f}s  runs "
              + " ".join(f"{t:.3f}" for t in times))


if __name__ == "__main__":
    main()
