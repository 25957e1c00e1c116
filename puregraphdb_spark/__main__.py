"""CLI door: run SQL (including CALL procedures) against a data
directory from the shell — the interactive entry point a database
user expects alongside the Python (EP1), SQL (EP2) and graph (EP3)
APIs.

    python -m puregraphdb_spark --data-dir /root/testdata/sf0.01 \
        --sql "select count(*) as n from lineitem"
    python -m puregraphdb_spark --data-dir ... \
        --sql "CALL degrees(edges => 'my_edges')"
    echo "select 1 as x" | python -m puregraphdb_spark --data-dir ...

Output is CSV on stdout (header + rows) — composable with shell
tooling; diagnostics go to stderr. ``--limit`` caps driver-side
materialization (the query itself stays lazy/distributed; the cap is
applied as a LIMIT before collection, so a SELECT over 100 TB streams
only the capped rows to the driver).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="puregraphdb_spark",
        description="Run SQL / CALL statements over a parquet data directory.",
    )
    ap.add_argument("--data-dir", required=True,
                    help="directory of <table>.parquet files to register")
    ap.add_argument("--sql", action="append", default=[],
                    help="statement to run (repeatable; '-' or omitted = stdin)")
    ap.add_argument("--limit", type=int, default=10_000,
                    help="max rows materialized to the driver per statement")
    ap.add_argument("--master", default=None,
                    help="Spark master override (default: local[cores])")
    args = ap.parse_args(argv)

    stmts = [s for s in args.sql if s and s != "-"]
    if not stmts:
        text = sys.stdin.read()
        stmts = [s.strip() for s in text.split(";") if s.strip()]
    if not stmts:
        print("no statements given", file=sys.stderr)
        return 2

    from puregraphdb_spark.engine import Engine, get_session

    spark = get_session(master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, args.data_dir)
    eng.tune_for_data_size()

    out = csv.writer(sys.stdout, lineterminator=os.linesep)
    for stmt in stmts:
        df = eng.sql(stmt)
        rows = df.limit(args.limit).collect() if args.limit else df.collect()
        out.writerow(df.columns)
        for r in rows:
            out.writerow(list(r))
        if args.limit and len(rows) == args.limit:
            print(f"[truncated at --limit {args.limit}]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
