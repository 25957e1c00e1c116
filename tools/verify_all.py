"""One command, full surface, BOTH scales (VERDICT r7 item 8): run
every ``__spark_entry__.queries()`` entry against its DuckDB oracle at
sf0.01 AND sf1 in a single process/session, so future rounds can't
silently skip the sf1 follow-through. Regenerates the sf1 fixtures if
absent (deterministic, tools/gen_fixtures.py seed).

    python tools/verify_all.py              # sf0.01 + sf1
    python tools/verify_all.py --skip-sf1   # sf0.01 only (fast gate)

Exit non-zero on any mismatch at any scale. Writes a one-line JSON
summary per scale to stdout (machine-greppable for SELFCHECK).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from puregraphdb_spark.engine import get_session  # noqa: E402
from puregraphdb_spark.sources.registry import TABLES  # noqa: E402
from tools.check_oracle import dtype_kind_mismatches, normalize  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF1 = "/root/repo/.scale/sf1"


def run_scale(spark, sf_dir: str, only: set[str]) -> dict:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, n = [], 0
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name} @{sf_dir}: spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name} @{sf_dir}: rows-only, {len(sdf)} rows "
                  f"({dt:.2f}s)", flush=True)
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok = (len(sdf) == len(odf)
              and sorted(sdf.columns) == sorted(odf.columns))
        if ok:
            # Driver-hash parity: int-vs-float dtype-kind mismatch
            # (e.g. DuckDB HUGEINT -> float64) fails the driver even
            # when values are equal — fail it locally too (q137, r9).
            kind_bad = dtype_kind_mismatches(sdf, odf)
            if kind_bad:
                print(f"FAIL {name} @{sf_dir}: dtype-kind mismatch: "
                      f"{'; '.join(kind_bad)}")
                failures.append(name)
                continue
            try:
                pd.testing.assert_frame_equal(
                    normalize(sdf), normalize(odf),
                    check_dtype=False, rtol=0.0, atol=0.0)
            except AssertionError:
                ok = False
        if not ok:
            print(f"FAIL {name} @{sf_dir}: mismatch "
                  f"(spark {len(sdf)} rows, oracle {len(odf)})")
            failures.append(name)
            continue
        print(f"ok   {name} @{sf_dir}: {len(sdf)} rows hash-match "
              f"({dt:.2f}s)", flush=True)
    return {
        "sf_dir": sf_dir, "checked": n, "failed": failures,
        "wall_s": round(time.time() - t_start, 1),
    }


def main() -> int:
    args = sys.argv[1:]
    skip_sf1 = "--skip-sf1" in args
    sf1_only = "--sf1-only" in args
    only = {a for a in args if not a.startswith("--")}
    scales = [] if sf1_only else [SF001]
    if not skip_sf1:
        if not os.path.isdir(SF1):
            print(f"generating sf1 fixtures at {SF1} ...", flush=True)
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__),
                              "gen_fixtures.py"), "1.0", SF1],
                check=True,
            )
        scales.append(SF1)
    if not scales:
        # --sf1-only + --skip-sf1 would otherwise verify nothing and
        # exit 0 — a vacuously green gate (ADVICE r9). Checked before
        # the Spark session build so the argument mistake fails fast
        # (ADVICE r10).
        print("ERROR: no scales selected (--sf1-only with --skip-sf1)")
        return 2
    spark = get_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf_dir in scales:
        summary = run_scale(spark, sf_dir, only)
        print("SUMMARY " + json.dumps(summary), flush=True)
        bad += len(summary["failed"])
        if summary["checked"] == 0:
            print(f"ERROR: 0 queries checked at {sf_dir} "
                  f"(misspelled query name in {sorted(only)}?)")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
