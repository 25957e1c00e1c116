"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and
compares against ``oracle_sql()`` through DuckDB: row count, column
names, and order-insensitive values (sorted by all columns after
normalizing dtypes). Exits non-zero on any mismatch so it can gate
commits.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from puregraphdb_spark.engine import get_session  # noqa: E402
from puregraphdb_spark.sources.registry import TABLES  # noqa: E402


def dtype_kind_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns where one engine fetches int and the other float.

    The driver's value-hash is dtype-sensitive: DuckDB ``sum(BIGINT)``
    returns HUGEINT which pandas fetches as float64 (``7682.0``) while
    Spark returns int64 (``7682``) — numerically equal, hash-different
    (the exact class that broke q137 in round 9). ``normalize()``
    coerces this away, so the parity must be asserted BEFORE
    normalization to keep the local gate at least as strict as the
    driver. Fix mismatches by casting the oracle SQL (e.g.
    ``cast(sum(x) as bigint)``), never by weakening this check."""
    bad = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        s_int = pd.api.types.is_integer_dtype(sdf[c])
        s_flt = pd.api.types.is_float_dtype(sdf[c])
        o_int = pd.api.types.is_integer_dtype(odf[c])
        o_flt = pd.api.types.is_float_dtype(odf[c])
        if (s_int and o_flt) or (s_flt and o_int):
            bad.append(
                f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
            )
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and s.map(
            lambda v: isinstance(v, int), na_action="ignore"
        ).all():
            try:
                df[c] = s.astype("int64")
            except (TypeError, ValueError, OverflowError):
                pass
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_session(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows  ({dt_spark:.2f}s)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: cols spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            failures.append(name)
            continue
        kind_bad = dtype_kind_mismatches(sdf, odf)
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash would "
                  f"differ): {'; '.join(kind_bad)}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            # EXACT value match — the driver compares value hashes, so
            # any tolerance here hides real failures.
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, rtol=0.0, atol=0.0
            )
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(sdf)} rows hash-match  ({dt_spark:.2f}s)")

    print(f"\n{n_checked - len(failures)}/{n_checked} pass")
    if n_checked == 0:
        print(f"ERROR: 0 queries checked (misspelled name in "
              f"{sorted(only)}?)")
        return 2
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
