"""Generate SCALE-CHECK fixtures: the ten tables at an arbitrary scale
factor with the sf0.1 schemas (cast against the real fixture schemas)
and matched distributions (key density, categorical values, value
ranges measured from /root/testdata/sf0.1 — see SCALECHECK.md).

Deterministic (numpy default_rng(42)). These are NOT the driver's
fixtures (its generator is unknown); they exist to execute the engine
and its DuckDB oracles at 10×+ the bench scale and to observe the
measured-size gates flip on real data. Writes OUTSIDE /root/testdata
(driver data is read-only).

Usage: python tools/gen_fixtures.py 1.0 /root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.1"
REF_SF = 0.1

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["SMALL", "LARGE", "STANDARD", "PROMO", "ECONOMY", "MEDIUM"]
ADJ = ["blue", "old", "new", "large", "hot", "cold", "red", "small"]
NOUN = ["anvil", "gizmo", "bolt", "plate", "rod", "ring", "gear", "widget"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, cols: dict) -> None:
    ref = pq.read_schema(os.path.join(REF_DIR, f"{name}.parquet"))
    t = pa.table({f.name: cols[f.name] for f in ref}).cast(ref)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {t.num_rows} rows")


def gen(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(42)
    m = sf / REF_SF
    n_cust, n_supp, n_part = int(15000 * m), int(1000 * m), int(20000 * m)
    n_ord, n_ev = int(150000 * m), int(100000 * m)
    n_doc, n_emb, n_user = int(5000 * m), int(2000 * m), int(1500 * m)
    os.makedirs(out_dir, exist_ok=True)

    for small in ("region", "nation"):  # fixed tiny dims: copy verbatim
        t = pq.read_table(os.path.join(REF_DIR, f"{small}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{small}.parquet"))

    k = np.arange(n_cust)
    _write(out_dir, "customer", {
        "c_custkey": k,
        "c_name": np.array([f"Customer#{i:09d}" for i in k]),
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })

    k = np.arange(n_supp)
    _write(out_dir, "supplier", {
        "s_suppkey": k,
        "s_name": np.array([f"Supplier#{i:09d}" for i in k]),
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    })

    k = np.arange(n_part)
    _write(out_dir, "part", {
        "p_partkey": k,
        "p_name": np.char.add(
            np.char.add(np.array(ADJ)[rng.integers(0, 8, n_part)], " "),
            np.array(NOUN)[rng.integers(0, 8, n_part)],
        ),
        "p_brand": np.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]
        ),
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2),
    })

    ok = np.arange(n_ord)
    odate_us = (
        np.datetime64("1995-01-01", "us").astype("int64")
        + rng.integers(0, 2404, n_ord) * DAY_US
    )
    _write(out_dir, "orders", {
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": odate_us.astype("datetime64[us]"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })

    lines = rng.integers(1, 8, n_ord)  # avg 4 lines/order (fixture: 4.08)
    n_li = int(lines.sum())
    li_ok = np.repeat(ok, lines)
    linenumber = (np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines)
                  + 1)
    qty = rng.integers(1, 51, n_li).astype("float64")
    _write(out_dir, "lineitem", {
        "l_orderkey": li_ok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": linenumber,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": (
            np.repeat(odate_us, lines) + rng.integers(1, 96, n_li) * DAY_US
        ).astype("datetime64[us]"),
    })

    ts_us = (
        np.datetime64("2024-01-01", "us").astype("int64")
        + rng.integers(0, 30 * DAY_US, n_ev)
    )
    _write(out_dir, "events", {
        "event_id": np.arange(n_ev),
        "ts": np.sort(ts_us).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.array(
            [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)]
        ),
    })

    n_tok = rng.integers(10, 101, n_doc)
    tok_ids = rng.integers(0, len(VOCAB), int(n_tok.sum()))
    vocab = np.array(VOCAB)
    bounds = np.cumsum(n_tok)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(vocab[tok_ids], bounds)]
    _write(out_dir, "documents", {
        "doc_id": np.arange(n_doc),
        "text": np.array(texts),
        "lang": rng.choice(LANGS, n_doc, p=LANG_W),
        "source": np.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": np.array([len(t) for t in texts]),
    })

    emb = rng.standard_normal((n_emb, 64)).astype("float32")
    _write(out_dir, "embeddings", {
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(emb)),
        "label": rng.integers(0, 10, n_emb),
    })


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scale/sf{sys.argv[1]}"
    gen(sf, out)
    total = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    print(f"total {total / (1 << 20):.1f} MiB at {out}")
