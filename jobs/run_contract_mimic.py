"""Emit a CORRECTNESS-style JSON from the in-repo driver mimic.

The per-round driver caps its correctness run at 50 entries, so some
long-green entries rotate out of CORRECTNESS_r{N}.json even when the
code under them changed (VERDICT r3 item 3). This job runs EVERY
oracle-backed contract entry against its DuckDB oracle — the same
row-count + schema + order-insensitive value comparison as
tests/test_driver_contract.py — and writes the result in the driver's
JSON shape, so the judge can diff driver-vs-mimic per round and every
entry has a green row dated after its last code change.

Usage:
    python jobs/run_contract_mimic.py [--sf /root/testdata/sf0.01] \
        [--out artifacts/CORRECTNESS_MIMIC_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="artifacts/CORRECTNESS_MIMIC.json")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sequential_query_expansion_spark.session import get_spark

    spark = get_spark("contract-mimic")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    results: dict = {}
    for name in sorted(queries):
        rec = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "spark_rows": None,
            "oracle_rows": None, "err": None,
        }
        try:
            got = _normalize(queries[name](spark, args.sf).toPandas())
            rec["spark_rows"] = int(len(got))
            if name not in oracles:
                # rows-only entry (none today; kept for shape parity)
                rec["err"] = "no oracle (rows-only entry)"
                results[name] = rec
                continue
            want = _normalize(con.execute(oracles[name]).df())
            rec["oracle_rows"] = int(len(want))
            rec["rows_match"] = len(got) == len(want)
            rec["schema_match"] = list(got.columns) == list(want.columns)
            if rec["rows_match"] and rec["schema_match"]:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=True
                    )
                    rec["hash_match"] = True
                except AssertionError as e:
                    rec["err"] = f"value mismatch: {str(e)[:200]}"
        except Exception as e:  # noqa: BLE001 — record, keep going
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        results[name] = rec
        status = "ok" if rec["hash_match"] else f"FAIL ({rec['err']})"
        print(f"{name}: {rec['spark_rows']} rows — {status}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    print(f"\n{n_ok}/{len(results)} green -> {args.out}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
