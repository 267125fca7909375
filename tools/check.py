#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet inputs.
Columns are compared sorted-by-name (like the driver); rows in written
order; values exactly (after type normalization).

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import duckdb, sys, json, os, datetime, math
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            r = con.execute(sql)
            ecols = [dd[0] for dd in r.description]
            erows = r.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        pdir = f"{out}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            r2 = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
            acols = [dd[0] for dd in r2.description]
            arows = r2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output read error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(ecols) != sorted(acols):
            print(f"FAIL {name}: columns differ oracle={sorted(ecols)} spark={sorted(acols)}")
            n_fail += 1
            continue
        if len(erows) != len(arows):
            print(f"FAIL {name}: row count oracle={len(erows)} spark={len(arows)}")
            n_fail += 1
            continue
        ei = sorted(range(len(ecols)), key=lambda i: ecols[i])
        ai = sorted(range(len(acols)), key=lambda i: acols[i])
        bad = []
        for rn, (er, ar) in enumerate(zip(erows, arows)):
            ev = tuple(norm(er[i]) for i in ei)
            av = tuple(norm(ar[i]) for i in ai)
            if ev != av:
                bad.append((rn, ev, av))
                if len(bad) >= 3:
                    break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value diffs (cols {sorted(ecols)})")
            for rn, ev, av in bad:
                print(f"  row {rn}:\n    oracle={ev}\n    spark ={av}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
