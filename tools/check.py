#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet inputs.
Columns are compared sorted-by-name (like the driver); rows in written
order; values exactly (after type normalization).

Mirrors two driver behaviors that bit us in round 2:
 1. The driver's pandas checker sorts EVERY query output (even no-oracle
    ones) and crashes on non-scalar columns (list/struct/map ->
    "unhashable type: numpy.ndarray"). We therefore REJECT any output
    parquet whose schema contains a nested or binary column.
 2. The driver hash is dtype-sensitive (DuckDB SIGN int8 vs Spark double;
    HUGEINT -> float64 vs int64). We compare pandas dtype *kind* per
    column (int vs float vs object) on both sides.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import duckdb, sys, json, os, datetime, math
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB type name fragments that the driver's pandas checker cannot sort.
NON_SCALAR = ("STRUCT", "MAP", "[]", "LIST", "BLOB", "UNION")

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

def nonscalar_cols(con, rel_sql):
    """Columns of `rel_sql` whose DuckDB type the driver checker chokes on."""
    desc = con.execute(f"DESCRIBE {rel_sql}").fetchall()
    return [(c, t) for c, t, *_ in desc
            if any(frag in t.upper() for frag in NON_SCALAR)]

def dtype_kinds(df):
    return {c: df[c].dtype.kind for c in df.columns}

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0

    # Pass 0: every query output (oracle or not) must be scalar-only —
    # the driver sorts/hashes all of them.
    outdirs = sorted(d for d in os.listdir(out)
                     if os.path.isdir(os.path.join(out, d)))
    for name in outdirs:
        if only and name not in only:
            continue
        try:
            bad = nonscalar_cols(con, f"(SELECT * FROM '{out}/{name}/*.parquet' LIMIT 0)")
        except Exception as e:
            print(f"FAIL {name}: output read error: {str(e)[:300]}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {name}: non-scalar output columns (driver checker "
                  f"crashes on these): {bad}")
            n_fail += 1

    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            edf = con.execute(sql).df()
            ecols = list(edf.columns)
            erows = list(edf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        bad = nonscalar_cols(con, f"({sql})")
        if bad:
            print(f"FAIL {name}: non-scalar ORACLE columns: {bad}")
            n_fail += 1
            continue
        pdir = f"{out}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            adf = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").df()
            acols = list(adf.columns)
            arows = list(adf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: spark output read error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(ecols) != sorted(acols):
            print(f"FAIL {name}: columns differ oracle={sorted(ecols)} spark={sorted(acols)}")
            n_fail += 1
            continue
        ek, ak = dtype_kinds(edf), dtype_kinds(adf)
        kind_diff = {c: (ek[c], ak[c]) for c in ek if ek[c] != ak[c]}
        if kind_diff:
            print(f"FAIL {name}: pandas dtype-kind drift (oracle, spark): {kind_diff}")
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
