#!/usr/bin/env python3
"""Dev-only oracle-parity checker mimicking the driver's gate:
run graft.Verify (done by caller via sbt), then compare each
<out>/<name> parquet against DuckDB running oracle_sql.json on the
same testdata. Not part of the shipped library.

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # driver sorts columns by name; we also sort rows for stable compare
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            # the driver expects rows > 0 — an emptied rows-only query
            # is a regression, not a pass
            results[name] = (f"rows-only ({len(got)} rows)" if len(got) > 0
                             else "EMPTY-ROWS-ONLY (0 rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT {len(g)} vs {len(e)}"
        else:
            eq = g.astype(str).equals(e.astype(str))
            if eq:
                results[name] = f"OK ({len(g)} rows)"
            else:
                diff = (g.astype(str) != e.astype(str)).any(axis=1)
                idx = diff[diff].index[:3]
                detail = []
                for i in idx:
                    detail.append(f"row{i}: spark={g.loc[i].to_dict()} duck={e.loc[i].to_dict()}")
                results[name] = "VALUE-MISMATCH " + " | ".join(detail)[:500]
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith(("OK", "rows-only")) else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {k}: {v}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
