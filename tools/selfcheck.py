#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
against the same source tables, and compare row-by-row (columns sorted by
name, exact value equality after canonicalization).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.execute(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {e}")
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failed.append(name)
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            continue
        g, e = table_key(got_rows, got_cols), table_key(exp_rows, exp_cols)
        if g != e:
            failed.append(name)
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows", flush=True)
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i}:\n    got {a}\n    exp {b}")
                    break
            else:
                print(f"  row-count-only diff (prefix equal)")
        else:
            print(f"ok   {name} ({len(g)} rows)")
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} oracle queries match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
