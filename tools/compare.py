#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
entry in DuckDB against the sf parquet tables, compare to the engine's dumped
parquet (sort columns by name, sort rows, exact-compare values)."""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            bad += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            bad += 1
            continue
        e, g = norm(exp), norm(got)
        mism = []
        for c in e.columns:
            ev, gv = e[c].tolist(), g[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                same = (a == b) or (a is None and b is None) or \
                    (isinstance(a, float) and isinstance(b, float) and
                     (math.isnan(a) and math.isnan(b) or a == b)) or str(a) == str(b)
                if not same:
                    mism.append((c, i, a, b))
                    if len(mism) > 3:
                        break
            if len(mism) > 3:
                break
        if mism:
            print(f"FAIL {name}: {len(mism)}+ value mismatches, e.g. {mism[:3]}")
            bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            ok += 1
    # rows-only queries (no oracle): dumped parquet must exist and be non-empty
    import os
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in oracle:
            continue
        try:
            nrows = len(duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name} (rows-only): unreadable {e}")
            bad += 1
            continue
        if nrows == 0:
            print(f"FAIL {name} (rows-only): 0 rows")
            bad += 1
        else:
            print(f"OK   {name} (rows-only, {nrows} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
