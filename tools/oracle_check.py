#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify main's dumped
parquet, mimicking the driver compare (sort columns by name, sort rows, exact
value hash)."""
import duckdb, glob, os, sys, json
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

sql = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(sql):
    try:
        oracle = con.execute(sql[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    try:
        got = pd.read_parquet(glob.glob(f"{out}/{name}/*.parquet")[0] if glob.glob(f"{out}/{name}/*.parquet") else f"{out}/{name}")
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING: {e}")
        fails.append(name)
        continue
    o = oracle.reindex(sorted(oracle.columns), axis=1)
    g = got.reindex(sorted(got.columns), axis=1)
    status = []
    if list(o.columns) != list(g.columns):
        status.append(f"COLS oracle={list(o.columns)} got={list(g.columns)}")
    if len(o) != len(g):
        status.append(f"ROWS oracle={len(o)} got={len(g)}")
    if not status:
        os_ = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        # dtype parity (driver hashes typed values)
        dt = [(c, str(os_[c].dtype), str(gs[c].dtype)) for c in o.columns
              if str(os_[c].dtype) != str(gs[c].dtype)]
        if dt:
            status.append(f"DTYPES {dt}")
        try:
            eq = os_.equals(gs)
            if not eq:
                diff = (os_ != gs) & ~(os_.isna() & gs.isna())
                ndiff = int(diff.sum().sum())
                if ndiff:
                    cells = diff.any(axis=1)
                    status.append(f"VALUES {ndiff} diff cells; first rows:\n"
                                  f"oracle:\n{os_[cells].head(3)}\ngot:\n{gs[cells].head(3)}")
        except Exception as e:
            status.append(f"COMPARE ERR {e}")
    if status:
        print(f"{name}: MISMATCH — " + " | ".join(status))
        fails.append(name)
    else:
        print(f"{name}: OK ({len(o)} rows, {len(o.columns)} cols)")
print(f"\n{len(sql)-len(fails)}/{len(sql)} match")
sys.exit(1 if fails else 0)
