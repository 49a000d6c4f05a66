#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs DuckDB on SparkEntry.oracleSql (dumped by graft.Verify) against the
same parquet tables, and compares with the Verify parquet outputs:
columns sorted by name, rows sorted, values compared exactly (floats via
bit-exact equality first, then 1e-12 relative as a diagnostic).

Usage: python3 scripts/check_oracle.py <sfdir> <verify_out_dir>
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no Verify output"); fails += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        oth = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    oth = oth.reindex(sorted(oth.columns), axis=1)
    if list(mine.columns) != list(oth.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oth.columns)}")
        fails += 1; continue
    if len(mine) != len(oth):
        print(f"FAIL {name}: rows {len(mine)} vs {len(oth)}"); fails += 1; continue
    mine = mine.sort_values(by=list(mine.columns), ignore_index=True)
    oth = oth.sort_values(by=list(oth.columns), ignore_index=True)
    ok = True
    for c in mine.columns:
        a, b = mine[c], oth[c]
        if a.dtype != b.dtype:
            print(f"  {name}.{c}: dtype {a.dtype} vs {b.dtype}")
        try:
            same = (a.isna() & b.isna()) | (a == b)
            if not same.all():
                if np.issubdtype(a.dtype, np.floating):
                    close = np.isclose(a.fillna(0), b.fillna(0), rtol=1e-12, atol=1e-12)
                    kind = "float-close" if close.all() else "float-DIFF"
                else:
                    kind = "DIFF"
                bad = (~same).idxmax()
                print(f"FAIL {name}.{c} [{kind}]: e.g. row {bad}: {a[bad]!r} vs {b[bad]!r}")
                ok = False
        except Exception as e:
            print(f"FAIL {name}.{c}: compare error {e}"); ok = False
    if ok:
        print(f"PASS {name} ({len(mine)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
