#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB-oracle compare:
runs each oracle SQL against the sf tables, loads the corresponding
Spark result parquet, sorts columns by name and rows by values, and
compares cell-by-cell (dtype-tolerant on int widths)."""
import sys, json, glob
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["lineitem","orders","events","documents","embeddings","customer",
          "part","supplier","nation","region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

sqls = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(sqls):
    try:
        theirs = con.execute(sqls[name]).df()
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); fails.append(name); continue
        mine = duckdb.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        a = mine.reindex(sorted(mine.columns), axis=1)
        b = theirs.reindex(sorted(theirs.columns), axis=1)
        if list(a.columns) != list(b.columns):
            print(f"{name}: COLUMN MISMATCH mine={list(a.columns)} oracle={list(b.columns)}")
            fails.append(name); continue
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        if len(a) != len(b):
            print(f"{name}: ROWCOUNT mine={len(a)} oracle={len(b)}")
            fails.append(name); continue
        ok = True
        for c in a.columns:
            av, bv = a[c], b[c]
            # The driver's hash is dtype/format-sensitive: an int64 Spark
            # column vs a float64 oracle column (e.g. DuckDB HUGEINT sums)
            # hash-mismatches even when every value agrees. Mirror that:
            # dtype KINDS must match before values are compared.
            ak, bk = av.dtype.kind, bv.dtype.kind
            norm = lambda k: "i" if k in "iu" else k
            if norm(ak) != norm(bk):
                print(f"{name}.{c}: DTYPE MISMATCH mine={av.dtype} oracle={bv.dtype}"
                      f" (driver hash formats these differently)")
                ok = False
                continue
            try:
                if ak in "fc":
                    # The driver hashes FORMATTED values, so compare exact
                    # reprs: every float oracle column is already rounded at
                    # fixed precision, and repr sees what isclose cannot —
                    # the sign of zero (-0.0 vs 0.0) and sub-tolerance drift.
                    import numpy as np
                    ar = av.astype(float).map(repr)
                    br = bv.astype(float).map(repr)
                    bad = ar != br
                else:
                    # Non-float columns must match exactly, as the driver does.
                    bad = av.astype(str) != bv.astype(str)
            except Exception as e:
                print(f"{name}.{c}: compare error {e}"); ok=False; break
            if bad.any():
                import numpy as np
                i = int(np.argmax(np.asarray(bad)))
                print(f"{name}.{c}: {int(bad.sum())} diffs, e.g. row {i}: mine={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
                ok = False
        if ok: print(f"{name}: OK ({len(a)} rows)")
        else: fails.append(name)
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails.append(name)
print(f"\n{len(sqls)-len(fails)}/{len(sqls)} OK; failing: {fails}")
sys.exit(1 if fails else 0)
