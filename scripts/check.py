#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare with the Spark result parquet
(columns sorted by name, rows sorted), report exact/approx match."""
import duckdb, glob, json, math, os, sys

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = None
    for c in got.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b): continue
                # the driver hash distinguishes -0.0 from +0.0; Python == doesn't
                if a != b or (a == 0.0 and math.copysign(1, a) != math.copysign(1, b)):
                    bad = (c, i, a, b); break
            elif str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
print(f"{'='*40}\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
