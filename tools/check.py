#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Runs after `tools/run.sh graft.Verify <sfDir> <outDir>`: for each query,
loads the Spark parquet result and the DuckDB result of the oracle SQL on
the same testdata tables, sorts columns by name, and compares row-by-row
(exact for strings/ints/timestamps, bit-exact report + tolerance report
for floats so we can see how close double arithmetic lands).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    # Spark-written tables (ScaleUp stress data) may be part directories
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            row = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if row is not None and row[0] == "BIGINT":
                # ScaleUp round trip: ts is raw nanos (Spark nanosAsLong read,
                # no ns write type) — restore the timestamp exactly like
                # Tables.events does Spark-side (ns -> us)
                con.execute("CREATE OR REPLACE VIEW events AS "
                            f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM {src}")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    ok = True
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = g.to_numpy(dtype="float64"); ea = e.to_numpy(dtype="float64")
            bit = np.array_equal(ga, ea, equal_nan=True)
            if not bit:
                both = ~(np.isnan(ga) & np.isnan(ea))
                ad = np.abs(ga - ea)[both]
                rel = (ad / np.maximum(np.abs(ea[both]), 1e-300)).max() if both.any() else 0
                print(f"  [{name}.{c}] NOT bit-exact: max_abs={ad.max():.3e} max_rel={rel:.3e}")
                if rel > 1e-9:
                    ok = False
        else:
            try:
                if pd.api.types.is_datetime64_any_dtype(e):
                    e = e.dt.tz_localize(None) if getattr(e.dt, "tz", None) is not None else e
                    g = g.dt.tz_localize(None) if getattr(g.dt, "tz", None) is not None else g
                eq = (g.astype(object).where(pd.notna(g), None) ==
                      e.astype(object).where(pd.notna(e), None)) | (pd.isna(g) & pd.isna(e))
            except Exception as ex:
                print(f"  [{name}.{c}] compare error: {ex}"); ok = False; continue
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                print(f"  [{name}.{c}] mismatch row {i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        print(f"FAIL {name}"); fail += 1
print(f"\n{len(oracle)-fail}/{len(oracle)} pass")
sys.exit(1 if fail else 0)
