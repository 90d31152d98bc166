#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Reads each <out>/<name> parquet (Spark result), runs the oracle SQL from
<out>/oracle_sql.json in DuckDB over the sf tables, and compares values
(columns sorted by name, rows sorted, floats rounded)."""
import json, sys, math
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else 'NaN'
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in ['region','nation','customer','supplier','part','orders','lineitem',
              'events','documents','embeddings']:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # GenScale tiers are Spark multi-file dirs
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import glob, os
    names = [os.path.basename(p) for p in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(p)]
    for name in names:
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"; continue
        if name not in oracles:
            results[name] = f"rows-only ({len(grows)} rows)" + (" EMPTY!" if not grows else "")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"; continue
        if sorted(gcols) != sorted(ecols):
            results[name] = f"COLS-MISMATCH spark={sorted(gcols)} oracle={sorted(ecols)}"
            continue
        # arrow-level type check: repr() masks e.g. duckdb HUGEINT vs spark
        # BIGINT, but the driver's hasher does not — flag type drift early
        try:
            gt = {f.name: f.type for f in con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') LIMIT 0").arrow().schema}
            et = {f.name: f.type for f in con.sql(
                f"SELECT * FROM ({oracles[name]}) LIMIT 0").arrow().schema}
            drift = {c: (str(gt[c]), str(et[c])) for c in gt
                     if str(gt[c]) != str(et[c])
                     and not ({str(gt[c]), str(et[c])} <= {'float', 'double'})}
            if drift:
                results[name] = f"TYPE-MISMATCH {drift}"
                continue
        except Exception:
            pass
        g, e = canon(grows, gcols), canon(erows, ecols)
        if len(g) != len(e):
            results[name] = f"ROWS-MISMATCH spark={len(g)} oracle={len(e)}"
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            results[name] = f"VALUES-MISMATCH first at row {bad}:\n  spark:  {g[bad]}\n  oracle: {e[bad]}"
        else:
            results[name] = f"OK ({len(g)} rows)"
    npass = sum(1 for v in results.values() if v.startswith('OK') or v.startswith('rows-only ('))
    for k in sorted(results):
        print(f"{k:24s} {results[k]}")
    print(f"\n{npass}/{len(results)} pass")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
