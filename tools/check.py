#!/usr/bin/env python
"""Local mimic of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark result parquet written by
graft.Verify, sort columns by name + rows, and compare values."""
import sys, os, json, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# optional 3rd arg: write a driver-shaped correctness JSON ({name:
# {rows_match, schema_match, hash_match}}) so tools/finalize.py can sync
# the NOTES gate block from the builder's own final-chain run before the
# driver's CORRECTNESS_rN.json exists — same comparison, same shape,
# reproducible by re-running this script.
json_out = sys.argv[3] if len(sys.argv) > 3 else None
results = {}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING {name}: no spark output"); fail += 1
        results[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "err": "missing spark output"}
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1
        results[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "err": f"oracle: {e}"}
        continue
    sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    def normalize(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else v)
        return df
    o = normalize(odf)
    s = normalize(sdf)
    if list(o.columns) != list(s.columns):
        print(f"SCHEMA {name}: oracle={list(o.columns)} spark={list(s.columns)}")
        fail += 1
        results[name] = {"rows_match": False, "schema_match": False, "hash_match": False}
        continue
    if len(o) != len(s):
        print(f"ROWS {name}: oracle={len(o)} spark={len(s)}"); fail += 1
        results[name] = {"rows_match": False, "schema_match": True, "hash_match": False}
        continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    mismatch = None
    for c in o.columns:
        ov, sv = o[c], s[c]
        try:
            eq = (ov.astype(str) == sv.astype(str))
        except Exception:
            eq = ov == sv
        if not eq.all():
            i = (~eq).idxmax()
            mismatch = (c, i, ov.iloc[i], sv.iloc[i])
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"VALUE {name}: col={c} row={i} oracle={a!r} spark={b!r}")
        fail += 1
        results[name] = {"rows_match": True, "schema_match": True, "hash_match": False}
    else:
        print(f"OK {name} ({len(o)} rows)"); ok += 1
        results[name] = {"rows_match": True, "schema_match": True, "hash_match": True}
print(f"\n{ok} ok, {fail} failed, {len(oracle)} total (+{len([1 for _ in os.listdir(out_dir) if _ != 'oracle_sql.json']) - len(oracle)} rows-only)")
if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
sys.exit(1 if fail else 0)
