#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: read Verify output parquet,
run oracle SQL in DuckDB on the same tables, compare rows/schema/hash.

Hardened after round 1 to PREDICT the driver's representation-sensitive
hash instead of silently passing value-identical outputs:
  - decimals canonicalize through repr(float(v)) — the driver's compare
    renders one side through a float-style path, so Decimal('44.00') and
    Decimal('44.0') hash differently from '44.00' but identically to 44.0;
  - any DECIMAL (incl. DuckDB HUGEINT → decimal128(38,0)) column in EITHER
    side's final Arrow schema is a hard D6 violation, even if values match;
  - Arrow types are compared column-by-column (timestamp[ns] vs [us],
    int64 vs decimal, ...) — a type mismatch is a fail.
"""
import sys, json, glob, duckdb, decimal, datetime
import pyarrow as pa
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# CHECK_SKIP=q33c_ngram_jaccard_pairs,...  — for oracles that are O(n^2)
# in DuckDB (fine at the driver's sf0.01, too slow locally at sf0.1)
import os as _os
for _q in filter(None, _os.environ.get("CHECK_SKIP", "").split(",")):
    if _q in oracle:
        print(f"SKIPPED  {_q} (CHECK_SKIP)")
        del oracle[_q]
# CHECK_ONLY=q59_tfidf,... — builder-side iteration filter (pairs with
# Verify's GRAFT_VERIFY_ONLY); the driver never sets it.
_only = set(filter(None, _os.environ.get("CHECK_ONLY", "").split(",")))
if _only:
    oracle = {k: v for k, v in oracle.items() if k in _only}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def canon(v):
    if isinstance(v, float): return repr(v)
    # Driver lesson (round 1): decimals are rendered float-style on one
    # side of the driver's compare — emulate that so trailing zeros
    # ('44.00' vs '44.0') mismatch exactly when the driver would mismatch.
    if isinstance(v, decimal.Decimal): return repr(float(v))
    if isinstance(v, datetime.datetime): return v.isoformat()
    return repr(v)

def decimal_cols(tbl):
    return [f.name for f in tbl.schema if pa.types.is_decimal(f.type)]

def type_map(tbl):
    return {f.name: str(f.type) for f in tbl.schema}

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}"); fails += 1; continue
    spark_t = pq.read_table(files[0])
    cols = sorted(spark_t.column_names)
    spark_rows = [tuple(canon(r[c]) for c in cols) for r in spark_t.to_pylist()]
    try:
        duck_t = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails += 1; continue
    dcols = sorted(duck_t.column_names)
    duck_rows = [tuple(canon(r[c]) for c in dcols) for r in duck_t.to_pylist()]
    if cols != dcols:
        print(f"SCHEMA   {name}: spark={cols} duck={dcols}"); fails += 1; continue
    # D6: no DECIMAL/HUGEINT may reach a final projection on either side.
    dec_s, dec_d = decimal_cols(spark_t), decimal_cols(duck_t)
    if dec_s or dec_d:
        print(f"DECIMAL  {name}: spark={dec_s} duck={dec_d}  <-- D6 violation")
        fails += 1; continue
    # Arrow-type parity (timestamp unit, int width, ...).
    ts, td = type_map(spark_t), type_map(duck_t)
    tdiff = {c: (ts[c], td[c]) for c in cols if ts[c] != td[c]}
    if tdiff:
        print(f"TYPE     {name}: {tdiff}"); fails += 1; continue
    if spark_rows != duck_rows:
        n = len(spark_rows)
        diff = [i for i,(a,b) in enumerate(zip(spark_rows,duck_rows)) if a!=b][:3]
        print(f"HASH     {name}: rows {n} vs {len(duck_rows)}; first diffs {diff}")
        for i in diff:
            print(f"  spark[{i}]={spark_rows[i]}")
            print(f"  duck [{i}]={duck_rows[i]}")
        fails += 1; continue
    print(f"OK       {name} ({len(spark_rows)} rows)")
# queries without oracle → rows-only
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        files = glob.glob(f"{p}/*.parquet")
        n = sum(pq.read_table(f).num_rows for f in files) if files else 0
        print(f"ROWSONLY {d}: {n} rows" + ("  <-- EMPTY!" if n==0 else ""))
print("FAILS:", fails)
sys.exit(1 if fails else 0)
