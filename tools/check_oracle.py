#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against the Verify parquet dumps
(sorted by column name, then row-wise). Usage:
    python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, os, json, glob
import datetime
import duckdb
import pandas as pd


def kind(s):
    """Dtype kind for the driver-parity compare: the driver's hash forgives
    integer widths (int32 vs int64 serialize the same) but NOT kind
    mismatches — DuckDB HUGEINT lands in pandas as float64, so an uncast
    SUM hashes 5.0 against Spark's 5 and fails. Flag exactly that class:
    int vs float vs bool vs datetime vs other."""
    d = s.dtype
    if pd.api.types.is_bool_dtype(d): return "bool"
    if pd.api.types.is_integer_dtype(d): return "int"
    if pd.api.types.is_float_dtype(d): return "float"
    if pd.api.types.is_datetime64_any_dtype(d): return "datetime"
    nn = s.dropna()
    if len(nn) and isinstance(nn.iloc[0], (datetime.date, datetime.datetime)):
        return "datetime"
    return "other"

sfdir, outdir = sys.argv[1], sys.argv[2]
# Optional 3rd arg: comma-separated query subset (used by tools/sweep_oracle.py
# to run one query per subprocess with a timeout). Absent = full sweep, the
# driver contract.
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # a table is either a single parquet file (testdata) or a
    # Spark-written directory of part files (ScaleUp output)
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"MISS  {name}: no spark output"); fails.append(name); continue
    try:
        got = pd.read_parquet(qdir)
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ERR   {name}: {e}"); fails.append(name); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"SCHEMA {name}: spark={gc} duck={wc}"); fails.append(name); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"ROWS  {name}: spark={len(g)} duck={len(w)}"); fails.append(name); continue
    ok = True
    for c in gc:
        gv, wv = g[c], w[c]
        gk, wk = kind(gv), kind(wv)
        if gk != wk:
            print(f"DTYPE {name}.{c}: spark={gv.dtype}({gk}) duck={wv.dtype}({wk})")
            ok = False
            continue
        try:
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
                eq = ((gv.astype(float) == wv.astype(float)) |
                      (gv.isna() & wv.isna()))
            else:
                eq = (gv.astype(str) == wv.astype(str))
        except Exception as e:
            print(f"CMPERR {name}.{c}: {e}"); ok = False; break
        if not eq.all():
            bad = (~eq).idxmax()
            print(f"VAL   {name}.{c}: row {bad}: spark={gv[bad]!r} duck={wv[bad]!r} "
                  f"({(~eq).sum()}/{len(eq)} differ)")
            ok = False
    if ok:
        print(f"OK    {name} ({len(g)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK" + (f"; FAILING: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
