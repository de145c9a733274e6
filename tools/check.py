#!/usr/bin/env python3
"""Local pre-verification harness (dev tool only — mimics the driver's t2
check; NOT part of the shipped library). Runs after `sbt "runMain
graft.Verify <sfDir> <outDir>"`:
for each query output parquet, executes the matching oracle SQL in DuckDB
over the same testdata parquet tables and compares schema-sorted values.
"""
import sys, glob

from oracle_common import parse_args, connect, load_oracle, query_names

sf_dir, out_dir = parse_args(sys.argv)
con = connect(sf_dir)
oracle = load_oracle(out_dir)
names = query_names(out_dir)

ok = bad = skip = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"NOOUT  {name}"); bad += 1; continue
    mine = con.sql(f"SELECT * FROM '{files[0]}'")
    if name not in oracle:
        print(f"SKIP   {name} (rows-only: {mine.shape[0]} rows)"); skip += 1; continue
    try:
        ref = con.sql(oracle[name])
    except Exception as e:
        print(f"SQLERR {name}: {str(e).splitlines()[0][:160]}"); bad += 1; continue
    mc, rc = sorted(mine.columns), sorted(ref.columns)
    if mc != rc:
        print(f"COLS   {name}: mine={mc} ref={rc}"); bad += 1; continue
    a = mine.df()[mc]
    b = ref.df()[rc]
    if a.shape != b.shape:
        print(f"SHAPE  {name}: mine={a.shape} ref={b.shape}"); bad += 1; continue
    # exact value compare, row order as produced
    mism = []
    for c in mc:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # str() fallback only for SAME-type values (covers e.g. numpy
            # array repr equality) — a cross-type coincidence like int 1 vs
            # string '1' must stay a mismatch, as it is in the driver's
            # hash compare.
            if x != y and not (x is None and y is None) \
                    and not (type(x) is type(y) and str(x) == str(y)):
                if not (isinstance(x, float) and isinstance(y, float) and x != x and y != y):
                    mism.append((c, i, x, y))
                    if len(mism) > 2: break
        if len(mism) > 2: break
    if mism:
        print(f"VAL    {name}: {mism[:3]} ({a.shape[0]} rows)"); bad += 1
    else:
        print(f"OK     {name} ({a.shape[0]} rows)"); ok += 1

print(f"\n{ok} ok, {bad} bad, {skip} rows-only, {len(oracle)} oracles")
sys.exit(1 if bad else 0)
