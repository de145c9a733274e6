#!/usr/bin/env python3
"""Oracle SQL pre-flight (dev tool only — NOT part of the shipped
library). Parses + binds EVERY `SparkEntry.oracleSql` string through
DuckDB `EXPLAIN` against the real testdata views, WITHOUT executing
anything, so a parse/binder error (e.g. the r8 double-stripMargin bare
`|` bug) fails locally in seconds instead of surfacing as a red row in
the driver's CORRECTNESS report.

Usage:
    sbt "runMain graft.Verify --sql-only /tmp/graft_sql"
    python3 tools/preflight.py /root/testdata/sf0.001 /tmp/graft_sql
"""
import sys

from oracle_common import parse_args, connect, load_oracle

sf_dir, out_dir = parse_args(sys.argv)
con = connect(sf_dir)
oracle = load_oracle(out_dir)

bad = 0
for name in sorted(oracle):
    try:
        con.sql("EXPLAIN " + oracle[name])
    except Exception as e:
        print(f"SQLERR {name}: {str(e).splitlines()[0][:200]}")
        bad += 1
print(f"\n{len(oracle) - bad}/{len(oracle)} oracles parse+bind clean")
sys.exit(1 if bad else 0)
