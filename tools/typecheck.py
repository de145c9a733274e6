#!/usr/bin/env python3
"""Dev tool: type-level oracle audit. The driver's hash compare is
TYPE-sensitive (DuckDB HUGEINT != Spark BIGINT even when values match),
and check.py's value compare can't see that. This script compares, per
query, the DuckDB result column types of the oracle SQL against the
Spark output parquet column types (both read through DuckDB so the type
names are comparable), flagging any mismatch — especially HUGEINT /
INT128 leaks from un-cast sum() windows or // division.
"""
import glob
import sys

from oracle_common import parse_args, connect, load_oracle, query_names

sf_dir, out_dir = parse_args(sys.argv)
con = connect(sf_dir)
oracle = load_oracle(out_dir)


def coltypes(rel):
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


bad = ok = skip = 0
for name in query_names(out_dir):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files or name not in oracle:
        skip += 1
        continue
    mine = coltypes(con.sql(f"SELECT * FROM '{files[0]}' LIMIT 0"))
    try:
        ref = coltypes(con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0"))
    except Exception as e:
        print(f"SQLERR {name}: {str(e).splitlines()[0][:160]}")
        bad += 1
        continue
    diffs = []
    for c in sorted(set(mine) | set(ref)):
        a, b = mine.get(c), ref.get(c)
        if a != b:
            diffs.append(f"{c}: spark={a} oracle={b}")
    if diffs:
        print(f"TYPE   {name}: " + "; ".join(diffs))
        bad += 1
    else:
        ok += 1

print(f"\n{ok} type-identical, {bad} mismatched, {skip} skipped")
sys.exit(1 if bad else 0)
