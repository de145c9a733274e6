#!/usr/bin/env python3
"""Generate an sf1 corpus (10x sf0.1) for local scale spot-checks.

Dev tool, driver-side python only (duckdb) — NOT part of the shipped
library. The driver's testdata caps at sf0.1; the scaling argument for
the heavy dedup/graph/percentile family deserves one empirical order of
magnitude, so this replicates sf0.1 ten times with:

  - id offsets (BASE=10M per copy) applied consistently across foreign
    keys, so joins stay referentially intact and cardinalities scale 10x;
  - fixed dimension tables (nation/region), like TPC-H;
  - a 31-day event-time shift per copy, so event-window counts scale
    linearly instead of densifying;
  - deterministic ~25% token mutation per document copy, so copies are
    NOT near-duplicates (10 exact clones per doc would turn the dedup
    family into an artificial quadratic-on-copies workload);
  - hash-noise re-randomized embeddings per copy (the base corpus is
    isotropic, so noise at component scale is distribution-preserving);
    copy 0 stays byte-identical to sf0.1 everywhere.

Timestamps are written as TIMESTAMPTZ so parquet carries
isAdjustedToUTC=true and Spark decodes TimestampType, matching the
driver corpus.

Usage: python3 tools/gen_sf1.py [outdir]   (default /tmp/graft_sf1)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
BASE = 10_000_000
COPIES = 10

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
import os
os.makedirs(OUT, exist_ok=True)


def gen(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


copies = f"(SELECT unnest(range({COPIES})) AS cp)"

# fixed dims — single copy
gen("region", f"SELECT * FROM {src('region')}")
gen("nation", f"SELECT * FROM {src('nation')}")

gen("customer", f"""
SELECT c_custkey + cp*{BASE} AS c_custkey, c_name, c_nationkey,
       c_acctbal, c_mktsegment
FROM {src('customer')}, {copies}""")

gen("supplier", f"""
SELECT s_suppkey + cp*{BASE} AS s_suppkey, s_name, s_nationkey, s_acctbal
FROM {src('supplier')}, {copies}""")

gen("part", f"""
SELECT p_partkey + cp*{BASE} AS p_partkey, p_name, p_brand, p_type,
       p_size, p_retailprice
FROM {src('part')}, {copies}""")

gen("orders", f"""
SELECT o_orderkey + cp*{BASE} AS o_orderkey,
       o_custkey + cp*{BASE} AS o_custkey,
       o_orderstatus, o_totalprice,
       o_orderdate::TIMESTAMPTZ AS o_orderdate, o_orderpriority
FROM {src('orders')}, {copies}""")

gen("lineitem", f"""
SELECT l_orderkey + cp*{BASE} AS l_orderkey,
       l_partkey + cp*{BASE} AS l_partkey,
       l_suppkey + cp*{BASE} AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus,
       l_shipdate::TIMESTAMPTZ AS l_shipdate
FROM {src('lineitem')}, {copies}""")

gen("events", f"""
SELECT event_id + cp*{BASE} AS event_id,
       (ts + cp * INTERVAL 31 DAY)::TIMESTAMPTZ AS ts,
       user_id + cp*{BASE} AS user_id,
       event_type, value, props
FROM {src('events')}, {copies}""")

gen("documents", f"""
SELECT doc_id + cp*{BASE} AS doc_id,
       CASE WHEN cp = 0 THEN text
         ELSE array_to_string(list_transform(string_split(text, ' '),
           t -> CASE WHEN hash(t || '#' || cp::VARCHAR) % 4 = 0
                THEN t || '~' || cp::VARCHAR ELSE t END), ' ')
       END AS text,
       lang, source, n_chars
FROM {src('documents')}, {copies}""")

gen("embeddings", f"""
WITH s AS (
  SELECT stddev(x) AS sd FROM (
    SELECT unnest(embedding)::DOUBLE AS x FROM {src('embeddings')}))
SELECT vec_id + cp*{BASE} AS vec_id,
       CASE WHEN cp = 0 THEN embedding
         ELSE list_transform(range(1, len(embedding) + 1),
           i -> (embedding[i]::DOUBLE
             + ((hash(vec_id*1000 + cp*100 + i) % 2001)::BIGINT - 1000)
               / 1000.0 * sd)::FLOAT)::FLOAT[]
       END AS embedding,
       label
FROM {src('embeddings')}, {copies}, s""")
