"""Shared bootstrap for the local oracle dev tools (check.py,
typecheck.py): corpus table list, DuckDB view setup, and the
oracle_sql.json / output-dir conventions. One place to extend when a
corpus table is added — a drifted copy in one tool reads as a false
verification failure.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def parse_args(argv):
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/graft_verify"
    return sf_dir, out_dir


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def load_oracle(out_dir):
    return json.load(open(f"{out_dir}/oracle_sql.json"))


def query_names(out_dir):
    return sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
