#!/usr/bin/env python3
"""DuckDB half of the bench's in-artifact window protocol.

Usage: python3 tools/duck_time.py <layout_dir> <sql_json> [runs]

<sql_json> maps query name -> oracle SQL (written by graft.Bench).
Times each query on the given table layout at 32 threads with one
untimed warmup + `runs` timed passes, and prints ONE LINE PER QUERY:

    <name> <t1> <t2> ... (seconds, unsorted)

The line format (not JSON) keeps the Scala-side parser trivial. Any
per-query failure prints a diagnostic to stderr and skips the line, so
a single bad oracle cannot take down the whole window.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    layout = sys.argv[1]
    sqls = json.load(open(sys.argv[2]))
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(layout, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    for name, sql in sqls.items():
        try:
            con.execute(sql).fetchall()  # warmup
            ts = []
            for _ in range(runs):
                t0 = time.time()
                con.execute(sql).fetchall()
                ts.append(time.time() - t0)
            print(name + " " + " ".join(f"{t:.3f}" for t in ts), flush=True)
        except Exception as e:  # noqa: BLE001 - per-query isolation
            print(f"[duck_time] {name} failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
