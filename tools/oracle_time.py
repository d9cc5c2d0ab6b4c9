#!/usr/bin/env python3
"""Same-session DuckDB re-time of the headline oracles — the other half of
the BENCH_COMPARE protocol (recorded rule: DuckDB drifts across days, so a
ratio is only honest when both sides ran in the same session on the same
layout).

Usage: python3 tools/oracle_time.py <verify_out_dir> [bench_relayout_dir]

Reads oracle SQL from <verify_out_dir>/oracle_sql.json, times each headline
query on the bench's own 32-file relayout (newest /tmp/graft_bench_par* if
not given) with one warmup + min-of-3 at 32 threads, and also times the two
materialized-fixture twins (m_q75_mat / m_q87_mat) over the SAME
/tmp/graft_matfix_li100_* parquet files the Spark entries scan. Prints one
JSON line."""
import glob
import json
import os
import sys
import time

import duckdb

HEADLINE = [
    "q75_scale100_pricing", "q79_scale100_fixedpoint", "q83_scale100_rollup",
    "q87_scale100_join", "q94_bucketed_join", "q98_span_dedup",
    "q100_spandedup_scale10", "q102_incremental_spans",
    "q115_dsir_scale10", "q117_dsir_scale100",
    "q146_semantic_dedup", "q147_semdedup_scale30", "q148_incr_semdedup",
    "q149_semdedup_scale100",
]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MAT_Q75 = """
SELECT l_returnflag, l_linestatus, rep,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
    (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
    AS sum_disc_price,
  COUNT(*) AS count_order
FROM mat WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

MAT_Q87 = """
SELECT o_orderpriority, rep,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
    (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_rows
FROM mat JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2"""

# The pre-derived as-of twin: DuckDB's NATIVE ASOF LEFT JOIN over the
# same materialized facts/dims parquet the Spark m_asof_plain_uniform_x10
# entry scans (ScaleBench.asofFixturePath) — both engines time ONLY the
# union+match work, no derivation passes.
MAT_ASOF = """
SELECT f.event_id, f.ts_us, f.user_id, f.value, d.state_id, d.state_value
FROM asof_facts f ASOF LEFT JOIN asof_dims d
  ON f.user_id = d.user_id AND f.ts_us >= d.ts_us"""


def newest(pattern):
    cands = glob.glob(pattern)
    return max(cands, key=os.path.getmtime) if cands else None


def time_sql(con, sql, runs=3):
    con.execute(sql).fetchall()  # warmup
    ts = []
    for _ in range(runs):
        t0 = time.time()
        con.execute(sql).fetchall()
        ts.append(time.time() - t0)
    return min(ts), ts


def main():
    # --sweep <bench_out.json>: instead of the headline set, time EVERY
    # oracled query recorded in the bench JSON (the full-surface ratio
    # sweep; warm min-of-2 to keep the pass bounded) and print per-query
    # spark/duck/ratio.
    sweep = None
    args = [a for a in sys.argv[1:]]
    if "--sweep" in args:
        i = args.index("--sweep")
        sweep = args[i + 1]
        del args[i:i + 2]
    out_dir = args[0]
    layout = args[1] if len(args) > 1 else newest("/tmp/graft_bench_par*")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(layout, f"{t}.parquet")
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    results = {}
    if sweep:
        bench = json.load(open(sweep))["queries"]
        for name in sorted(bench):
            if name not in oracles or bench[name] < 0:
                continue
            best, ts = time_sql(con, oracles[name], runs=2)
            results[name] = {"min": round(best, 3),
                             "runs": [round(x, 3) for x in ts],
                             "spark": bench[name],
                             "ratio": round(bench[name] / best, 2)
                             if best > 0 else None}
        print(json.dumps({"layout": layout, "results": results}))
        return
    for name in HEADLINE:
        if name not in oracles:
            continue
        best, ts = time_sql(con, oracles[name])
        results[name] = {"min": round(best, 3),
                         "runs": [round(x, 3) for x in ts]}
    # suffix-pinned: the Spark twins scan the bare ..._p128 dir; the
    # profile's relayout (_f64/_f128) and codec variants must never be
    # glob-selected as DuckDB's layout or the pairing silently mismatches
    mat = newest("/tmp/graft_matfix_li100_*_p128")
    if mat:
        con.execute("CREATE VIEW mat AS SELECT * FROM "
                    f"read_parquet('{mat}/*.parquet')")
        for name, sql in [("m_q75_mat", MAT_Q75), ("m_q87_mat", MAT_Q87)]:
            best, ts = time_sql(con, sql)
            results[name] = {"min": round(best, 3),
                             "runs": [round(x, 3) for x in ts]}
    for times, name in [("x10", "m_asof_plain"), ("x1000", "m_asof_x1000")]:
        asof_facts = newest(f"/tmp/graft_matfix_asof_facts_{times}_*")
        asof_dims = newest(f"/tmp/graft_matfix_asof_dims_{times}_*")
        if not (asof_facts and asof_dims):
            continue
        con.execute("CREATE OR REPLACE VIEW asof_facts AS SELECT * FROM "
                    f"read_parquet('{asof_facts}/*.parquet')")
        con.execute("CREATE OR REPLACE VIEW asof_dims AS SELECT * FROM "
                    f"read_parquet('{asof_dims}/*.parquet')")
        # engine-side materialization both sides: Spark's noop sink pays
        # no driver transfer, so the twin wraps the asof in an aggregate
        # rather than fetchall-ing 20M rows into Python (at x10 the
        # fetchall tax alone was 0.18 of DuckDB's 0.22 s)
        # the aggregate touches EVERY output column so DuckDB cannot
        # prune what Spark's noop sink materializes
        sql = ("SELECT count(*), sum(event_id), sum(ts_us), sum(user_id), "
               "sum(value), sum(state_id), sum(state_value) "
               f"FROM ({MAT_ASOF})")
        best, ts = time_sql(con, sql)
        results[name] = {"min": round(best, 3),
                         "runs": [round(x, 3) for x in ts]}
    print(json.dumps({"layout": layout, "mat": mat, "results": results}))


if __name__ == "__main__":
    main()
