#!/usr/bin/env python3
"""DuckDB twins for the graph/event DECADE bench entries — the paired
other-engine half of m_pagerank_x10/x100, m_ppr_x10/x100,
m_triangles_x10/x100, m_linededup_x100, m_funnel_x100, m_cohort_x100.

Each twin reads the SAME materialized fixture parquet the Spark entry
scans (newest /tmp/graft_sbench_<key>* left by the bench JVM — run this
in the same session window as the bench for an honest pairing) and runs
the operator's exact SQL twin: the fixed-point PageRank recurrence with
every multi-referenced CTE MATERIALIZED (the q161-oracle form), the
degree-ordered wedge join (q166-oracle form), the RefinedWeb line dedup
(q160-oracle form), and the funnel/cohort conditional-MIN chains
(q164/q165-oracle forms). Warmup + min-of-3 per twin (min-of-2 for the
x100 graph twins — they run minutes).

Usage: python3 tools/twins_time.py [entry ...]   (default: all)
Prints one line per twin: <name> <t1> <t2> [...] (seconds, sorted).
"""
import glob
import os
import sys
import time

import duckdb

SCALE = 1000000000000


def newest(key):
    # r16: ScaleBench.materialized builds at STABLE paths
    # /tmp/graft_sbfix_<ver>_<tag>_<key> (cross-run reuse); the trailing
    # underscore most decade keys carry keeps "pr_edges_x10_" from
    # glob-matching the x100 fixture (that collision silently paired the
    # x10 twin against the 65M-edge graph once — r15, recorded). The old
    # per-JVM graft_sbench_<key>_<digits> scheme stays as a fallback.
    cands = (glob.glob(f"/tmp/graft_sbfix_*_{key}_") +
             glob.glob(f"/tmp/graft_sbfix_*_{key}") +
             glob.glob(f"/tmp/graft_sbench_{key}_*"))
    if not cands:
        raise SystemExit(f"no fixture for {key} under /tmp/graft_sbfix_* "
                         "or /tmp/graft_sbench_* — run the bench (or the "
                         "entry) first")
    return max(cands, key=os.path.getmtime) + "/t"


def pagerank_sql(edges_view, seeds_filter=None):
    """The q161/q167 oracle recurrence over an arbitrary edge view.
    seeds_filter: SQL boolean over `node` marking the teleport set
    (None = all nodes, the uniform form)."""
    seed = seeds_filter or "TRUE"
    iters = []
    for k in range(1, 6):
        iters.append(f"""c{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.r // o.od) AS c
  FROM edges e
  JOIN r{k-1} r ON e.src = r.node
  JOIN od o ON e.src = o.node
  GROUP BY e.dst),
d{k} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.r), 0) AS dang
  FROM r{k-1} r LEFT JOIN od o ON r.node = o.node
  WHERE o.node IS NULL),
r{k} AS MATERIALIZED (
  SELECT n.node,
    CASE WHEN n.is_seed THEN
      (15 * ({SCALE} // (SELECT s FROM sc))) // 100
      + (85 * (((SELECT dang FROM d{k}) // (SELECT s FROM sc))
               + COALESCE(c.c, 0))) // 100
    ELSE (85 * COALESCE(c.c, 0)) // 100 END AS r
  FROM flags n LEFT JOIN c{k} c ON n.node = c.node)""")
    its = ",\n".join(iters)
    return f"""WITH eraw AS (SELECT * FROM {edges_view}),
edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
flags AS MATERIALIZED (
  SELECT node, ({seed}) AS is_seed FROM nodes),
sc AS MATERIALIZED (
  SELECT COUNT(*) AS s FROM flags WHERE is_seed),
od AS MATERIALIZED (
  SELECT src AS node, COUNT(*) AS od FROM edges GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node,
    CASE WHEN is_seed THEN {SCALE} // (SELECT s FROM sc) ELSE 0 END AS r
  FROM flags),
{its}
SELECT node, CAST(r AS BIGINT) AS rank FROM r5 ORDER BY node"""


TRIANGLES_SQL = """WITH und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und) t
  GROUP BY node),
ori AS MATERIALIZED (
  SELECT
    CASE WHEN (da.d < db.d OR (da.d = db.d AND und.a < und.b))
      THEN und.a ELSE und.b END AS u,
    CASE WHEN (da.d < db.d OR (da.d = db.d AND und.a < und.b))
      THEN und.b ELSE und.a END AS v,
    CASE WHEN (da.d < db.d OR (da.d = db.d AND und.a < und.b))
      THEN db.d ELSE da.d END AS dv
  FROM und
  JOIN deg da ON und.a = da.node
  JOIN deg db ON und.b = db.node),
w AS (
  SELECT e1.u AS u, e1.v AS v, e2.v AS w
  FROM ori e1 JOIN ori e2 ON e1.u = e2.u
  WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
tri AS (
  SELECT w.u, w.v, w.w
  FROM w JOIN ori o ON w.v = o.u AND w.w = o.v),
nodes AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
ORDER BY node"""

LINEDEDUP_SQL = """WITH w2 AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
lines AS (
  SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS line
  FROM w2),
hot AS (
  SELECT md5(line) AS h FROM lines
  GROUP BY md5(line) HAVING COUNT(DISTINCT doc_id) >= 2),
kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE md5(line) NOT IN (SELECT h FROM hot))
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
FROM kept GROUP BY doc_id ORDER BY doc_id"""

FUNNEL_SQL = """WITH a AS (
  SELECT user_id, MIN(ts_us) AS t0 FROM e
  WHERE event_type = 'view' GROUP BY user_id),
b AS (
  SELECT e.user_id, MIN(ts_us) AS t1 FROM e JOIN a USING (user_id)
  WHERE event_type = 'click' AND ts_us > a.t0 GROUP BY e.user_id),
c AS (
  SELECT e.user_id, MIN(ts_us) AS t2 FROM e JOIN b USING (user_id)
  WHERE event_type = 'purchase' AND ts_us > b.t1 GROUP BY e.user_id)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM a
UNION ALL SELECT '2_click', COUNT(*) FROM b
UNION ALL SELECT '3_purchase', COUNT(*) FROM c
ORDER BY stage"""

# q41's exact-pair SQL (the committed q42 oracle form) over the fixture
# view `d` — the exact half of the m_q42_x10 decade pair: banded LSH's
# candidates stay bucket-bounded while this shingle self-join grows
# quadratically inside dup clusters.
Q42_EXACT_SQL = """WITH w AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
    lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
  FROM d),
sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws)),
    i -> ws[i] || ' ' || ws[i+1])) AS shingle
  FROM w),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.9
ORDER BY doc_a, doc_b"""

COHORT_SQL = """WITH f AS (
  SELECT user_id, MIN(ts_us) AS t0 FROM e GROUP BY user_id),
j AS (
  SELECT e.user_id,
    f.t0 // 604800000000 AS cohort_week,
    (e.ts_us // 604800000000) - (f.t0 // 604800000000) AS week_offset
  FROM e JOIN f USING (user_id))
SELECT cohort_week, week_offset,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM j GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset"""


def run(name, con, sql, runs=3, warm=True):
    # the minutes-long x100 graph twins skip the warmup pass (DuckDB has
    # no compile curve; min-of-2 already absorbs first-read page faults
    # at these absolutes) so one pairing stays bounded
    if warm:
        con.execute(sql).fetchall()
    ts = []
    for _ in range(runs):
        t0 = time.time()
        con.execute(sql).fetchall()
        ts.append(time.time() - t0)
    print(name + " " + " ".join(f"{t:.3f}" for t in sorted(ts)), flush=True)


def main():
    want = set(sys.argv[1:])

    def on(n):
        return not want or n in want

    def fresh():
        c = duckdb.connect()
        c.execute("SET threads=32")
        return c

    for times, runs, warm in ((10, 3, True), (100, 2, False),
                              (1000, 1, False)):
        n = f"m_pagerank_x{times}_duck"
        if on(n) and times <= 100:
            con = fresh()
            con.execute(f"CREATE VIEW pe AS SELECT * FROM "
                        f"read_parquet('{newest(f'pr_edges_x{times}')}/*.parquet')")
            run(n, con, pagerank_sql("pe"), runs, warm)
        n = f"m_ppr_x{times}_duck"
        if on(n) and times <= 100:
            con = fresh()
            con.execute(f"CREATE VIEW pe AS SELECT * FROM "
                        f"read_parquet('{newest(f'pr_edges_x{times}')}/*.parquet')")
            con.execute(f"CREATE VIEW sd AS SELECT * FROM "
                        f"read_parquet('{newest(f'ppr_seeds_x{times}')}/*.parquet')")
            run(n, con, pagerank_sql(
                "pe", "node IN (SELECT node FROM sd)"), runs, warm)
        n = f"m_triangles_x{times}_duck"
        if on(n):
            con = fresh()
            con.execute(f"CREATE VIEW e AS SELECT * FROM "
                        f"read_parquet('{newest(f'tri_edges_x{times}')}/*.parquet')")
            run(n, con, TRIANGLES_SQL, runs, warm)
        # pagerank/ppr x1000 twins extrapolate to hours (428 s at x100,
        # superlinear) — guarded to times <= 100 above; the x1000 decade
        # is Spark-alone, recorded as such in BENCH_COMPARE
    if on("m_q42_x10_duck"):
        con = fresh()
        con.execute(f"CREATE VIEW d AS SELECT * FROM "
                    f"read_parquet('{newest('docs_x10')}/*.parquet')")
        run("m_q42_x10_duck", con, Q42_EXACT_SQL, runs=2, warm=False)
    if on("m_linededup_x100_duck"):
        con = fresh()
        con.execute(f"CREATE VIEW d AS SELECT * FROM "
                    f"read_parquet('{newest('lined_x100')}/*.parquet')")
        run("m_linededup_x100_duck", con, LINEDEDUP_SQL)
    if on("m_funnel_x100_duck"):
        con = fresh()
        con.execute(f"CREATE VIEW e AS SELECT * FROM "
                    f"read_parquet('{newest('events_x100')}/*.parquet')")
        run("m_funnel_x100_duck", con, FUNNEL_SQL)
    if on("m_cohort_x100_duck"):
        con = fresh()
        con.execute(f"CREATE VIEW e AS SELECT * FROM "
                    f"read_parquet('{newest('events_x100')}/*.parquet')")
        run("m_cohort_x100_duck", con, COHORT_SQL)


if __name__ == "__main__":
    main()
