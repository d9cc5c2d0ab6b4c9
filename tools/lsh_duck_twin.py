import duckdb, time, sys, json
times = sys.argv[1] if len(sys.argv) > 1 else "100"
path = f"/tmp/graft_lshdecade_x{times}/*.parquet"
sql = open('/tmp/verify_out/oracle_sql.json')
q = json.load(sql)['q42_minhash_lsh'].replace('FROM documents', f"FROM read_parquet('{path}')")
con = duckdb.connect()
con.execute("SET threads TO 32")
samples = []
for i in range(2):
    t0 = time.time()
    n = con.execute(f"SELECT COUNT(*) FROM ({q.replace('ORDER BY doc_a, doc_b','')})").fetchone()[0]
    samples.append(round(time.time()-t0, 1))
print(f"[lsh_duck_twin] x{times} pairs={n} secs={samples}")
