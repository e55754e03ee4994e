#!/usr/bin/env python3
"""Union-find rehearsal check for q_minhash_dedup at large SF.

The committed DuckDB oracle closes components with a recursive-CTE
transitive closure — |component|^2 rows, fine at the sf0.01/sf0.1 gate
scales but intractable on dup-rich rehearsal fixtures (sf1: a 36k-doc
band bucket -> giant verified component -> closure never finishes).
This replays the SAME semantics linearly: star+path candidates and
Jaccard>=0.5 verification in DuckDB over the pinned minhash index
artifact, then python union-find for labels. 36 s at sf1.

Usage: python3 tools/uf_check_minhash.py <verifyOutDir> [nDocs]
Run AFTER graft.Verify has pinned /tmp/graft_minhash_index for the
same sf dir (same sequencing rule as tools/check.py).
"""
import sys, time, glob
import duckdb

out_dir = sys.argv[1]
n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else None
t0 = time.time()
con = duckdb.connect()
con.execute("CREATE VIEW art AS SELECT doc_id, bands, grams FROM read_parquet('/tmp/graft_minhash_index/*.parquet')")
if n_docs is None:
    n_docs = con.execute("SELECT count(*) FROM art").fetchone()[0]
con.execute("""CREATE TEMP TABLE banded AS
  SELECT doc_id, i AS band, bands[i + 1] AS key
  FROM art, (SELECT unnest(generate_series(0, 15)) AS i)""")
con.execute("""CREATE TEMP TABLE cand AS
  WITH mins AS (SELECT band, key, min(doc_id) bmin FROM banded GROUP BY 1,2),
  star AS (SELECT m.bmin doc_a, b.doc_id doc_b FROM banded b JOIN mins m USING (band,key) WHERE b.doc_id <> m.bmin),
  pathe AS (SELECT prev doc_a, doc_id doc_b FROM (SELECT doc_id, lag(doc_id) OVER (PARTITION BY band,key ORDER BY doc_id) prev FROM banded) WHERE prev IS NOT NULL)
  SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM star UNION ALL SELECT * FROM pathe)""")
verified = con.execute("""
  SELECT c.doc_a, c.doc_b FROM cand c
  JOIN art ga ON c.doc_a = ga.doc_id
  JOIN art gb ON c.doc_b = gb.doc_id
  WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
        / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5""").fetchall()
print(f'verified edges: {len(verified)} ({time.time()-t0:.0f}s)')

parent = {}
def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r
for a, b in verified:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
labels = {d: find(d) for d in range(n_docs)}
ncand = dict(con.execute("""
  SELECT b.doc_id, CAST(sum(s.c - 1) AS BIGINT) FROM banded b
  JOIN (SELECT band, key, count(*) c FROM banded GROUP BY 1,2) s USING (band, key)
  GROUP BY 1""").fetchall())
files = glob.glob(f'{out_dir}/q_minhash_dedup/*.parquet')
spark = con.execute(
    f"SELECT doc_id, kept_doc_id, is_duplicate, n_candidates "
    f"FROM read_parquet({files!r}) ORDER BY doc_id").fetchall()
assert len(spark) == n_docs, (len(spark), n_docs)
bad = 0
for doc_id, kept, isdup, nc in spark:
    exp = (labels[doc_id], labels[doc_id] != doc_id, ncand.get(doc_id, 0))
    if (kept, isdup, nc) != exp:
        bad += 1
        if bad <= 5:
            print('MISMATCH', doc_id, (kept, isdup, nc), exp)
print(f'{n_docs - bad}/{n_docs} rows match; '
      f'components={len(set(labels.values()))} ({time.time()-t0:.0f}s)')
print('PASS' if bad == 0 else 'FAIL')
sys.exit(1 if bad else 0)
