#!/usr/bin/env python3
"""Union-find rehearsal check for q_split_leakage_free at large SF.

Same reasoning as uf_check_minhash.py: the committed oracle composes the
recursive-CTE closure (intractable on dup-rich rehearsal fixtures), so
the rehearsal replays candidates + verification in DuckDB over the
pinned minhash index, labels via python union-find, then checks the
split assignment = golden-hash CASE on the component label and the
leakage invariant (no verified near-dup edge straddles splits).

Usage: python3 tools/uf_check_split.py <verifyOutDir> [nDocs]
Run AFTER graft.Verify has pinned /tmp/graft_minhash_index for the same
sf dir.
"""
import sys, time, glob
import duckdb

GAMMA = 2654435761

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
verified = con.execute("""
  WITH mins AS (SELECT band, key, min(doc_id) bmin FROM banded GROUP BY 1,2),
  star AS (SELECT m.bmin doc_a, b.doc_id doc_b FROM banded b JOIN mins m USING (band,key) WHERE b.doc_id <> m.bmin),
  pathe AS (SELECT prev doc_a, doc_id doc_b FROM (SELECT doc_id, lag(doc_id) OVER (PARTITION BY band,key ORDER BY doc_id) prev FROM banded) WHERE prev IS NOT NULL),
  cand AS (SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM star UNION ALL SELECT * FROM pathe))
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

files = glob.glob(f'{out_dir}/q_split_leakage_free/*.parquet')
spark = con.execute(
    f"SELECT doc_id, cluster_id, split "
    f"FROM read_parquet({files!r}) ORDER BY doc_id").fetchall()
assert len(spark) == n_docs, (len(spark), n_docs)
bad = 0
split_of = {}
for doc_id, cluster, split in spark:
    lbl = labels[doc_id]
    exp = (lbl, 'val' if (lbl * GAMMA) % 10 == 0 else 'train')
    split_of[doc_id] = split
    if (cluster, split) != exp:
        bad += 1
        if bad <= 5:
            print('MISMATCH', doc_id, (cluster, split), exp)
# leakage invariant: no verified near-dup edge straddles splits
straddle = sum(1 for a, b in verified if split_of[a] != split_of[b])
n_val = sum(1 for s in split_of.values() if s == 'val')
print(f'{n_docs - bad}/{n_docs} rows match; straddling edges={straddle}; '
      f'val fraction={n_val / n_docs:.4f} ({time.time()-t0:.0f}s)')
print('PASS' if bad == 0 and straddle == 0 else 'FAIL')
sys.exit(1 if (bad or straddle) else 0)
