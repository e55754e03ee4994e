#!/usr/bin/env python3
"""Union-find rehearsal check for q_split_drift at large SF.

The committed oracle's two recursive closures (at-rest + full corpus)
are intractable on dup-rich rehearsal fixtures; this replays both
linearly — star+path candidates + gram verification in DuckDB over the
pinned full-corpus minhash index, python union-find for both label
sets, then the identical flip filter.

Usage: python3 tools/uf_check_split_drift.py <verifyOutDir> [nDocs]
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

def verified_edges(pred):
    return con.execute(f"""
      WITH b AS (SELECT * FROM banded WHERE {pred}),
      mins AS (SELECT band, key, min(doc_id) bmin FROM b GROUP BY 1,2),
      star AS (SELECT m.bmin doc_a, x.doc_id doc_b FROM b x JOIN mins m USING (band,key) WHERE x.doc_id <> m.bmin),
      pathe AS (SELECT prev doc_a, doc_id doc_b FROM (SELECT doc_id, lag(doc_id) OVER (PARTITION BY band,key ORDER BY doc_id) prev FROM b) WHERE prev IS NOT NULL),
      cand AS (SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM star UNION ALL SELECT * FROM pathe))
      SELECT c.doc_a, c.doc_b FROM cand c
      JOIN art ga ON c.doc_a = ga.doc_id
      JOIN art gb ON c.doc_b = gb.doc_id
      WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5""").fetchall()

def uf_labels(edges, members):
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in members}

def split(lbl):
    return 'val' if (lbl * GAMMA) % 10 == 0 else 'train'

rest_members = [d for d in range(n_docs) if (d * GAMMA) % 20 != 7]
all_members = list(range(n_docs))
old_l = uf_labels(verified_edges(f"(doc_id * {GAMMA}) % 20 <> 7"), rest_members)
new_l = uf_labels(verified_edges("TRUE"), all_members)
print(f'comps: at-rest={len(set(old_l.values()))} full={len(set(new_l.values()))} '
      f'({time.time()-t0:.0f}s)')

expected = {}
for d in rest_members:
    o, n = old_l[d], new_l[d]
    if o != n or split(o) != split(n):
        expected[d] = (o, n, split(o), split(n))
print(f'expected drift rows: {len(expected)} ({time.time()-t0:.0f}s)')

files = glob.glob(f'{out_dir}/q_split_drift/*.parquet')
spark = con.execute(
    f"SELECT doc_id, old_cluster, new_cluster, old_split, new_split "
    f"FROM read_parquet({files!r}) ORDER BY doc_id").fetchall()
bad = 0
got = {r[0]: tuple(r[1:]) for r in spark}
for d in set(expected) | set(got):
    if expected.get(d) != got.get(d):
        bad += 1
        if bad <= 5:
            print('MISMATCH', d, got.get(d), expected.get(d))
n_flip = sum(1 for v in expected.values() if v[2] != v[3])
print(f'{len(got)} engine rows vs {len(expected)} expected; split flips={n_flip} '
      f'({time.time()-t0:.0f}s)')
print('PASS' if bad == 0 else 'FAIL')
sys.exit(1 if bad else 0)
