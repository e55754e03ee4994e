#!/usr/bin/env python3
"""Union-find rehearsal check for q_split_assign_delta2 at large SF.

Gen-2 sibling of uf_check_split_delta.py: replays BOTH generations
linearly — at-rest/A/B star+path closures via union-find, A's probe
against at rest, the fold (anchored A rows adopt the anchor's at-rest
label; every A row carries its assigned split), B's probe against
at-rest ∪ A, then the grown-table inheritance rule.

Usage: python3 tools/uf_check_split_delta2.py <verifyOutDir> [nDocs]
Run AFTER graft.Verify has pinned /tmp/graft_minhash_index for the same
sf dir.
"""
import sys, time, glob
import duckdb

GAMMA = 2654435761
PROBE_K = 8

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

def probe(pred_batch, pred_idx):
    return dict(con.execute(f"""
      WITH bb AS (SELECT * FROM banded WHERE {pred_batch}),
      rb AS (SELECT * FROM banded WHERE {pred_idx}),
      hits AS (
        SELECT p.doc_id, p.band, p.key, i.doc_id AS idx_doc
        FROM bb p JOIN rb i USING (band, key)
        WHERE p.doc_id <> i.doc_id),
      cand AS (
        SELECT DISTINCT doc_id, idx_doc FROM (
          SELECT doc_id, min(idx_doc) AS idx_doc
          FROM hits GROUP BY doc_id, band, key, idx_doc % {PROBE_K}))
      SELECT c.doc_id, min(c.idx_doc) FROM cand c
      JOIN art ga ON c.doc_id = ga.doc_id
      JOIN art gb ON c.idx_doc = gb.doc_id
      WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5
      GROUP BY c.doc_id""").fetchall())

def hash_split(lbl):
    return 'val' if (lbl * GAMMA) % 10 == 0 else 'train'

pred_rest = f"(doc_id * {GAMMA}) % 20 NOT IN (7, 11)"
pred_a = f"(doc_id * {GAMMA}) % 20 = 7"
pred_b = f"(doc_id * {GAMMA}) % 20 = 11"
rest_members = [d for d in range(n_docs) if (d * GAMMA) % 20 not in (7, 11)]
a_members = [d for d in range(n_docs) if (d * GAMMA) % 20 == 7]
b_members = [d for d in range(n_docs) if (d * GAMMA) % 20 == 11]
at_labels = uf_labels(verified_edges(pred_rest), rest_members)
a_labels = uf_labels(verified_edges(pred_a), a_members)
b_labels = uf_labels(verified_edges(pred_b), b_members)
print(f'comps: rest={len(set(at_labels.values()))} A={len(set(a_labels.values()))} '
      f'B={len(set(b_labels.values()))} ({time.time()-t0:.0f}s)')

grown_split = {d: hash_split(lbl) for d, lbl in at_labels.items()}

# generation 1: A's probe against at rest, component anchors, the fold
probe_a = probe(pred_a, pred_rest)
anchor_a = {}
for d in a_members:
    lbl = a_labels[d]
    x = probe_a.get(d)
    if x is not None and (lbl not in anchor_a or x < anchor_a[lbl]):
        anchor_a[lbl] = x
for d in a_members:
    lbl = a_labels[d]
    x = anchor_a.get(lbl)
    grown_split[d] = grown_split[x] if x is not None else hash_split(lbl)
print(f'gen-1: probe matches={len(probe_a)}, anchored comps={len(anchor_a)} '
      f'({time.time()-t0:.0f}s)')

# generation 2: B's probe against at-rest ∪ A, grown-table inheritance
probe_b = probe(pred_b, f"(doc_id * {GAMMA}) % 20 <> 11")
anchor_b = {}
for d in b_members:
    lbl = b_labels[d]
    x = probe_b.get(d)
    if x is not None and (lbl not in anchor_b or x < anchor_b[lbl]):
        anchor_b[lbl] = x
expected = {}
for d in b_members:
    lbl = b_labels[d]
    x = anchor_b.get(lbl)
    split = grown_split[x] if x is not None else hash_split(lbl)
    expected[d] = (lbl, x, split)
print(f'gen-2: probe matches={len(probe_b)}, anchored comps={len(anchor_b)} '
      f'({time.time()-t0:.0f}s)')

files = glob.glob(f'{out_dir}/q_split_assign_delta2/*.parquet')
spark = con.execute(
    f"SELECT doc_id, batch_cluster, anchor_doc, split "
    f"FROM read_parquet({files!r}) ORDER BY doc_id").fetchall()
assert len(spark) == len(b_members), (len(spark), len(b_members))
bad = 0
n_inherited = 0
n_via_a = 0
for doc_id, cluster, anc, split in spark:
    exp = expected[doc_id]
    if (cluster, anc, split) != exp:
        bad += 1
        if bad <= 5:
            print('MISMATCH', doc_id, (cluster, anc, split), exp)
    if anc is not None:
        n_inherited += 1
        if (anc * GAMMA) % 20 == 7:
            n_via_a += 1
print(f'{len(spark) - bad}/{len(spark)} rows match; inherited={n_inherited} '
      f'(via batch-A anchors: {n_via_a}) ({time.time()-t0:.0f}s)')
print('PASS' if bad == 0 else 'FAIL')
sys.exit(1 if bad else 0)
