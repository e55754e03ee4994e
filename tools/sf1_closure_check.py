#!/usr/bin/env python3
"""Large-SF checks for the transitive-closure queries whose recursive-CTE
oracles are intractable on dup-rich rehearsal fixtures (the DuckDB
closure hit 112 GB RSS at sf1 before being killed — same class as
tools/uf_check_minhash.py's motivation).

Each check is a COMPOSITION over outputs that are independently
DuckDB-verified at the same SF:

- q_doc_components / q_doc_components_lss: union-find over the
  q_ngram_jaccard edge list (that query IS the edge derivation, and its
  oracle is closure-free) must reproduce the component labels and sizes.
- q_dedup_canonical: per-cluster canonical re-derived from
  q_minhash_dedup's clusters (checked by uf_check_minhash.py) and
  q_model_quality's logits (closure-free oracle), with the -1e9
  missing-quality sentinel and (logit desc, doc_id asc) rank.

Usage: python3 tools/sf1_closure_check.py <verifyOutDir>
"""
import sys, glob
import duckdb

out_dir = sys.argv[1]
con = duckdb.connect()


def rows(q, cols):
    files = glob.glob(f"{out_dir}/{q}/*.parquet")
    assert files, f"no output for {q}"
    return con.execute(
        f"SELECT {cols} FROM read_parquet({files!r})").fetchall()


parent = {}
def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r


fails = 0

# --- doc components ---------------------------------------------------
edges = rows("q_ngram_jaccard", "doc_a, doc_b")
docs = [r[0] for r in rows("q_doc_components", "doc_id")]
for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
labels = {d: find(d) for d in docs}
sizes = {}
for d, c in labels.items():
    sizes[c] = sizes.get(c, 0) + 1
for q in ("q_doc_components", "q_doc_components_lss"):
    got = rows(q, "doc_id, component, component_size")
    bad = sum(1 for d, c, s in got
              if labels.get(d) != c or sizes.get(labels.get(d)) != s)
    ok = len(got) == len(docs) and bad == 0
    print(f"{'PASS' if ok else 'FAIL'} {q} "
          f"({len(got)} rows, {bad} mismatches, "
          f"{len(set(labels.values()))} components)")
    fails += 0 if ok else 1

# --- quality-aware canonical -----------------------------------------
clusters = {d: k for d, k in rows("q_minhash_dedup", "doc_id, kept_doc_id")}
logit = {d: l for d, l in rows("q_model_quality", "doc_id, quality_logit")}
best = {}
for d, c in clusters.items():
    key = (-(logit.get(d, -1e9)), d)
    if c not in best or key < best[c][0]:
        best[c] = (key, d)
canon = {c: d for c, (_, d) in best.items()}
got = rows("q_dedup_canonical",
           "doc_id, cluster_id, canonical_doc_id, is_canonical")
bad = sum(1 for d, cl, cd, ic in got
          if clusters.get(d) != cl or canon.get(cl) != cd
          or ic != (d == cd))
ok = len(got) == len(clusters) and bad == 0
print(f"{'PASS' if ok else 'FAIL'} q_dedup_canonical "
      f"({len(got)} rows, {bad} mismatches)")
fails += 0 if ok else 1

sys.exit(1 if fails else 0)
